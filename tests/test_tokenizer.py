"""Tokenizer parity against golden ids recorded from the reference
SimpleTokenizer (fixture generated once from /root/reference, committed)."""

import json
import os

import numpy as np
import pytest

from ovmr_tpu.text import get_tokenizer, tokenize, eot_indices

pytestmark = pytest.mark.quick

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tokenizer_golden.json")


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURE) as f:
        return json.load(f)


def test_vocab_size():
    tok = get_tokenizer()
    assert tok.vocab_size == 49408
    assert tok.sot_token == 49406
    assert tok.eot_token == 49407


def test_encode_matches_reference(golden):
    tok = get_tokenizer()
    for text, ids in golden.items():
        assert tok.encode(text) == ids, f"mismatch for {text!r}"


def test_roundtrip_decode():
    # decode joins BPE word-pieces with spaces (reference semantics:
    # '</w>' -> ' '), so punctuation comes back space-separated
    tok = get_tokenizer()
    text = "a photo of a golden retriever."
    assert tok.decode(tok.encode(text)) == "a photo of a golden retriever . "


def test_tokenize_shape_and_framing():
    mat = tokenize(["a photo of a cat.", "a ."])
    assert mat.shape == (2, 77)
    assert mat.dtype == np.int32
    tok = get_tokenizer()
    assert mat[0, 0] == tok.sot_token
    eots = eot_indices(mat)
    assert mat[0, eots[0]] == tok.eot_token
    assert mat[1, eots[1]] == tok.eot_token
    # zero padding after EOT
    assert (mat[0, eots[0] + 1 :] == 0).all()


def test_tokenize_truncation():
    long = "word " * 200
    with pytest.raises(RuntimeError):
        tokenize(long)
    mat = tokenize(long, truncate=True)
    tok = get_tokenizer()
    assert mat[0, -1] == tok.eot_token


def test_visual_template_structure():
    # the OVMR visual prompt template: "a ." tokenizes to [SOT, a, ., EOT]
    mat = tokenize(["a ."])
    tok = get_tokenizer()
    assert eot_indices(mat)[0] == 3
    assert mat[0, 3] == tok.eot_token
