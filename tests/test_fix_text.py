"""Vendored minimal ftfy (text/fix_text.py) — the CLIP ``basic_clean``
repair step (reference ``clip/simple_tokenizer.py:50-52``).

Mojibake inputs are CONSTRUCTED (utf-8 bytes mis-decoded as cp1252 /
latin-1), so each case is exactly the failure ftfy repairs; token-id
parity then pins that a mangled string tokenizes to the ids of its clean
form — what the reference (with real ftfy) produces.
"""

import pytest

from ovmr_tpu.text.fix_text import fix_text


def _mangle(s: str, codec: str = "windows-1252") -> str:
    """Mis-decode utf-8 bytes as `codec` — the classic mojibake."""
    return s.encode("utf-8").decode(codec)


CLEAN = [
    "a photo of a dog.",
    "abyssinian cat",
    "1962 Ferrari 250 GTO",
    "",
]


@pytest.mark.parametrize("s", CLEAN)
def test_identity_on_clean_ascii(s):
    assert fix_text(s) == s


NON_ASCII = [
    "séance",
    "café",
    "naïve",
    "Zürich",
    "Straße",
    "élève",
    "doesn’t",  # curly quote survives the mojibake round trip as '
]


@pytest.mark.parametrize("s", NON_ASCII[:6])
def test_repairs_cp1252_mojibake(s):
    assert fix_text(_mangle(s)) == s


@pytest.mark.parametrize("s", NON_ASCII[:6])
def test_repairs_latin1_mojibake(s):
    assert fix_text(_mangle(s, "latin-1")) == s


def test_repairs_double_mojibake():
    s = "séance"
    assert fix_text(_mangle(_mangle(s))) == s


def test_non_ascii_passthrough():
    # already-correct accents must NOT be "fixed" into garbage
    for s in NON_ASCII[:6]:
        assert fix_text(s) == s


def test_curly_quotes_uncurl():
    assert fix_text("doesn’t") == "doesn't"
    assert fix_text("“quoted”") == '"quoted"'


def test_mangled_curly_quote():
    # the single most common real-world case: ’ in utf-8 read as cp1252
    assert fix_text(_mangle("doesn’t")) == "doesn't"


def test_ligatures_and_width():
    assert fix_text("ofﬁce") == "office"
    assert fix_text("ＡＢＣ 　x") == "ABC  x"


def test_controls_surrogates_linebreaks():
    assert fix_text("a\x1b[31mred\x1b[0m") == "ared"
    assert fix_text("a\rb c") == "a\nb\nc"
    assert fix_text("a\x00b\x9dc") == "abc"
    assert fix_text("x" + "\ud83d" + "y") == "x�y"


def test_nfc_normalization():
    decomposed = "é"  # e + combining acute
    assert fix_text(decomposed) == "é"


def test_token_id_parity_with_reference_clean():
    """The reference tokenizer runs ftfy then BPE: a mojibake string must
    produce the SAME ids as its clean form (the ids the reference emits,
    computable here because the BPE itself is golden-id-tested)."""
    from ovmr_tpu.text.tokenize_fn import tokenize

    for s in NON_ASCII:
        clean_ids = tokenize([s]).tolist()
        mangled_ids = tokenize([_mangle(s)]).tolist()
        assert mangled_ids == clean_ids, s


def test_tokenizer_uses_fix_text():
    from ovmr_tpu.text.tokenizer import _clean_text

    assert _clean_text(_mangle("café")) == "café"
