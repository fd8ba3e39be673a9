"""CLIP byte-level BPE tokenizer.

A from-scratch implementation producing token ids identical to OpenAI CLIP's
``SimpleTokenizer`` (reference ``clip/simple_tokenizer.py:62-132``): same
byte<->unicode alphabet, same merge table (loaded from the public
``bpe_simple_vocab_16e6.txt.gz`` asset), same vocab ordering and the same
pre-tokenization regex. Tokenization is host-side, setup-time work; the
device only ever sees fixed-shape int32 id matrices (see :mod:`.tokenize_fn`).

The reference cleans text with ``ftfy.fix_text``; when ftfy is absent we
fall back to the vendored minimal subset (:mod:`.fix_text` — mojibake
repair, ligatures, width, quotes, NFC), so byte-mangled inputs tokenize
to the same ids the reference produces.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import unicodedata
from typing import Dict, List, Tuple

import regex as re

_HERE = os.path.dirname(os.path.abspath(__file__))
DEFAULT_BPE_PATH = os.path.join(_HERE, "assets", "bpe_simple_vocab_16e6.txt.gz")

SOT_TEXT = "<|startoftext|>"
EOT_TEXT = "<|endoftext|>"

# number of merge rules in the CLIP vocab; the final vocab is
# 2*256 byte units + _N_MERGES merged tokens + 2 specials = 49408
_N_MERGES = 49152 - 256 - 2


@functools.lru_cache()
def byte_to_unicode() -> Dict[int, str]:
    """GPT-2 style reversible byte -> printable-unicode mapping."""
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    mapping = {b: chr(b) for b in printable}
    offset = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + offset)
            offset += 1
    return mapping


def _clean_text(text: str) -> str:
    try:  # real ftfy when present (the reference's exact dependency)
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        from ovmr_tpu.text.fix_text import fix_text

        text = fix_text(text)
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip()


class ClipTokenizer:
    """Byte-level BPE with the CLIP 49152-entry vocabulary."""

    def __init__(self, bpe_path: str = DEFAULT_BPE_PATH):
        self._b2u = byte_to_unicode()
        self._u2b = {u: b for b, u in self._b2u.items()}

        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        # line 0 is a header; then one merge rule per line
        merge_lines = lines[1 : 1 + _N_MERGES]
        merges: List[Tuple[str, str]] = []
        for ln in merge_lines:
            a, b = ln.split()
            merges.append((a, b))
        self._rank: Dict[Tuple[str, str], int] = {m: i for i, m in enumerate(merges)}

        units = list(self._b2u.values())
        vocab: List[str] = units + [u + "</w>" for u in units]
        vocab.extend(a + b for a, b in merges)
        vocab.extend([SOT_TEXT, EOT_TEXT])
        self.encoder: Dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        self.decoder: Dict[int, str] = {i: tok for tok, i in self.encoder.items()}

        self.sot_token = self.encoder[SOT_TEXT]
        self.eot_token = self.encoder[EOT_TEXT]
        self.vocab_size = len(vocab)

        self._word_cache: Dict[str, List[str]] = {
            SOT_TEXT: [SOT_TEXT],
            EOT_TEXT: [EOT_TEXT],
        }
        self._pretok = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            re.IGNORECASE,
        )

    # -- BPE merge loop ------------------------------------------------------
    def _merge_word(self, token: str) -> List[str]:
        cached = self._word_cache.get(token)
        if cached is not None:
            return cached

        parts: List[str] = list(token[:-1]) + [token[-1] + "</w>"]
        while len(parts) > 1:
            # find the highest-priority adjacent pair
            best_rank = None
            best_idx = -1
            for i in range(len(parts) - 1):
                r = self._rank.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_idx = i
            if best_rank is None:
                break
            first, second = parts[best_idx], parts[best_idx + 1]
            # merge every non-overlapping occurrence of (first, second)
            merged: List[str] = []
            i = 0
            while i < len(parts):
                if (
                    i < len(parts) - 1
                    and parts[i] == first
                    and parts[i + 1] == second
                ):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged

        self._word_cache[token] = parts
        return parts

    # -- public API ---------------------------------------------------------
    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = _clean_text(text).lower()
        for raw in self._pretok.findall(text):
            mapped = "".join(self._b2u[b] for b in raw.encode("utf-8"))
            ids.extend(self.encoder[piece] for piece in self._merge_word(mapped))
        return ids

    def decode(self, ids: List[int]) -> str:
        joined = "".join(self.decoder[i] for i in ids)
        raw = bytearray(self._u2b[ch] for ch in joined)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


@functools.lru_cache()
def get_tokenizer() -> ClipTokenizer:
    return ClipTokenizer()
