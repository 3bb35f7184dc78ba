"""Vectorized tokenizer (tokenizer v2 semantics).

The reference delegates to an external ``ksana-corpus/tokenizer`` whose
contract is fixed by its call sites: ``tokenize(str) -> [(text, _, type)]``
with types SPACE / PUNC / LATIN / NUMBER / CJK, where

- ``concreteToken[type]`` gates character-position advance
  (reference ``index.js:177-186``),
- SPACE resets bigram adjacency and consumes no token position
  (``inverted.js:33-38``),
- PUNC under ``removePunc`` is skipped WITHOUT resetting adjacency so
  punctuation-separated CJK bigrams still pair (``inverted.js:40-45``),
- PUNC/NUMBER (not removed) consume a token position but are not indexed
  (``inverted.js:49-53``),
- LATIN tokens are diacritics-stripped + lowercased before indexing
  (``inverted.js:46-48``).

Here tokenization is a single compiled regex applied per Arrow batch
(pd.Series in / out — zero per-row Python in the Spark path).
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd

TOKENIZER_VERSION = 2

# token type codes (stable — stored in parquet)
SPACE, PUNC, LATIN, NUMBER, CJK = 0, 1, 2, 3, 4

TYPE_NAMES = {SPACE: "SPACE", PUNC: "PUNC", LATIN: "LATIN", NUMBER: "NUMBER", CJK: "CJK"}

# concrete tokens advance the character position within a line
CONCRETE = frozenset({PUNC, LATIN, NUMBER, CJK})

# LATIN covers ASCII letters plus Latin-1/Extended (diacritics handled later);
# CJK is one token per char (the reference indexes CJK per character —
# genbigram.js:20-23 counts single chars); NUMBER is a digit run.
_TOKEN_RE = re.compile(
    r"(?P<space>\s+)"
    r"|(?P<number>[0-9]+)"
    r"|(?P<latin>[A-Za-zÀ-ɏḀ-ỿ']+)"
    r"|(?P<cjk>[一-鿿])"
    r"|(?P<punc>.)",
    re.DOTALL,
)

_GROUP_TYPE = {"space": SPACE, "number": NUMBER, "latin": LATIN, "cjk": CJK, "punc": PUNC}


def tokenize(text: str) -> list[tuple[str, int]]:
    """One document -> [(token_text, type)]. Pure function, order-preserving."""
    out: list[tuple[str, int]] = []
    for m in _TOKEN_RE.finditer(text):
        out.append((m.group(0), _GROUP_TYPE[m.lastgroup]))
    return out


def tokenize_series(texts: pd.Series) -> pd.Series:
    """pd.Series[str] -> pd.Series[list[(tok, type)]] — Arrow-batch kernel."""
    return texts.map(lambda t: tokenize(t) if isinstance(t, str) else [])


_NFD_MARKS = re.compile(r"[̀-ͯ]")


def normalize_latin(tok: str) -> str:
    """Diacritics strip + lowercase (reference inverted.js:46-48)."""
    return _NFD_MARKS.sub("", unicodedata.normalize("NFD", tok)).lower()


def normalize_latin_series(toks: pd.Series) -> pd.Series:
    # vectorized: NFD-normalize then drop combining marks, lowercase
    norm = toks.map(lambda s: unicodedata.normalize("NFD", s) if isinstance(s, str) else s)
    return norm.str.replace(_NFD_MARKS, "", regex=True).str.lower()


def indexable_tokens(text: str, remove_punc: bool = False) -> list[tuple[str, int, int]]:
    """Reference putToken semantics in one pass:
    returns [(normalized_token, tpos, type)] for INDEXED tokens, where tpos is
    the local (per-document, 1-based) token position counter that PUNC/NUMBER
    consume but SPACE and removed-PUNC do not. Used by the oracle and tests;
    the Spark path reproduces the same with window functions (operators/tpos.py).
    """
    out = []
    tpos = 1
    for tok, typ in tokenize(text):
        if typ == SPACE:
            continue
        if typ == PUNC and remove_punc:
            continue  # no tpos consumed, adjacency preserved
        if typ in (PUNC, NUMBER):
            tpos += 1  # consumes a position, not indexed, resets adjacency
            continue
        tk = normalize_latin(tok) if typ == LATIN else tok
        out.append((tk, tpos, typ))
        tpos += 1
    return out


def simple_word_tokens(texts: pd.Series) -> pd.Series:
    """Whitespace word split for quality stats (C4-style), vectorized."""
    return texts.fillna("").str.split()


# BPE-ish subword count: words + digit runs + punctuation marks, the cheap
# proxy for "how many tokens would a BPE tokenizer emit".
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")


def bpe_ish_token_count(texts: pd.Series) -> pd.Series:
    return texts.fillna("").str.count(_BPE_RE).astype(np.int64)
