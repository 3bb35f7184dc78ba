"""Shared vectorized views over a batch of documents.

Two precomputations that several kernels (quality rules, langid) need:

- :class:`WordStream` — the factorized token stream: every word of every
  document flattened once, `pd.factorize`d once (one hash pass), with the
  doc index of every token. Per-token work then collapses to C-level
  gathers over the ~10x-smaller unique-word table, and per-document
  reductions become cumsum/bincount boundary arithmetic. Built ONCE per
  Arrow batch and shared across kernels (the fused pipeline passes it to
  rules + langid, replacing two per-document Python loops).

- :func:`char_stats` — per-document counts of regex character classes
  (\\s, CJK, [0-9]) in ONE pass over the concatenated UTF-32 buffer.
  \\s membership comes from a LUT built once per process by Python's `re`
  itself (exact regex semantics, so parity with `str.count(r"\\s")` and
  the SQL twins holds by construction); CJK/digits are range predicates.
  Replaces per-document regex scans (the former `\\S` count was the
  single most expensive operation in the langid kernel).
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass

import numpy as np
import pandas as pd


@dataclass
class WordStream:
    n_docs: int
    lens: np.ndarray        # tokens per doc (int64, len n_docs)
    pos: np.ndarray         # doc index per token (len n_tokens)
    codes: np.ndarray       # unique-word code per token
    uniq: np.ndarray        # unique words (object)
    starts: np.ndarray      # token-stream start offset per doc
    _uniq_series: pd.Series | None = None
    _uniq_lens: np.ndarray | None = None

    @property
    def uniq_series(self) -> pd.Series:
        if self._uniq_series is None:
            self._uniq_series = pd.Series(self.uniq, dtype=object)
        return self._uniq_series

    @property
    def uniq_lens(self) -> np.ndarray:
        if self._uniq_lens is None:
            self._uniq_lens = (self.uniq_series.str.len()
                               .to_numpy(dtype=np.int64)
                               if len(self.uniq) else
                               np.zeros(0, np.int64))
        return self._uniq_lens

    def seg_sum(self, per_token: np.ndarray) -> np.ndarray:
        """Exact per-doc sums of a per-token array (cumsum boundary diff —
        zero-length-doc safe, unlike reduceat)."""
        cs = np.concatenate(([0], np.cumsum(per_token, dtype=np.int64)))
        ends = self.starts + self.lens
        return cs[ends] - cs[self.starts]

    def seg_max(self, per_token: np.ndarray, empty: int = 0) -> np.ndarray:
        """Per-doc max of a per-token array; `empty` for zero-token docs."""
        out = np.full(self.n_docs, empty, dtype=np.int64)
        ne = self.lens > 0
        if per_token.size and ne.any():
            # reduceat over the starts of NON-EMPTY docs: each reduces up to
            # the next listed start; empty docs in between contribute no
            # tokens, so each slice is exactly one doc's tokens
            out[ne] = np.maximum.reduceat(per_token, self.starts[ne])
        return out

    def count_where_unique(self, uniq_mask: np.ndarray) -> np.ndarray:
        """Per-doc count of tokens whose UNIQUE word satisfies the mask."""
        if not self.pos.size:
            return np.zeros(self.n_docs, np.int64)
        return np.bincount(self.pos[uniq_mask[self.codes]],
                           minlength=self.n_docs).astype(np.int64)

    def distinct_per_doc(self) -> np.ndarray:
        """Per-doc count of distinct words: sort tokens by (doc, code),
        count first occurrences."""
        if not self.pos.size:
            return np.zeros(self.n_docs, np.int64)
        order = np.lexsort((self.codes, self.pos))
        p, c = self.pos[order], self.codes[order]
        first = np.ones(len(p), dtype=bool)
        first[1:] = (p[1:] != p[:-1]) | (c[1:] != c[:-1])
        return np.bincount(p[first], minlength=self.n_docs).astype(np.int64)


def build(words: pd.Series) -> WordStream:
    """words: Series[list[str]] (one entry per doc) -> WordStream."""
    if words.isna().any():
        words = words.map(lambda w: w if isinstance(w, list) else [])
    lens = words.str.len().fillna(0).astype(np.int64).to_numpy()
    n = len(words)
    flat = np.array(list(itertools.chain.from_iterable(words)), dtype=object)
    pos = np.repeat(np.arange(n, dtype=np.int64), lens)
    if flat.size:
        codes, uniq = pd.factorize(flat)
    else:
        codes, uniq = np.zeros(0, np.int64), np.zeros(0, object)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1])) if n else \
        np.zeros(0, np.int64)
    return WordStream(n_docs=n, lens=lens, pos=pos,
                      codes=np.asarray(codes), uniq=np.asarray(uniq),
                      starts=starts)


_WS_RE = re.compile(r"\s")
_WS_LUT: np.ndarray | None = None


def _ws_lut() -> np.ndarray:
    """Lazily-built \\s membership LUT for the BMP (codepoints < 0x10000),
    decided by Python's `re` itself so semantics are exact by construction.
    No whitespace codepoint exists above the BMP (highest is U+3000), so
    supplementary codepoints clamp to a non-ws slot. One-time ~50 ms per
    process, then membership is a single gather per batch."""
    global _WS_LUT
    if _WS_LUT is None:
        lut = np.zeros(0x10000, dtype=bool)
        for c in range(0x10000):
            if _WS_RE.match(chr(c)):
                lut[c] = True
        assert not lut[0xFFFF]  # the clamp slot must be non-whitespace
        _WS_LUT = lut
    return _WS_LUT


@dataclass
class CharStats:
    """Per-document character-class counts, all from ONE buffer pass."""
    n_chars: np.ndarray
    nonspace: np.ndarray
    cjk: np.ndarray
    digits: np.ndarray


def char_stats(texts: pd.Series) -> CharStats:
    """Per-document \\s / CJK / [0-9] counts with exact `re` semantics.

    One UTF-32 encode of the concatenated batch, one np.unique over
    codepoints, \\s tested once per UNIQUE codepoint, then boundary cumsum
    diffs — no per-document regex scans (the former per-doc str.count
    calls were the largest costs in the langid and rules kernels). Built
    once per Arrow batch and shared by both.
    """
    t = texts.fillna("")
    lens = t.str.len().to_numpy(dtype=np.int64)
    n = len(t)
    if n == 0 or int(lens.sum()) == 0:
        z = np.zeros(n, np.int64)
        return CharStats(lens, z.copy(), z.copy(), z)
    buf = np.frombuffer("".join(t.tolist()).encode("utf-32-le"),
                        dtype=np.uint32)
    is_ws = _ws_lut()[np.minimum(buf, 0xFFFF)]
    is_cjk = (buf >= 0x4E00) & (buf <= 0x9FFF)
    is_dig = (buf >= 0x30) & (buf <= 0x39)  # ASCII [0-9], regex-identical
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    ne = lens > 0

    def seg(mask: np.ndarray) -> np.ndarray:
        # reduceat over NON-EMPTY doc starts with an int64 accumulator:
        # empty docs occupy no buffer, so each slice is exactly one doc's
        # chars — and no buffer-sized int64 cumsum array is materialized
        out = np.zeros(n, np.int64)
        out[ne] = np.add.reduceat(mask, starts[ne], dtype=np.int64)
        return out

    ws = seg(is_ws)
    return CharStats(lens, lens - ws, seg(is_cjk), seg(is_dig))


def char_class_counts(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Back-compat shim -> (nonspace, cjk)."""
    cs = char_stats(texts)
    return cs.nonspace, cs.cjk
