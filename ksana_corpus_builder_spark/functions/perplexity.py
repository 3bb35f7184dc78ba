"""KenLM-style perplexity scoring — character-bigram LM, vectorized.

A real deployment loads a KenLM binary per executor; that library is not in
this container, so the model is a deterministic, embedded character-bigram
language model with add-one smoothing whose parameters derive from a fixed
seed corpus (below). The scoring math is the KenLM shape:

    log10 P(text) = sum_i log10 P(c_i | c_{i-1})
    perplexity    = 10 ** ( -log10 P / n_transitions )

Vectorized: texts are mapped to int codes, transitions looked up in a dense
(V+1)x(V+1) numpy matrix in one gather. Swap `_SEED_CORPUS` / the matrix for
a real model without touching callers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_ALPHABET = "abcdefghijklmnopqrstuvwxyz .,0123456789"
_V = len(_ALPHABET) + 1  # +1 = OOV bucket
_CODE = {c: i for i, c in enumerate(_ALPHABET)}

_SEED_CORPUS = (
    "the quick brown fox jumps over the lazy dog. "
    "data processing at scale requires careful partitioning and shuffle "
    "management. the table contains rows and columns of values. "
    "a query plan is optimized before execution. language models assign "
    "probability to text, and perplexity measures how surprised the model "
    "is by a document. common crawl pages vary widely in quality."
)


def _build_matrix() -> np.ndarray:
    counts = np.ones((_V, _V), dtype=np.float64)  # add-one smoothing
    codes = [_CODE.get(c, _V - 1) for c in _SEED_CORPUS.lower()]
    for a, b in zip(codes, codes[1:]):
        counts[a, b] += 1.0
    return np.log10(counts / counts.sum(axis=1, keepdims=True))


_LOGP = _build_matrix()

# Integer micro-log-probs: each transition scores an int64 (log10 P * 1e6,
# rounded once at model build). The per-document score is then an EXACT
# integer sum — independent of summation order, so numpy (pairwise), a SQL
# sequential list_sum, and distributed partial sums all agree bit-for-bit.
# That order-independence is exactly what a cross-engine oracle twin and a
# 1000-executor rollup both need; the float appears only once at the end
# (10 ** (-sum / (1e6 * n)), two exactly-representable integer inputs).
_LOGP_E6 = np.round(_LOGP * 1e6).astype(np.int64)

# codepoint -> alphabet index LUT: one vectorized gather per document
# instead of one masked scan per alphabet character (39x fewer passes)
_LUT = np.full(0x110000, _V - 1, dtype=np.uint8)
for _ch, _i in _CODE.items():
    _LUT[ord(_ch)] = _i


def perplexity_series(texts: pd.Series) -> pd.Series:
    """pd.Series[str] -> pd.Series[float64] perplexity (lower = more fluent)."""
    def one(t: str) -> float:
        if not isinstance(t, str) or len(t) < 2:
            return float("inf")
        codes = np.frombuffer(t.lower().encode("utf-32-le"), dtype=np.uint32)
        idx = _LUT[codes]
        s = int(_LOGP_E6[idx[:-1], idx[1:]].sum())
        n = len(idx) - 1
        return float(10.0 ** (-s / (n * 1e6)))

    return texts.map(one).astype(np.float64)


def sql_parts() -> tuple[str, str, int]:
    """(alphabet list literal, flat V*V micro-log-prob matrix literal, V)
    for a DuckDB twin that replays the model exactly: code lookup via
    list_position (0 -> OOV bucket V-1), transition score =
    matrix[code_a * V + code_b + 1] (1-based list index), integer sum."""
    alpha = "[" + ", ".join(f"'{c}'" for c in _ALPHABET) + "]"
    mat = "[" + ", ".join(str(int(v)) for v in _LOGP_E6.ravel()) + "]"
    return alpha, mat, _V
