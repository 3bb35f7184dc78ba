"""Language identification — fastText-style linear scorer, vectorized.

Public-knowledge design: a tiny stopword/character-class profile per
language (the classic n-gram/function-word heuristic). Deterministic
integer scoring so Spark / pandas / DuckDB agree exactly:

    score(lang) = number of word tokens in PROFILES[lang]
    cjk text: if CJK chars * 2 > total non-space chars -> 'zh'
    winner   = argmax score, ties broken by language code ascending;
               all-zero -> 'und'

``lang_score`` = hits/n_words, emitted as an exact int ratio pair too.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "an", "of", "and", "to", "in", "is", "it", "that",
           "for", "on", "with", "was", "this", "are", "be", "you", "not"),
    "fr": ("le", "la", "les", "de", "des", "et", "un", "une", "du", "que",
           "qui", "dans", "pour", "est", "pas", "vous", "au", "sur", "avec"),
    "es": ("el", "la", "los", "las", "de", "y", "que", "en", "un", "una",
           "por", "con", "para", "del", "se", "su", "es", "al", "como"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine",
           "den", "von", "zu", "im", "auf", "für", "sich", "des", "dem", "auch"),
}
LANGS = sorted(PROFILES)  # deterministic tie-break order

_CJK_RE = r"[一-鿿]"
_NONSPACE_RE = r"\S"


# word -> tuple of language indexes (profiles overlap: 'de'/'la'/... appear
# in several languages), built once so scoring is ONE pass per document
_W2L: dict[str, tuple[int, ...]] = {}
for _li, _lang in enumerate(LANGS):
    for _w in PROFILES[_lang]:
        _W2L[_w] = _W2L.get(_w, ()) + (_li,)


def detect(texts: pd.Series, words: pd.Series | None = None) -> pd.DataFrame:
    """-> DataFrame(lang_detected, lang_hits, n_words) — vectorized kernel.

    ``words`` (case-preserving split) lets the fused pipeline share one
    split across kernels: lowercasing per word inside the counting loop is
    provably identical to lower-then-split (whitespace is case-invariant).
    """
    t = texts.fillna("")
    if words is None:
        words = t.str.split()
    n_words = words.str.len().fillna(0).astype(np.int64)

    # One tight pass over the word stream with a dict lookup per word.
    # MEASURED FASTER than the "vectorized" alternatives (explode + lower
    # + per-language isin + bincount = 4-6 full C passes over 3.7M words
    # ~= 3.0s/20k docs; this single pass ~= 2.0s): when per-element work
    # is a small-dict probe, one fused pass beats many flat passes.
    get = _W2L.get
    nl = len(LANGS)

    def count_all(ws: list[str]) -> list[int]:
        c = [0] * nl
        for w in ws:
            ls = get(w.lower())
            if ls:
                for li in ls:
                    c[li] += 1
        return c

    hits_df = pd.DataFrame(
        np.array([count_all(ws) for ws in words], dtype=np.int64)
        .reshape(len(t), nl),
        columns=LANGS, index=t.index)

    cjk = t.str.count(_CJK_RE).astype(np.int64)
    nonspace = t.str.count(_NONSPACE_RE).astype(np.int64)
    is_cjk = cjk * 2 > nonspace

    best = hits_df.idxmax(axis=1)            # ties -> first column = ascending code
    best_hits = hits_df.max(axis=1)
    lang = best.where(best_hits > 0, "und")
    lang = lang.mask(is_cjk, "zh")
    best_hits = best_hits.mask(is_cjk, cjk)

    return pd.DataFrame({
        "lang_detected": lang,
        "lang_hits": best_hits.astype(np.int64),
        "n_words": n_words,
    }, index=t.index)
