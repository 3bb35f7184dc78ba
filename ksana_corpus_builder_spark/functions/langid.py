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


def detect(texts: pd.Series, words: pd.Series | None = None,
           stream=None, chars=None) -> pd.DataFrame:
    """-> DataFrame(lang_detected, lang_hits, n_words) — vectorized kernel.

    ``words`` (case-preserving split) lets the fused pipeline share one
    split across kernels: lowercasing per word inside the counting loop is
    provably identical to lower-then-split (whitespace is case-invariant).
    ``stream`` (wordstream.WordStream over those words) additionally shares
    the flatten+factorize pass with the quality-rules kernel.
    """
    from . import wordstream

    t = texts.fillna("")
    if stream is None:
        stream = wordstream.build(t.str.split() if words is None else words)
    n_words = pd.Series(stream.lens, index=t.index)

    # Factorize-then-count (shared stream): lowercase + profile-match only
    # the UNIQUE words (~10x fewer than tokens), broadcast the unique-level
    # mask back through the codes and bincount per language. MEASURED 3x
    # faster than both the per-word dict loop and the explode+isin variants
    # (per-token work collapses to a C-level gather; the expensive string
    # ops run per UNIQUE word).
    nl = len(LANGS)
    hits = np.zeros((len(t), nl), dtype=np.int64)
    if len(stream.uniq):
        ul = stream.uniq_series.str.lower()
        for li, lang in enumerate(LANGS):
            umask = ul.isin(PROFILES[lang]).to_numpy()
            hits[:, li] = stream.count_where_unique(umask)
    hits_df = pd.DataFrame(hits, columns=LANGS, index=t.index)

    # \s and CJK counts in one pass over the concatenated UTF-32 buffer
    # (exact re semantics per unique codepoint) — the former per-document
    # str.count(r"\S") scan was the kernel's single largest cost. `chars`
    # shares that pass with the quality-rules kernel in the fused pipeline.
    if chars is None:
        chars = wordstream.char_stats(t)
    cjk = pd.Series(chars.cjk, index=t.index)
    nonspace = pd.Series(chars.nonspace, index=t.index)
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
