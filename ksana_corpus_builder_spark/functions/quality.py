"""Gopher/C4-style heuristic quality rules — vectorized.

Re-imagines the reference's per-document structural checks as corpus-quality
rules: long lines (``index.js:239-243``), disordered pages
(``index.js:251-268``), page gaps (``handlers.js:39-42``) become the
max-line-length / repetition / structure rules of a web-text filter. Like the
reference, rules REPORT rather than mutate (``longLines`` is collected, text
untouched) — we emit a ``rules_hit`` array + boolean ``keep``.

All rule predicates are INTEGER arithmetic (cross-multiplied ratios), so the
Spark built-in-function path, the pandas kernel, and the DuckDB oracle agree
bit-for-bit — no float thresholds anywhere.

Stats computed per document (over whitespace word tokens):
    n_chars, n_words, sum_word_len, n_distinct_words, stopword_hits,
    max_word_len, n_lines, n_dup_lines, max_line_len, digit_chars

Rules (name -> predicate on stats):
    too_short         n_words < MIN_WORDS
    too_long          n_words > MAX_WORDS
    mean_word_len     sum_word_len < 3*n_words  OR  sum_word_len > 10*n_words
    low_stopword      stopword_hits * 50 < n_words  (ratio < 0.02)
    low_ttr           n_distinct_words * 10 < n_words * 3  (TTR < 0.3)
    long_word         max_word_len > MAX_WORD_LEN
    dup_lines         n_dup_lines * 2 > n_lines  (over half the lines repeat)
    long_line         max_line_len > MAX_LINE_LEN  (reference maxchar check)
    digit_heavy       digit_chars * 2 > n_chars
keep = no rule hit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MIN_WORDS = 20
MAX_WORDS = 100_000
MIN_MEAN_WL_NUM = 3     # mean word len < 3   <=>  sum < 3*n
MAX_MEAN_WL_NUM = 10    # mean word len > 10  <=>  sum > 10*n
MAX_WORD_LEN = 60
MAX_LINE_LEN = 4000     # plays the reference addressPattern.maxchar role
RULE_NAMES = [
    "too_short", "too_long", "mean_word_len", "low_stopword", "low_ttr",
    "long_word", "dup_lines", "long_line", "digit_heavy",
]

# English function words; the driver's synthetic documents vocabulary
# includes 'the' and 'a'. Kept tiny + frozen: it is part of the contract.
STOPWORDS = (
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that", "for",
    "on", "as", "with", "was", "at", "by", "be", "this", "are", "or",
)


def word_stats(texts: pd.Series, words: pd.Series | None = None,
               stream=None, chars=None) -> pd.DataFrame:
    """Vectorized per-doc stats. ``words`` lets the fused pipeline share a
    single split across kernels; ``stream`` (a wordstream.WordStream over
    those words) additionally shares the flatten+factorize pass with the
    langid kernel, and ``chars`` (wordstream.CharStats) shares the one
    character-class buffer pass."""
    t = texts.fillna("")
    if stream is None:
        from . import wordstream
        stream = wordstream.build(t.str.split() if words is None else words)
    # word-level stats over the shared factorized token stream: per-token
    # work is a C-level gather of the unique-word table, per-doc reductions
    # are boundary cumsum/bincount — no per-document Python loop. Identical
    # integers to the former per_doc() fold (golden + oracle gated).
    tok_lens = stream.uniq_lens[stream.codes] if stream.pos.size \
        else np.zeros(0, np.int64)
    sw_mask = (stream.uniq_series.isin(STOPWORDS).to_numpy()
               if len(stream.uniq) else np.zeros(0, bool))
    arr = np.column_stack([
        stream.lens,
        stream.seg_sum(tok_lens),
        stream.distinct_per_doc(),
        stream.count_where_unique(sw_mask),
        stream.seg_max(tok_lens),
    ]) if stream.n_docs else np.zeros((0, 5), np.int64)
    lines = t.str.split("\n")
    n_lines = lines.str.len().fillna(0).astype(np.int64)
    # sum of (count-1) over duplicated lines == len - distinct
    n_dup_lines = lines.map(
        lambda ls: (len(ls) - len(set(ls))) if ls else 0).astype(np.int64)
    max_line_len = lines.map(lambda ls: max((len(x) for x in ls), default=0)).astype(np.int64)
    if chars is None:
        from . import wordstream
        chars = wordstream.char_stats(t)
    digit_chars = pd.Series(chars.digits, index=t.index)

    return pd.DataFrame({
        "n_chars": chars.n_chars,
        "n_words": arr[:, 0],
        "sum_word_len": arr[:, 1],
        "n_distinct_words": arr[:, 2],
        "stopword_hits": arr[:, 3],
        "max_word_len": arr[:, 4],
        "n_lines": n_lines.to_numpy(),
        "n_dup_lines": n_dup_lines.to_numpy(),
        "max_line_len": max_line_len.to_numpy(),
        "digit_chars": digit_chars.to_numpy(),
    }, index=texts.index)


def rule_flags(stats: pd.DataFrame) -> pd.DataFrame:
    """Integer-arithmetic rule predicates -> one bool column per rule."""
    s = stats
    return pd.DataFrame({
        "too_short": s.n_words < MIN_WORDS,
        "too_long": s.n_words > MAX_WORDS,
        "mean_word_len": (s.sum_word_len < MIN_MEAN_WL_NUM * s.n_words)
                         | (s.sum_word_len > MAX_MEAN_WL_NUM * s.n_words),
        "low_stopword": s.stopword_hits * 50 < s.n_words,
        "low_ttr": s.n_distinct_words * 10 < s.n_words * 3,
        "long_word": s.max_word_len > MAX_WORD_LEN,
        "dup_lines": s.n_dup_lines * 2 > s.n_lines,
        "long_line": s.max_line_len > MAX_LINE_LEN,
        "digit_heavy": s.digit_chars * 2 > s.n_chars,
    }, index=stats.index)


def rules_hit_and_keep(texts: pd.Series,
                       words: pd.Series | None = None,
                       stream=None, chars=None) -> pd.DataFrame:
    """text -> (keep: bool, rules_hit: list[str]) — the oracle's label kernel."""
    flags = rule_flags(word_stats(texts, words, stream, chars))
    m = flags[RULE_NAMES].to_numpy()  # one bool matrix, no row-wise apply
    names = np.array(RULE_NAMES, dtype=object)
    hits = pd.Series([list(names[row]) for row in m], index=texts.index)
    return pd.DataFrame({"keep": ~m.any(axis=1), "rules_hit": hits}, index=texts.index)
