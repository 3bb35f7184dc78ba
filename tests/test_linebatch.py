"""Equivalence gate for the batch-accelerated fidelity line kernels.

The vectorized fast paths in functions/linebatch.py must be byte-identical
to the real parsers (parse_pre / parse_tei) on EVERY input — fast-path
docs by derived algebra, everything else by explicit fallback. This test
runs both paths on adversarial corpora (hypothesis-generated plus
hand-picked edge cases spanning every fallback trigger) and asserts
identical (doc_id, line, text_line) rows. The golden parser gates
(test_preparse.py / test_teiparse.py) are untouched and still pin the
parsers themselves against the reference's own fixtures.
"""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ksana_corpus_builder_spark.functions.linebatch import (
    _FALLBACK_RE, parse_a3_cached, pre_lines_batch, tei_lines_batch,
    _pre_lines_slow, _tei_lines_slow)
from ksana_corpus_builder_spark.functions.a3parse import parse_accelon3

EDGE_TEXTS = [
    "",                      # empty doc -> no rows
    "\n\n\n",                # only blanks -> no rows
    "   ",                   # whitespace-only doc
    "hello world",           # single line
    "\n\nalpha\n\nbeta\n\n",  # leading/interior/trailing blanks
    "a\nb\nc",
    "  leading spaces\ntrailing spaces  \n",
    "one\n \ntwo",           # whitespace-only INTERIOR line (fallback)
    " \nx",                  # whitespace-only LEADING line (fallback)
    "x\n ",                  # whitespace-only TRAILING line (fallback)
    "tag <b>bold</b> text\nplain",      # markup (fallback)
    "stray < open\nnext",               # bare < (fallback)
    "crlf\r\nline\rmac",                # CR normalize (fallback)
    "﻿bom line\nafter",                 # BOM (fallback)
    "中文 一行\nsecond 行",              # CJK tokens
    "café résumé\nnaïve",               # accented latin
    "1 2 3\n4\t5\x0b6",                 # digits + odd whitespace in-line
    "a" * 300 + "\n" + "b" * 5,         # long line
]

_CHARS = st.sampled_from(
    list("ab <>/\n\r\t\x0b.1一二é'\"=") + ["pb", 'n="1"', "<pb", "/>"])
_TEXT = st.lists(_CHARS, max_size=40).map("".join)


def _frame(ids, texts):
    return (pd.Series(ids, dtype="int64"),
            pd.Series(texts, dtype="object"))


def _canon(df: pd.DataFrame) -> list[tuple]:
    return sorted(map(tuple, df[["doc_id", "line", "text_line"]]
                      .itertuples(index=False)))


def test_pre_edge_corpus_identical():
    ids, texts = _frame(range(len(EDGE_TEXTS)), EDGE_TEXTS)
    assert _canon(pre_lines_batch(ids, texts)) == \
        _canon(_pre_lines_slow(ids, texts))


def test_tei_edge_corpus_identical():
    ids, texts = _frame(range(len(EDGE_TEXTS)), EDGE_TEXTS)
    assert _canon(tei_lines_batch(ids, texts)) == \
        _canon(_tei_lines_slow(ids, texts))


def test_edge_corpus_exercises_both_paths():
    s = pd.Series(EDGE_TEXTS, dtype="object")
    hits = s.str.contains(_FALLBACK_RE)
    assert hits.any() and (~hits).any()


@settings(max_examples=60, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_pre_property_identical(texts):
    ids, t = _frame(range(len(texts)), texts)
    assert _canon(pre_lines_batch(ids, t)) == _canon(_pre_lines_slow(ids, t))


@settings(max_examples=60, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_tei_property_identical(texts):
    ids, t = _frame(range(len(texts)), texts)
    assert _canon(tei_lines_batch(ids, t)) == _canon(_tei_lines_slow(ids, t))


def test_pre_null_text_treated_as_empty():
    ids, t = _frame([7, 8], None)
    t = pd.Series(["x", None], dtype="object")
    out = pre_lines_batch(ids, t)
    assert _canon(out) == [(7, 0, "x")]


def test_a3_cache_matches_direct_parse():
    parse_a3_cached.cache_clear()
    tmpl = ('<頁 n="1"/>\n<卷 t="品">T{a}</卷>\nalpha beta\n'
            '<品>S{b}</品>\ngamma d\n<a n="anc{c}"/>tail words')
    contents = [tmpl.format(a=a, b=b, c=c)
                for a in (0, 1) for b in (0, 5) for c in (0, 3)]
    for content in contents * 3:  # repeats hit the cache
        cached = parse_a3_cached(content)
        direct = parse_accelon3(content)
        assert cached.toc == direct.toc
        assert cached.anchors == direct.anchors
        assert cached.errors == direct.errors
    info = parse_a3_cached.cache_info()
    assert info.misses == len(contents)          # one real parse per distinct
    assert info.hits == 2 * len(contents)        # repeats served from cache


def test_fast_path_actually_fast():
    """The bulk synthetic corpus shape (plain words + newlines) must NOT
    hit the fallback — otherwise the acceleration silently evaporates."""
    s = pd.Series(["alpha beta\ngamma\n\ndelta", "one two three"] * 50)
    assert not s.str.contains(_FALLBACK_RE).any()


def test_pre_crlf_docs_take_fast_path():
    """Round-5 widening: CRLF/CR-only docs are vectorized-normalized and
    classified FAST for the pre builder (still slow for tei, whose raw
    split does not commute with normalization)."""
    from ksana_corpus_builder_spark.functions.linebatch import (
        _PRE_FALLBACK_RE)
    s = pd.Series(["crlf\r\nline\rmac"], dtype="object")
    norm = (s.str.replace("\r\n", "\n", regex=False)
            .str.replace("\r", "\n", regex=False))
    assert not norm.str.contains(_PRE_FALLBACK_RE).any()  # fast for pre
    assert s.str.contains(_FALLBACK_RE).any()             # slow for tei
    # and the fast result is still byte-identical to the real parser
    ids = pd.Series([0], dtype="int64")
    assert _canon(pre_lines_batch(ids, s)) == _canon(_pre_lines_slow(ids, s))
