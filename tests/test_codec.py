"""kpos codec — pack/unpack/stringify round-trips (reference semantics:
Ksanapos pattern arithmetic inverted.js:11-14; human format evidence
test-parsepre.js:13-14 '1p3.0102-04')."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from ksana_corpus_builder_spark import codec


@given(st.integers(1, 100), st.integers(0, 1000), st.integers(0, 99), st.integers(0, 99))
def test_pack_unpack_roundtrip(book, page, line, ch):
    k = codec.pack(book, page, line, ch)
    assert codec.unpack(k) == (book, page, line, ch)


@given(st.integers(1, 100), st.integers(0, 1000), st.integers(0, 99), st.integers(0, 99))
def test_ordering_is_lexicographic(book, page, line, ch):
    k = codec.pack(book, page, line, ch)
    assert codec.pack(book, page, line, ch + 1) > k
    assert codec.pack(book, page, line + 1, 0) > k
    assert codec.pack(book + 1, 0, 0, 0) > k


def test_stringify_reference_format():
    # the reference golden range (test-parsepre.js:13-14): <kai> on page 3
    # (stored 0-based 2), line 1 (stored 0), concrete-token chars [2, 4)
    # -> "1p3.0102-04" (display: book raw, page+1, line+1, ch raw,
    # end exclusive; derivation in codec.stringify docstring)
    start = codec.pack(1, 2, 0, 2)
    end = codec.pack(1, 2, 0, 4)
    assert codec.stringify(start) == "1p3.0102"
    assert codec.stringify_range(start, end) == "1p3.0102-04"
    assert codec.parse("1p3.0102") == start
    assert codec.parse_range("1p3.0102-04") == (start, end)
    # prefix elision across lines and pages
    assert codec.stringify_range(codec.pack(1, 2, 0, 2),
                                 codec.pack(1, 2, 3, 1)) == "1p3.0102-0401"
    assert codec.parse_range("1p3.0102-0401") == (
        codec.pack(1, 2, 0, 2), codec.pack(1, 2, 3, 1))


def test_book_helpers():
    k = codec.pack(5, 7, 3, 9)
    assert codec.book_of(k) == 5
    assert codec.unpack(codec.book_start_pos(k)) == (5, 0, 0, 0)
    assert codec.unpack(codec.next_line_start(k)) == (5, 7, 4, 0)


def test_spark_column_codec(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(2, 10, 5, 7)], "b int, p int, l int, c int")
    k = df.select(codec.pack_col(F.col("b"), F.col("p"), F.col("l"), F.col("c"))
                  .alias("k"))
    got = k.collect()[0].k
    assert got == codec.pack(2, 10, 5, 7)
    u = k.select(*[v.alias(n) for n, v in codec.unpack_cols(F.col("k")).items()])
    row = u.collect()[0]
    assert (row.book, row.page, row.line, row.ch) == (2, 10, 5, 7)


def test_column_pattern_roundtrip():
    """htll/handlers.js:51-55: column folds into the page component;
    stringify shows page number + letter; parse inverts it."""
    pat = codec.AddressPattern(column=4)
    k = codec.pack(3, pat.fold_page(6, 2), 4, 7, pat)
    assert codec.stringify(k, pat) == "3p7c.0507"
    assert codec.parse("3p7c.0507", pat) == k
    assert pat.unfold_page(6 * 4 + 2) == (6, 2)
    # column 'a' is the default when the letter is omitted in source pbs
    assert codec.parse("3p7a.0507", pat) == codec.pack(
        3, pat.fold_page(6, 0), 4, 7, pat)


def test_column_pattern_zero_is_identity():
    pat = codec.AddressPattern()
    assert pat.fold_page(5, 0) == 5
    assert pat.unfold_page(5) == (5, 0)
    k = codec.pack(2, 5, 1, 3)
    assert codec.parse(codec.stringify(k)) == k
