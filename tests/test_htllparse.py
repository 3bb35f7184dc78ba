"""HTLL lexer semantics (no reference fixture ships for htll; these pin
the behaviors read off parsehtll.js/htll/handlers.js)."""

from __future__ import annotations

from ksana_corpus_builder_spark.functions.htllparse import parse_htll


def test_pages_books_lines():
    doc = "~1\nfirst line\nsecond line\n~2\npage two\n"
    out = parse_htll(doc)
    # ~1 -> book 1 page 0; the newline after ~pb is eaten, so 'first line'
    # starts at line 0; NO leading-newline skip in htll beyond that
    assert len(out.texts) == 1
    assert out.texts[0][0][0] == "first line"
    assert out.texts[0][0][1] == "second line"
    assert out.texts[0][1][0] == "page two"


def test_article_group_head():
    doc = "~1\n^Article One\n#2 Chapter Two\n^^Group A\nbody\n"
    out = parse_htll(doc)
    assert out.articles == [("Article One", out.articles[0][1])]
    assert out.groups[0][0] == "Group A"
    assert out.heads[0][:2] == (2, "Chapter Two")
    # line tags eat their own newline: body is the page's first line
    assert out.texts[0][0][0] == "body"


def test_head_without_depth():
    out = parse_htll("~1\n#NoDepth Title\nx\n")
    assert out.heads[0][0] is None
    assert out.heads[0][1] == "NoDepth Title"


def test_column_letters_subdivide_pages():
    # handlers.js:51-55: parseInt(col,36)-10 -> a=0 b=1 c=2 d=3
    out = parse_htll("~1a\nA\n~1b\nB\n~2a\nC\n", columns=4)
    # page indexes: 1a->0 (book start), 1b->1, 2a->4
    assert out.texts[0][0][0] == "A"
    assert out.texts[0][1][0] == "B"
    assert out.texts[0][4][0] == "C"
    assert out.texts[0][2] == [" "] and out.texts[0][3] == [" "]  # gap fill


def test_long_pb_ignores_book_part():
    out = parse_htll("~3.1\nX\n")
    # long form \d+\.(\d+): page = 1 -> pagenumber 0 -> new book
    assert out.texts[0][0][0] == "X"


def test_bad_pb_reported():
    out = parse_htll("~x\ntext\n")
    assert any("wrong pb" in e for e in out.errors)


def test_p_and_ptr_tags():
    out = parse_htll("~1\na/p b%x9 c\n")
    assert out.n_p_fields == 1
    # inline tag bodies are consumed, surrounding text flows on
    assert out.texts[0][0][0] == "a b c"


def test_column_addressed_pages_roundtrip_kpos():
    """htll column letters subdivide pages (handlers.js:51-55): with
    columns=4, ~2b lands on packed page 5 = (2-1)*4 + 1; the kpos
    round-trips through the column-bearing AddressPattern."""
    from ksana_corpus_builder_spark import codec
    out = parse_htll("~1a\nfirst\n~1b\nsecond\n~2b\nthird\n", columns=4)
    # book 1: page 1 col a -> packed 0, col b -> packed 1, page 2 col b -> 5
    assert out.texts[0][0][0] == "first"
    assert out.texts[0][1][0] == "second"
    assert out.texts[0][5][0] == "third"
    pat = codec.AddressPattern(column=4)
    k = codec.pack(1, 5, 0, 0, pat)
    assert codec.stringify(k, pat) == "1p2b.0100"
    assert codec.parse("1p2b.0100", pat) == k
