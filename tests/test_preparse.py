"""Pre-format parser vs the REFERENCE'S OWN golden test facts
(test-parsepre.js:8-14 on testcontent/test1pre.xml):

    texts[0][0][0] == "FIRST ARTICLE"
    texts[0][0].length == 4      (page 1: article, preserved blank, 2 lines)
    texts[0][1].length == 4      (page 2: text may hug pb; mid blank kept)
    stringify(rend kai range) == "1p3.0102-04"

The fixture is read from the read-only reference checkout; skipped if the
reference isn't present (the semantics themselves are pinned by the
inline fixture test below either way)."""

from __future__ import annotations

import pathlib

import pytest

from ksana_corpus_builder_spark import codec
from ksana_corpus_builder_spark.functions.preparse import parse_pre

REF_FIXTURE = pathlib.Path("/root/reference/testcontent/test1pre.xml")


@pytest.fixture(scope="module")
def ref_parsed():
    if not REF_FIXTURE.exists():
        pytest.skip("reference fixture not available")
    return parse_pre(REF_FIXTURE.read_text(), rend_class=("kai",))


def test_reference_first_article(ref_parsed):
    assert ref_parsed.texts[0][0][0] == "FIRST ARTICLE"


def test_reference_page_line_counts(ref_parsed):
    assert len(ref_parsed.texts[0][0]) == 4
    assert len(ref_parsed.texts[0][1]) == 4


def test_reference_kai_range_stringifies(ref_parsed):
    # rend entries sorted by kpos: [0] = the article rend, [1] = <kai>
    value, start, end = ref_parsed.rend[1]
    assert value == "kai"
    assert codec.stringify_range(start, end) == "1p3.0102-04"


def test_reference_article_and_errors(ref_parsed):
    assert ref_parsed.articles[0][0] == "FIRST ARTICLE"
    assert any("mismatched" in e for e in ref_parsed.errors)  # <b></c>


def test_inline_fixture_semantics():
    """Same semantics pinned without the reference checkout: blank-line
    preservation, trailing-blank drop, pb-hugging text, token-counted
    char positions."""
    doc = (
        '<xml>\n<pb n="1"/>\n<article>AA BB</article>\n\n'
        "one\ntwo\n\n\n"
        '<pb n="2"/>hug\n\nlast\n</xml>'
    )
    out = parse_pre(doc, rend_class=())
    assert out.texts[0][0] == ["AA BB", " ", "one", "two"]
    assert out.texts[0][1] == ["hug", " ", "last"]
    # article range: 2 latin tokens -> chars [0, 2) on page 1 line 1
    value, start, end = out.rend[0]
    assert value == "article"
    assert codec.stringify_range(start, end) == "1p1.0100-02"


def test_second_book_on_page_one():
    doc = '<pb n="1"/>\nb1\n<pb n="1"/>\nb2\n'
    out = parse_pre(doc)
    assert len(out.texts) == 2
    assert out.texts[0][0] == ["b1"]
    assert out.texts[1][0] == ["b2"]


def test_page_gap_reported():
    doc = '<pb n="1"/>\nx\n<pb n="3"/>\ny\n'
    out = parse_pre(doc)
    assert any("wrong page" in e for e in out.errors)


def test_random_page_collects_disorder():
    """U4 randomPage (index.js:256-261): out-of-order pages are collected,
    not errors; default mode still errors."""
    content = '<pb n="1"/>\na\n<pb n="5"/>\nb'
    strict = parse_pre(content)
    assert any("wrong page number 5" in e for e in strict.errors)
    loose = parse_pre(content, random_page=True)
    assert loose.disorder_pages == [5]
    assert not any("wrong page number" in e for e in loose.errors)
