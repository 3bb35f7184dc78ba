"""TEI parser vs facts derived from the reference's tei1.xml fixture.

The reference's own test (test-parsexml.js) prints texts without asserts;
the expected values here follow mechanically from the parse rules
documented in functions/teiparse.py (text newlines removed, lb-driven
lines, captured-note suppression, tag stripping, div-depth toc)."""

from __future__ import annotations

import pathlib

import pytest

from ksana_corpus_builder_spark.functions.teiparse import parse_tei

REF_FIXTURE = pathlib.Path("/root/reference/testcontent/tei1.xml")


@pytest.fixture(scope="module")
def tei():
    if not REF_FIXTURE.exists():
        pytest.skip("reference fixture not available")
    return parse_tei(REF_FIXTURE.read_text(), capture_tags=("note",),
                     top_div_as_article=True)


def test_book_and_page_structure(tei):
    assert len(tei.texts) == 1
    assert len(tei.texts[0]) == 2
    assert len(tei.texts[0][0]) == 10   # lb 1.01 .. 1.10
    assert len(tei.texts[0][1]) == 12   # lb 2.01 .. 2.12


def test_lines_tag_stripped(tei):
    assert tei.texts[0][0][0] == "金剛般若波羅蜜經講記"
    assert tei.texts[0][0][1] == "——民國三十一年春講於四川法王學院——"
    assert tei.texts[0][0][3].startswith("《金剛經》，在中國佛教界，流行極為普遍")


def test_note_content_suppressed_from_text(tei):
    line = tei.texts[0][1][1]  # lb 2.02
    assert line.startswith("本經的文義次第，是極為難解的。「修多羅次第所顯」")
    assert "CBETA" not in line
    assert "阿毘達磨" not in line


def test_notes_recorded(tei):
    assert len(tei.notes) == 3
    assert all(tag == "note" for tag, _ in tei.notes)
    assert "阿毘達磨大毘婆沙論" in tei.notes[0][1]
    assert all("CBETA" in inner for _, inner in tei.notes)


def test_top_div_as_article_and_heads(tei):
    assert tei.articles[0][0] == "金剛般若波羅蜜經講記"
    assert [(d, t) for d, t, _ in tei.heads] == [
        (1, "金剛般若波羅蜜經講記"),
        (2, "懸論"),
        (3, "一　釋經題"),
    ]


def test_line_gap_warning():
    doc = '<x><lb n="1.01"/>a<lb n="1.05"/>b</x>'
    out = parse_tei(doc)
    assert any("Gap at page 1 line 5" in e for e in out.errors)
    assert out.texts[0][0][0] == "a"
    # line 5 stored 0-based index 4, gap-filled with " "
    assert out.texts[0][0][4] == "b"
    assert out.texts[0][0][1:4] == [" ", " ", " "]


def test_monotonicity_violation_reported():
    doc = '<x><lb n="2.01"/>a<lb n="1.01"/>b</x>'
    # page 2 first (no book start until a page-1 lb) -> book only at 1.01
    out = parse_tei(doc)
    # first lb: page 2 != 1 -> no book yet, tokens land in book-less buffer;
    # second lb: page 1 -> book 1. No crash either way.
    assert out.texts  # parses without error


def test_apply_rend():
    doc = '<x><lb n="1.01"/><hi rend="bold">加粗</hi>後</x>'
    out = parse_tei(doc, apply_rend=True)
    assert out.rend and out.rend[0][0] == "bold"
