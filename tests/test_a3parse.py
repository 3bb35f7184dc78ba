"""Accelon3 parser: CJK pb/p handlers, ptr/def note self-join (J4),
external footnote consume + unconsumed report (J3)."""

from __future__ import annotations

from ksana_corpus_builder_spark import codec
from ksana_corpus_builder_spark.functions.a3parse import parse_accelon3

DOC = (
    '<xml>\n<頁 n="1"/>\n'
    "第一行之前<註 n="
    '"5"/>後文\n'
    '這有<釋 n="5">釋文內容</釋>一段\n'
    '腳註<fn n="7"/>在此\n'
    '<fn n="99"/>\n'
    '<rubynote t="音讀"/>尾行\n'
    "</xml>"
)


def test_pages_and_lines():
    out = parse_accelon3(DOC, footnotes={"7": "七號腳註", "8": "未用"})
    assert out.texts[0][0][0] == "第一行之前後文"
    assert out.texts[0][0][1] == "這有釋文內容一段"


def test_ptr_def_join():
    out = parse_accelon3(DOC, footnotes={"7": "x"})
    assert len(out.notes) == 1
    n, text, ptr_kpos = out.notes[0]
    assert n == "5" and text == "釋文內容"
    # ptr recorded at the kpos where 註 opened: page 1 line 1, after
    # 5 concrete CJK tokens ("第一行之前")
    assert codec.unpack(ptr_kpos) == (1, 0, 0, 5)


def test_duplicate_ptr_and_missing_ptr():
    out = parse_accelon3('<頁 n="1"/>\n<註 n="1"/><註 n="1"/>'
                         '<釋 n="2">x</釋>\n')
    assert any("note ptr exists 1" in e for e in out.errors)
    assert any("no such ptr 2" in e for e in out.errors)


def test_footnote_consume_and_anti_join():
    out = parse_accelon3(DOC, footnotes={"7": "七號腳註", "8": "未用"})
    assert out.footnotes_used == [("7", "七號腳註")]
    assert out.footnotes_unconsumed == ["8"]       # leftover reported
    assert any("footnote 99 notfound" in e for e in out.errors)


def test_rubynote():
    out = parse_accelon3(DOC, footnotes={"7": "x"})
    assert out.rubynotes and out.rubynotes[0][0] == "音讀"
