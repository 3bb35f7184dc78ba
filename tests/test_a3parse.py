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


def test_schema_toc_tree():
    """tree.js prolog: t attr establishes the path; tags in the path open
    toc nodes at their kpos; a repeated root tag re-roots (truncate)."""
    content = ('<頁 n="1"/>\n<卷 t="品">First</卷>\nbody text\n'
               '<品>Sub</品>\nmore\n<卷>Second</卷>\n<品>Sub2</品>')
    out = parse_accelon3(content)
    assert [(d, t, codec.unpack(k)) for d, t, k in out.toc] == [
        (0, "First", (1, 0, 0, 0)),
        (1, "Sub", (1, 0, 2, 0)),
        (0, "Second", (1, 0, 4, 0)),
        (1, "Sub2", (1, 0, 5, 0)),
    ]


def test_toc_nested_is_error():
    out = parse_accelon3('<頁 n="1"/>\n<卷 t="品">a<卷>b</卷>c</卷>')
    assert any("nested Toc" in e for e in out.errors)


def test_encode_tree_item_base36():
    from ksana_corpus_builder_spark.functions.a3parse import encode_tree_item
    k = codec.pack(1, 0, 2, 0)
    assert encode_tree_item(1, "品名", k) == f"1\t品名\t{_b36(k)}"


def _b36(n):
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    out = ""
    while True:
        out = digits[n % 36] + out
        n //= 36
        if not n:
            return out


def test_anchor_and_svg_fields():
    out = parse_accelon3('<頁 n="1"/>\nab <a n="top"/>cd <svg url="u1"/>x\n'
                         '<svg url="nope"/>', svgs={"u1": "<svg/>"})
    # ch counts concrete TOKENS (index.js:177-186): "ab" = 1 token, so the
    # anchor sits at ch 1 and the svg (after "cd") at ch 2
    assert out.anchors == [("top", codec.pack(1, 0, 0, 1))]
    assert out.svg_fields == [("<svg/>", codec.pack(1, 0, 0, 2),
                               codec.pack(1, 0, 0, 2))]
    assert any("cannot load nope" in e for e in out.errors)


def test_img_handler_types_and_dataurl():
    """img.js:1-41: jpeg/png/svg accepted (jpg aliased), data-URL prefix
    stripped, raw svg stays utf8, other raw content base64-encoded,
    missing/unsupported warn."""
    import base64
    content = ('<頁 n="1"/>\nx<圖 n="a.jpg"/><img n="pics/b.png"/>'
               '<圖 n="c.svg"/><圖 n="d.gif"/><圖 n="missing.png"/>')
    out = parse_accelon3(content, images={
        "a.jpg": "data:image/jpeg;base64,QUJD",
        "b.png": "rawbytes",
        "c.svg": "<svg>vector</svg>",
    })
    by_type = {t: b for t, b, _ in out.images}
    assert by_type["jpeg"] == "QUJD"  # data-URL prefix stripped
    assert by_type["png"] == base64.b64encode(b"rawbytes").decode()
    assert by_type["svg"] == "<svg>vector</svg>"  # raw svg stays utf8
    assert any("unsupported image type gif" in e for e in out.errors)
    assert any("cannot find imagefile missing.png" in e for e in out.errors)


def test_toc_root_subtree_depths():
    """parseaccelon3.js opts.toc: the root tag emits depth 0, deeper tags
    emit depth-rootdepth, shallower tags emit nothing."""
    content = ('<頁 n="1"/>\n<檔 t="卷,品">F</檔>\n<卷>Root</卷>\n'
               'text\n<品>Leaf</品>')
    out_all = parse_accelon3(content)
    assert [(d, t) for d, t, _ in out_all.toc] == [
        (0, "F"), (1, "Root"), (2, "Leaf")]
    out_rooted = parse_accelon3(content, toc_root="卷")
    assert [(d, t) for d, t, _ in out_rooted.toc] == [
        (0, "Root"), (1, "Leaf")]  # 檔 (shallower) not emitted
