"""Accelon3 format (P4) — the pre parser with CJK tag handlers.

Derived from /root/reference/parseaccelon3.js:11-13 (handler registry:
頁=pb, 段=p, 註=ptr, 釋=def, 圖=img) and accelon3handler/note.js:

- 頁 n: identical to <pb> (format.pb — page 1 starts a book).
- 段: empty 'p' article-field marker (format.js:37-40).
- 註 n: ptr — records the CURRENT kpos under n; a duplicate n is an
  error (note.js:31-38: "note ptr exists").
- 釋 n (closing): def — joins back to the recorded ptr kpos and attaches
  the inner text AT THE PTR POSITION (note.js:41-57) — the reference's
  intra-document self-join (SURVEY J4). Missing ptr is an error.
- fn/footnote n: consumed from an EXTERNAL footnotes dict (broadcast
  side-input, note.js:4-23); entries left unconsumed at the end are
  reported (parsepre.js:277-284) — the J3 hash-join + anti-join pair.
- rubynote: records attribute t at the open kpos (note.js:60-67).
- Schema-driven toc tree (accelon3handler/tree.js:7-39 +
  parseaccelon3.js onopentag/onclosetag): an open tag with attribute
  ``t`` (comma-separated child tag names, trailing '.' stripped)
  re-roots or extends the tree-tag path (truncate to its own index if
  already present, else reset to [name]); ``l`` registers leaf tags.
  A tag whose name is IN the path opens a toc node at the current kpos
  with depth = its path index; on the matching close the node's text is
  the tag-stripped inner markup, emitted as (depth, text, kpos) — the
  encodeTreeItem "depth\\ttext\\tkpos36" rows (tree.js:2). Nested toc
  opens are an error (parseaccelon3.js "nested Toc").
- svg (accelon3handler/svg.js:1-13): on close, resolve url (url/src/n
  attr) against an external svg side-dict; found -> an "svg" article
  field over [open,close) kpos; missing -> "cannot load" error.
- a/anchor (accelon3handler/anchor.js:1-9): name (name/n attr) recorded
  as a global "anchor" field at the current kpos.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .preparse import _ATTR_RE, _TAG_RE, _State, _handle_pb


@dataclass
class A3Parsed:
    texts: list[list[list[str]]] = field(default_factory=list)
    articles: list[tuple[str, int]] = field(default_factory=list)
    notes: list[tuple[str, str, int]] = field(default_factory=list)  # n, def, ptr_kpos
    footnotes_used: list[tuple[str, str]] = field(default_factory=list)
    footnotes_unconsumed: list[str] = field(default_factory=list)
    rubynotes: list[tuple[str, int]] = field(default_factory=list)
    toc: list[tuple[int, str, int]] = field(default_factory=list)  # depth, text, kpos
    svg_fields: list[tuple[str, int, int]] = field(default_factory=list)  # content, start, end
    anchors: list[tuple[str, int]] = field(default_factory=list)  # name, kpos
    images: list[tuple[str, str, int]] = field(default_factory=list)  # type, base64, kpos
    n_p_fields: int = 0
    errors: list[str] = field(default_factory=list)


def encode_tree_item(depth: int, text: str, kpos: int) -> str:
    """reference tree.js:2 encodeTreeItem: depth\\ttext\\tkpos36."""
    out, k = [], kpos
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    while True:
        out.append(digits[k % 36])
        k //= 36
        if not k:
            break
    return f"{depth}\t{text}\t{''.join(reversed(out))}"


# tags whose presence never affects the tree path (tree.js ignoretags)
_TOC_IGNORE = frozenset({"頁", "段", "註", "釋", "RM", "RN", "P", "PB",
                         "圖", "IMAGE", "IMG", "圖文字"})


_IMG_ACCEPT = frozenset({"jpeg", "png", "svg"})
_DATA_URL_RE = re.compile(r"data.+?base64,")


def _resolve_image(name: str, images: dict[str, str],
                   errors: list[str]) -> tuple[str, str] | None:
    """img handler content resolution (accelon3handler/img.js:1-41):
    jpg->jpeg alias, accept jpeg/png/svg only, data-URL prefix stripped,
    raw svg kept utf8, other raw content base64-encoded; missing -> warn."""
    import base64 as b64mod
    imagetype = name.rsplit(".", 1)[-1] if "." in name else ""
    short = name.rsplit("/", 1)[-1]
    if imagetype == "jpg":
        imagetype = "jpeg"
    if imagetype not in _IMG_ACCEPT:
        errors.append(f"unsupported image type {imagetype}")
        return None
    content = images.get(short)
    if content is None:
        errors.append(f"cannot find imagefile {name}")
        return None
    m = _DATA_URL_RE.match(content)
    if m:
        return imagetype, content[m.end():]
    if imagetype == "svg":
        return imagetype, content  # raw svg stays utf8 (img.js:25-27)
    return imagetype, b64mod.b64encode(content.encode("utf-8")).decode("ascii")


def parse_accelon3(content: str,
                   footnotes: dict[str, str] | None = None,
                   svgs: dict[str, str] | None = None,
                   images: dict[str, str] | None = None,
                   toc_root: str | None = None) -> A3Parsed:
    content = content.lstrip("﻿")
    content = re.sub(r"\r\n?", "\n", content).strip()

    st = _State()
    out = A3Parsed()
    out.texts = st.out.texts
    fns = dict(footnotes or {})
    svg_side = dict(svgs or {})
    img_side = dict(images or {})
    noteid: dict[str, int] = {}
    stack: list[tuple[str, int, int, dict]] = []  # (name, kpos, inner_start, open_attrs)

    # schema-driven toc state (tree.js:7-39 prolog + parseaccelon3.js).
    # toc_root (= reference opts.toc): items deeper than the root tag are
    # SUBTREE items emitted at depth-rootdepth; the root tag itself emits
    # at depth 0; shallower tags emit nothing (parseaccelon3.js:25-56).
    treetag: list[str] = []
    knowntag: set[str] = {"檔"}
    tocobj: tuple[str, int, int, int] | None = None  # (tag, depth, kpos, subtree)

    def _resolve_toc(inner: str) -> None:
        tname, tdepth, tkpos, subtree = tocobj
        ttext = re.sub(r"<.+?>", "", inner)
        if toc_root is None:
            out.toc.append((tdepth, ttext, tkpos))
        elif subtree:
            out.toc.append((tdepth - subtree, ttext, tkpos))
        elif tname == toc_root:
            out.toc.append((0, ttext, tkpos))

    def prolog(name: str, attrs: dict[str, str]) -> None:
        nonlocal treetag
        if name in _TOC_IGNORE:
            return
        t, leaf = attrs.get("t"), attrs.get("l")
        tags: list[str] = []
        if t:
            if t.endswith("."):  # stop marker: children end the subtree
                t = t[:-1]
            tags = t.split(",")
            at = treetag.index(name) if name in treetag else -1
            if at > -1:
                treetag = treetag[:at + 1]
            else:
                treetag = [name]
            treetag = treetag + tags
        if leaf:
            tags = tags + leaf.split(",")
        knowntag.update(tags)

    pos = 0
    for m in _TAG_RE.finditer(content):
        if m.start() > pos:
            st.add_text(content[pos:m.start()])
        pos = m.end()
        closing, name, attr_s, selfclose = m.groups()
        attrs = dict(_ATTR_RE.findall(attr_s or ""))
        if name in ("pb", "頁"):
            _handle_pb(st, attrs)
            continue
        if not closing:
            prolog(name, attrs)
            depth = treetag.index(name) if name in treetag else -1
            if depth > -1:
                if tocobj is not None:
                    out.errors.append(f"nested Toc {name}")
                else:
                    # reference parseaccelon3.js:27-29: subtree =
                    # depth > treerootdepth ? treerootdepth : 0. With
                    # opts.toc absent from the path treerootdepth = -1,
                    # so subtree = -1 and items emit at depth+1.
                    if toc_root is None:
                        subtree = 0
                    else:
                        rootdepth = (treetag.index(toc_root)
                                     if toc_root in treetag else -1)
                        subtree = rootdepth if depth > rootdepth else 0
                    tocobj = (name, depth, st.kpos, subtree)
                    if selfclose:
                        # SAX fires onclosetag for self-closing tags too
                        # (parseaccelon3.js onclosetag): resolve the toc
                        # node immediately with empty inner text so it
                        # never dangles into a spurious "nested Toc".
                        _resolve_toc("")
                        tocobj = None
            if name in ("p", "段"):
                out.n_p_fields += 1
            elif name == "a":
                anchor = attrs.get("name") or attrs.get("n")
                if anchor:
                    out.anchors.append((anchor, st.kpos))
            elif name == "svg" and selfclose:
                url = attrs.get("url") or attrs.get("src") or attrs.get("n")
                if url in svg_side:
                    out.svg_fields.append((svg_side[url], st.kpos, st.kpos))
                else:
                    out.errors.append(f"cannot load {url}")
            elif name in ("img", "圖") and selfclose:
                iname = attrs.get("n") or attrs.get("f")
                if iname:
                    r = _resolve_image(iname, img_side, out.errors)
                    if r is not None:
                        out.images.append((r[0], r[1], st.kpos))
            elif name in ("ptr", "註"):
                n = attrs.get("n")
                if n in noteid:
                    out.errors.append(f"note ptr exists {n}")
                elif n:
                    noteid[n] = st.kpos
            elif name in ("fn", "footnote"):
                n = attrs.get("n")
                if n is None or n not in fns:
                    out.errors.append(f"footnote {n} notfound")
                else:
                    out.footnotes_used.append((n, fns.pop(n)))
            elif name == "rubynote":
                t = attrs.get("t")
                if t is None:
                    out.errors.append("rubynote missing attribute t")
                else:
                    out.rubynotes.append((t, st.kpos))
            if not selfclose:
                stack.append((name, st.kpos, m.end(), attrs))
            continue
        if not stack or stack[-1][0] != name:
            out.errors.append(f"mismatched </{name}>")
            continue
        _, kpos_open, inner_start, open_attrs = stack.pop()
        inner = content[inner_start:m.start()]
        if tocobj is not None and name == tocobj[0]:
            # tocobj.text = tag-stripped inner markup at the CLOSE
            # (parseaccelon3.js onclosetag: corpus.substring(...))
            _resolve_toc(inner)
            tocobj = None
        if name == "svg":
            url = open_attrs.get("url") or open_attrs.get("src") \
                or open_attrs.get("n")
            if url in svg_side:
                out.svg_fields.append((svg_side[url], kpos_open, st.kpos))
            else:
                out.errors.append(f"cannot load {url}")
        if name in ("img", "圖"):
            iname = open_attrs.get("n") or open_attrs.get("f")
            if iname:
                r = _resolve_image(iname, img_side, out.errors)
                if r is not None:
                    out.images.append((r[0], r[1], kpos_open))
        if name in ("def", "釋"):
            # n comes from the OPEN tag (reference t.tag.attributes)
            n = open_attrs.get("n")
            if not n:
                out.errors.append("釋 without n")
            elif n not in noteid:
                out.errors.append(f"no such ptr {n}")
            else:
                out.notes.append((n, re.sub(r"<.+?>", "", inner), noteid[n]))
        elif name == "article":
            caption = re.sub(r"<.+?>", "", inner)
            out.articles.append((caption, kpos_open))
    if pos < len(content):
        st.add_text(content[pos:])
    st.emit_line()

    # unconsumed footnotes -> anti-join report (parsepre.js:277-284)
    out.footnotes_unconsumed = sorted(fns)
    for book in out.texts:
        for page in book:
            while len(page) > 1 and page[-1].strip() == "":
                page.pop()
    out.errors.extend(st.out.errors)
    return out
