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
- The schema-driven toc tree (accelon3handler/tree.js) is NOT ported
  this round — documented divergence; the positional/note machinery
  above is the part the Spark pipeline re-expresses as joins.
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
    n_p_fields: int = 0
    errors: list[str] = field(default_factory=list)


def parse_accelon3(content: str,
                   footnotes: dict[str, str] | None = None) -> A3Parsed:
    content = content.lstrip("﻿")
    content = re.sub(r"\r\n?", "\n", content).strip()

    st = _State()
    out = A3Parsed()
    out.texts = st.out.texts
    fns = dict(footnotes or {})
    noteid: dict[str, int] = {}
    stack: list[tuple[str, int, int, dict]] = []  # (name, kpos, inner_start, open_attrs)

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
            if name in ("p", "段"):
                out.n_p_fields += 1
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
