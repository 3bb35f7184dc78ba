"""Text normalization + HTML->text extraction kernels.

Re-imagines the reference's file-normalize + SAX-parse stages
(``parsexml.js:86-93`` BOM/CRLF normalize; ``parsepre.js:33-185`` markup
parse -> clean text; ``index.js:229-234`` makeLine newline stripping;
``romable.js:131-148`` trailing-blank trim) as vectorized pandas kernels.

The extraction contract is BYTE-IDENTITY per url between the Spark pipeline
and the golden oracle — both call these exact functions.
"""

from __future__ import annotations

import re

import pandas as pd

_BOM = "﻿"
_CRLF = re.compile(r"\r\n?")


def normalize_raw(texts: pd.Series) -> pd.Series:
    """BOM strip + CRLF->LF + trim (reference parsexml.js:86-93)."""
    s = texts.fillna("")
    s = s.str.replace(_BOM, "", regex=False)
    s = s.str.replace(_CRLF, "\n", regex=True)
    return s.str.strip()


# --- HTML -> text ---------------------------------------------------------
# A deterministic, dependency-free extraction kernel. Order matters and is
# part of the byte-identity contract:
#   1. drop <script>/<style>/<!-- --> wholesale,
#   2. block-level close tags emit '\n',
#   3. strip remaining tags (reference tag-strip regex /<.+?>/g,
#      handlers.js:3,92),
#   4. decode the 5 core entities,
#   5. collapse runs of spaces/tabs per line, trim each line,
#   6. drop leading/trailing blank lines (reference makeLine + trailing-blank
#      trim), collapse 3+ newlines to 2.

_SCRIPT_STYLE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.DOTALL | re.IGNORECASE)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_CLOSE = re.compile(
    r"</(p|div|li|ul|ol|h[1-6]|tr|table|blockquote|section|article|header|footer|pre)\s*>"
    r"|<(br|hr)\s*/?>",
    re.IGNORECASE,
)
_ANY_TAG = re.compile(r"<.+?>", re.DOTALL)  # reference handlers.js:3
_SPACES = re.compile(r"[ \t\f\v]+")
_LINE_EDGE = re.compile(r" *\n *")
_MULTI_NL = re.compile(r"\n{3,}")

_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def extract_text(htmls: pd.Series) -> pd.Series:
    """pd.Series[bytes|str html] -> pd.Series[str text] — byte-identity kernel.

    Pass structure is deliberate: fusing the literal entity replaces or the
    whitespace passes into single regexes with callable replacements was
    MEASURED SLOWER (per-match Python callables cost more than extra
    C-level memchr scans) — keep the sequential constant-replacement form.
    """
    s = htmls.map(lambda b: b.decode("utf-8", "replace") if isinstance(b, (bytes, bytearray)) else (b or ""))
    s = normalize_raw(s)
    s = s.str.replace(_SCRIPT_STYLE, "", regex=True)
    s = s.str.replace(_COMMENT, "", regex=True)
    s = s.str.replace(_BLOCK_CLOSE, "\n", regex=True)
    s = s.str.replace(_ANY_TAG, "", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    s = s.str.replace(_SPACES, " ", regex=True)
    s = s.str.replace(_LINE_EDGE, "\n", regex=True)
    s = s.str.replace(_MULTI_NL, "\n\n", regex=True)
    return s.str.strip()


_TAG_STRIP = _ANY_TAG


def strip_tags(texts: pd.Series) -> pd.Series:
    """Bare tag strip (reference handlers.js:92 sic/orig cleanup)."""
    return texts.fillna("").str.replace(_TAG_STRIP, "", regex=True)


# --- configurable handler registry (reference setHandlers, U1/U4) ---------
# The reference lets callers override per-tag open/close handlers
# (index.js:94-103, merge semantics parsexml.js:12-16). Here the registry
# is DATA consumed by the kernel, not code: tag -> action, where
#   "break"  emit a newline at the closing tag (block-level default),
#   "drop"   remove the element INCLUDING its content (script/style-like),
#   "strip"  remove the tags, keep the content (inline default).
# DEFAULT_TAG_RULES reproduces extract_text exactly (asserted in tests).

DEFAULT_TAG_RULES: dict[str, str] = dict(
    {t: "break" for t in ("p", "div", "li", "ul", "ol", "tr", "table",
                          "blockquote", "section", "article", "header",
                          "footer", "pre", "br", "hr",
                          "h1", "h2", "h3", "h4", "h5", "h6")},
    script="drop", style="drop",
)


def compile_rules(rules: dict[str, str]):
    """rules -> (drop_re, break_re) regex pair for the kernel."""
    drop = [t for t, a in rules.items() if a == "drop"]
    brk = [t for t, a in rules.items() if a == "break"]
    drop_re = (re.compile(r"<(%s)\b.*?</\1\s*>" % "|".join(drop),
                          re.DOTALL | re.IGNORECASE) if drop else None)
    # void elements (br, hr) break at the OPEN tag; others at the close tag
    voids = [t for t in brk if t in ("br", "hr")]
    closers = [t for t in brk if t not in ("br", "hr")]
    parts = []
    if closers:
        parts.append(r"</(?:%s)\s*>" % "|".join(closers))
    if voids:
        parts.append(r"<(?:%s)\s*/?>" % "|".join(voids))
    brk_re = re.compile("|".join(parts), re.IGNORECASE) if parts else None
    return drop_re, brk_re


def extract_text_with_rules(htmls: pd.Series,
                            rules: dict[str, str] | None = None) -> pd.Series:
    """extract_text with a caller-supplied tag-rule registry. With
    rules=None (or DEFAULT_TAG_RULES) the output is byte-identical to
    extract_text (regression-tested)."""
    drop_re, brk_re = compile_rules(rules or DEFAULT_TAG_RULES)
    s = htmls.map(lambda b: b.decode("utf-8", "replace")
                  if isinstance(b, (bytes, bytearray)) else (b or ""))
    s = normalize_raw(s)
    if drop_re is not None:
        s = s.str.replace(drop_re, "", regex=True)
    s = s.str.replace(_COMMENT, "", regex=True)
    if brk_re is not None:
        s = s.str.replace(brk_re, "\n", regex=True)
    s = s.str.replace(_ANY_TAG, "", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    s = s.str.replace(_SPACES, " ", regex=True)
    s = s.str.replace(_LINE_EDGE, "\n", regex=True)
    s = s.str.replace(_MULTI_NL, "\n\n", regex=True)
    return s.str.strip()
