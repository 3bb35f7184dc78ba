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
    """pd.Series[bytes|str html] -> pd.Series[str text] — byte-identity kernel."""
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
