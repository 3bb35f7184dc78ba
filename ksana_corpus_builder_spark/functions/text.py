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

import numpy as np
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


def _narrowest_buffer(joined: str) -> tuple[np.ndarray, str]:
    """Narrowest numpy code-unit view of a str: ascii -> uint8, BMP-only ->
    uint16 (utf-16-le; astral chars detected by the surrogate-pair byte-length
    mismatch), else uint32 (utf-32-le). In every returned tier the code units
    EQUAL the codepoints, so masks and LUT gathers are dtype-agnostic while
    narrower buffers cut memory-bus traffic 4x/2x — the single-box 32-core
    bottleneck. Raises UnicodeEncodeError on lone surrogates (callers fall
    back to their per-doc/regex path)."""
    if joined.isascii():
        return np.frombuffer(joined.encode("ascii"), np.uint8), "ascii"
    b = joined.encode("utf-16-le")
    if len(b) == 2 * len(joined):  # no astral chars: units == codepoints
        return np.frombuffer(b, np.uint16), "utf-16-le"
    return np.frombuffer(joined.encode("utf-32-le"), np.uint32), "utf-32-le"


def _collapse_ws_regex(s: pd.Series) -> pd.Series:
    """Steps 5-6 of the contract as the original three regex passes + strip.
    Kept as the fallback and the equivalence oracle for the numpy path."""
    s = s.str.replace(_SPACES, " ", regex=True)
    s = s.str.replace(_LINE_EDGE, "\n", regex=True)
    s = s.str.replace(_MULTI_NL, "\n\n", regex=True)
    return s.str.strip()


def _collapse_ws(texts: pd.Series) -> pd.Series:
    """Whitespace collapse (contract steps 5-6), whole-batch numpy.

    The three sequential regex passes ([ \\t\\f\\v]+ -> ' ', ' *\\n *' ->
    '\\n', \\n{3,} -> '\\n\\n') compose, per maximal run of the chars
    {space, tab, FF, VT, LF}, to: a run containing no LF collapses to one
    space; a run containing k LFs collapses to min(k, 2) newlines (every
    space subrun inside or at the edge of such a run borders an LF, so the
    line-edge pass deletes it). Runs never merge across the non-whitespace
    chars separating them, and other Unicode whitespace (NBSP, U+3000, ...)
    is untouched by all three passes — it splits runs exactly like any
    non-matched char, and only the final str.strip() removes it at the
    edges. That makes the passes a pure per-run rewrite, done here as mask
    algebra over one flat UTF-32 buffer (match-per-space regex scanning was
    ~6x the cost of this whole-batch form; equivalence is pinned by
    tests/test_properties.py against _collapse_ws_regex).
    """
    n_rows = len(texts)
    if n_rows == 0:
        return texts
    vals = texts.to_numpy()
    try:
        joined = "".join(vals)
        buf, enc = _narrowest_buffer(joined)
    except UnicodeEncodeError:  # lone surrogates: rare, regex path handles
        return _collapse_ws_regex(texts)
    n = len(buf)
    if n == 0:
        return pd.Series([""] * n_rows, index=texts.index)
    lens = np.fromiter((len(v) for v in vals), np.int64, n_rows)
    offs = np.zeros(n_rows + 1, np.int64)
    np.cumsum(lens, out=offs[1:])

    is_nl = buf == 10
    is_ws = (buf == 32) | (buf == 9) | (buf == 12) | (buf == 11) | is_nl

    # run starts/ends, never crossing row boundaries
    prev_ws = np.empty(n, bool)
    prev_ws[0] = False
    prev_ws[1:] = is_ws[:-1]
    next_ws = np.empty(n, bool)
    next_ws[-1] = False
    next_ws[:-1] = is_ws[1:]
    at_row_start = np.zeros(n, bool)
    at_row_start[offs[:-1][lens > 0]] = True
    at_row_end = np.zeros(n, bool)
    at_row_end[offs[1:][lens > 0] - 1] = True
    start_mask = is_ws & (~prev_ws | at_row_start)
    end_mask = is_ws & (~next_ws | at_row_end)
    starts = np.flatnonzero(start_mask)
    ends = np.flatnonzero(end_mask)  # same count, pairwise inclusive

    # newlines per run via one cumsum (int32 is safe: n < 2^31 per batch)
    nl_cum = np.zeros(n + 1, np.int32)
    np.cumsum(is_nl, out=nl_cum[1:])
    k = nl_cum[ends + 1] - nl_cum[starts]

    out = buf.copy()
    keep = ~is_ws
    keep[starts] = True
    out[starts] = np.where(k == 0, 32, 10)
    two = starts[k >= 2] + 1  # run length >= k >= 2, stays in-run
    keep[two] = True
    out[two] = 10

    keep_cum = np.zeros(n + 1, np.int32)
    np.cumsum(keep, out=keep_cum[1:])
    new_offs = keep_cum[offs]
    flat = out[keep].tobytes().decode(enc)
    res = pd.Series(
        [flat[new_offs[i]:new_offs[i + 1]] for i in range(n_rows)],
        index=texts.index,
    )
    return res.str.strip()


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
    return _collapse_ws(s)


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
    return _collapse_ws(s)
