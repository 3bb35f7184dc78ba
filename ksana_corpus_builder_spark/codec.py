"""kpos — packed positional address codec.

The reference packs ``[book, page, line, character]`` into one integer via a
per-corpus *address pattern* (bits per component, optional sub-page column)
and unpacks arithmetically with powers of two (reference ``inverted.js:11-14``,
pattern built in ``index.js:45-48``). Ranges of positions are first-class
(``index.js:212-215``); the human form looks like ``"1p3.0102-04"``
(reference ``test-parsepre.js:13-14``): book 1, page 3, line 01, chars 02-04.

We keep the address packed in an int64 column (``BIGINT``) because range
predicates, ordering and delta encoding stay cheap at rest; this module is
the single codec used by Python kernels, Spark Column expressions, and the
DuckDB oracle (pure integer arithmetic — identical everywhere).

For the web-scale target, ``(url, byte_offset)`` plays the kpos role; the
codec is still used for the reference-shaped positional operators
(annotations, postings, range joins).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

# default bits per [book, page, line, char]; 12+16+10+10 = 48 bits < int64
DEFAULT_BITS = (12, 16, 10, 10)


@dataclass(frozen=True)
class AddressPattern:
    """Bits per component, mirroring the reference's buildAddressPattern
    (``index.js:45-48`` Ksanapos.buildAddressPattern(opts.bits,
    opts.column)).

    ``column``: sub-page columns per page (htll's a-d letters => 4; 0 =
    no column addressing). The reference folds the column INTO the page
    component before packing: ``pagenumber = page*column +
    (parseInt(col,36)-10)`` (``htll/handlers.js:51-55``), so the packed
    layout is unchanged — the pattern only governs fold/unfold and the
    display form (page number + column letter)."""

    bits: tuple[int, int, int, int] = DEFAULT_BITS
    column: int = 0

    def fold_page(self, page: int, col: int) -> int:
        """(display page 0-based, column index) -> packed page component."""
        if not self.column:
            return page
        assert 0 <= col < self.column, f"column out of range: {col}"
        return page * self.column + col

    def unfold_page(self, packed_page: int) -> tuple[int, int]:
        """packed page component -> (display page 0-based, column index)."""
        if not self.column:
            return packed_page, 0
        return packed_page // self.column, packed_page % self.column

    @property
    def charbits(self) -> int:
        return self.bits[3]

    @property
    def linebits(self) -> int:
        return self.bits[2]

    @property
    def pagebits(self) -> int:
        return self.bits[1]

    @property
    def maxchar(self) -> int:
        return (1 << self.charbits) - 1

    # multipliers (powers of two) — the same arithmetic the reference uses
    @property
    def char_mod(self) -> int:
        return 1 << self.charbits

    @property
    def line_mod(self) -> int:
        return 1 << (self.charbits + self.linebits)

    @property
    def page_mod(self) -> int:
        # reference calls this rangebits: everything below the book component
        return 1 << (self.charbits + self.linebits + self.pagebits)


DEFAULT_PATTERN = AddressPattern()


def pack(book: int, page: int, line: int, ch: int, pat: AddressPattern = DEFAULT_PATTERN) -> int:
    """[book,page,line,ch] -> int64. Book starts at 1 (reference index.js:47-48)."""
    assert 0 < book < (1 << pat.bits[0]), f"book out of range: {book}"
    assert 0 <= page < (1 << pat.pagebits), f"page out of range: {page}"
    assert 0 <= line < (1 << pat.linebits), f"line out of range: {line}"
    assert 0 <= ch <= pat.maxchar, f"char out of range: {ch}"
    return ((book * (1 << pat.pagebits) + page) * (1 << pat.linebits) + line) * pat.char_mod + ch


def unpack(kpos: int, pat: AddressPattern = DEFAULT_PATTERN) -> tuple[int, int, int, int]:
    ch = kpos % pat.char_mod
    line = (kpos // pat.char_mod) % (1 << pat.linebits)
    page = (kpos // pat.line_mod) % (1 << pat.pagebits)
    book = kpos // pat.page_mod
    return book, page, line, ch


def book_of(kpos: int, pat: AddressPattern = DEFAULT_PATTERN) -> int:
    return kpos // pat.page_mod


def book_start_pos(kpos: int, pat: AddressPattern = DEFAULT_PATTERN) -> int:
    """Snap to the first position of the book (reference Ksanapos.bookStartPos)."""
    return book_of(kpos, pat) * pat.page_mod


def next_line_start(kpos: int, pat: AddressPattern = DEFAULT_PATTERN) -> int:
    """kpos of (line+1, ch 0) — reference index.js nextLineStart."""
    book, page, line, _ = unpack(kpos, pat)
    return pack(book, page, line + 1, 0, pat)


def stringify(kpos: int, pat: AddressPattern = DEFAULT_PATTERN) -> str:
    """Human form ``{book}p{page+1}.{line+1:02d}{ch:02d}``.

    Convention derived from reference source, not guessed: pb stores page
    0-based (``format.js:19`` makeKPos(book, page-1, 0, 0)), newLine stores
    line 0-based (``parsepre.js:53`` _pbline+1 after line 0), the rend
    range is makeRange(kpos_at_open, kPos_at_close) with ch counting
    concrete TOKENS (``index.js:177-186``), and the golden assert
    ``"1p3.0102-04"`` (test-parsepre.js:13-14) for the <kai> on page 3
    (stored 2), line 1 (stored 0), token-chars [2,4) therefore fixes the
    display as: book raw, page+1, line+1, ch raw, range end EXCLUSIVE."""
    book, page, line, ch = unpack(kpos, pat)
    if pat.column:
        # column-addressed corpora display page as number + letter (the
        # htll pb form `3a`): unfold the packed page, letter a..=chr(97+col)
        pg, col = pat.unfold_page(page)
        return f"{book}p{pg + 1}{chr(97 + col)}.{line + 1:02d}{ch:02d}"
    return f"{book}p{page + 1}.{line + 1:02d}{ch:02d}"


def stringify_range(start: int, end: int, pat: AddressPattern = DEFAULT_PATTERN) -> str:
    """``"1p3.0102-04"`` — end exclusive; shared book/page/line prefix
    elided on the end side."""
    sb, sp, sl, _sc = unpack(start, pat)
    eb, ep, el, ec = unpack(end, pat)
    s = stringify(start, pat)
    if (sb, sp, sl) == (eb, ep, el):
        return f"{s}-{ec:02d}"
    if (sb, sp) == (eb, ep):
        return f"{s}-{el + 1:02d}{ec:02d}"
    return f"{s}-{stringify(end, pat)}"


def parse(s: str, pat: AddressPattern = DEFAULT_PATTERN) -> int:
    """Inverse of :func:`stringify` (position part only, no range).
    Column-addressed patterns accept a trailing a-z letter on the page
    (int(col,36)-10, htll/handlers.js:54)."""
    bookpage, linech = s.split(".")
    book_s, page_s = bookpage.split("p")
    line, ch = int(linech[:2]) - 1, int(linech[2:4])
    if pat.column:
        col = 0
        if page_s and page_s[-1].isalpha():
            col = int(page_s[-1], 36) - 10
            page_s = page_s[:-1]
        return pack(int(book_s), pat.fold_page(int(page_s) - 1, col),
                    line, ch, pat)
    return pack(int(book_s), int(page_s) - 1, line, ch, pat)


def parse_range(s: str, pat: AddressPattern = DEFAULT_PATTERN) -> tuple[int, int]:
    if "-" not in s:
        k = parse(s, pat)
        return k, k
    head, tail = s.split("-")
    start = parse(head, pat)
    b, p, ln, _ = unpack(start, pat)
    if "." in tail:
        return start, parse(tail, pat)
    if len(tail) == 2:
        return start, pack(b, p, ln, int(tail), pat)
    return start, pack(b, p, int(tail[:2]) - 1, int(tail[2:4]), pat)


# ---------------------------------------------------------------- Spark side


def pack_col(book: Column, page: Column, line: Column, ch: Column,
             pat: AddressPattern = DEFAULT_PATTERN) -> Column:
    """Column-expression pack — pure int64 arithmetic, whole-stage-codegen'd."""
    return (
        ((book.cast("long") * (1 << pat.pagebits) + page.cast("long"))
         * (1 << pat.linebits) + line.cast("long")) * pat.char_mod + ch.cast("long")
    )


def unpack_cols(kpos: Column, pat: AddressPattern = DEFAULT_PATTERN) -> dict[str, Column]:
    k = kpos.cast("long")
    return {
        "book": (k / pat.page_mod).cast("long"),
        "page": (k / pat.line_mod).cast("long") % (1 << pat.pagebits),
        "line": (k / pat.char_mod).cast("long") % (1 << pat.linebits),
        "ch": k % pat.char_mod,
    }


def book_start_col(kpos: Column, pat: AddressPattern = DEFAULT_PATTERN) -> Column:
    return (kpos.cast("long") / pat.page_mod).cast("long") * F.lit(pat.page_mod)


def oracle_unpack_sql(kpos_expr: str, pat: AddressPattern = DEFAULT_PATTERN) -> dict[str, str]:
    """DuckDB-SQL fragments computing the same unpack — for oracle twins."""
    return {
        "book": f"CAST(FLOOR(({kpos_expr}) / {pat.page_mod}) AS BIGINT)",
        "page": f"(CAST(FLOOR(({kpos_expr}) / {pat.line_mod}) AS BIGINT) % {1 << pat.pagebits})",
        "line": f"(CAST(FLOOR(({kpos_expr}) / {pat.char_mod}) AS BIGINT) % {1 << pat.linebits})",
        "ch": f"(({kpos_expr}) % {pat.char_mod})",
    }
