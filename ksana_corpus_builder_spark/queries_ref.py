"""Reference-completion queries — round-2 closure of the remaining §2 gaps.

Each query here drives a piece of reference machinery the round-1 surface
only partially covered, as an oracle-checked (spark_fn, duckdb_sql) pair:

- reverse_links_resolved (J5 complete): parse ``corpus@addr`` link strings
  (reverselink.js:2-16), pack the address to kpos, resolve against the
  target corpus' article starts (findArticle, romable.js:43-59) and group
  link sources per target article (putGlobalField set semantics,
  reverselink.js:45-58 + index.js:170-175).
- standoff_kfields: external JSON annotation rows -> parseRange ->
  findArticle -> key-sorted kfields per line (externalmarkup.js:11-44
  importExternalMarkup + importKFields sort-by-key :54,89) — end-to-end
  against a corpus parsed by the REAL pre-format parser.
- a3_toc: the schema-driven toc tree (accelon3handler/tree.js:7-39 prolog,
  tree.js:2 encodeTreeItem depth\\ttext\\tkpos36) + anchor global fields
  (accelon3handler/anchor.js:1-9), through the real accelon3 parser.
- kpos_roundtrip_col: sub-page column addressing (htll/handlers.js:51-55
  page*column + parseInt(col,36)-10; Ksanapos.buildAddressPattern(bits,
  column), index.js:45-48) packed/unpacked/stringified/re-parsed.

Oracle strategy (the media_meta pattern): the synthetic inputs are
arithmetic in the table keys, so DuckDB recomputes the EXPECTED output in
closed form while the Spark path must reproduce it through the real
machinery (string formatting -> regex parse -> kpos pack -> range resolve
-> group), proving the whole chain.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import codec
from .sources.tables import load

# ---------------------------------------------------------- J5: reverse links

# target-corpus article table: one article per (book 1..7, page 0..4),
# article start = pack(book, page, 0, 0), id = book*100 + page. Static
# arithmetic, so the broadcast starts list needs no collect.
_RL_ARTICLES = [(b, p) for b in range(1, 8) for p in range(5)]
_RL_STARTS = [codec.pack(b, p, 0, 0) for b, p in _RL_ARTICLES]
_RL_LABELS = [str(b * 100 + p) for b, p in _RL_ARTICLES]

_ADDR_RE = r"^(\d+)p(\d+)\.(\d{2})(\d{2})$"


def _addr_to_kpos(addr):
    """Parse the display form '{book}p{page}.{line:02d}{ch:02d}' back to a
    packed kpos Column (display page/line are 1-based — codec.parse)."""
    b = F.regexp_extract(addr, _ADDR_RE, 1).cast("long")
    p = F.regexp_extract(addr, _ADDR_RE, 2).cast("long") - 1
    ln = F.regexp_extract(addr, _ADDR_RE, 3).cast("long") - 1
    ch = F.regexp_extract(addr, _ADDR_RE, 4).cast("long")
    return codec.pack_col(b, p, ln, ch)


def q_reverse_links_resolved(spark: SparkSession, sf: str) -> DataFrame:
    """Each document emits TWO link strings; doc_id%11==0 docs omit the
    corpus prefix on the first (same-corpus link -> targetcorpus falls back
    to self, reverselink.js:4-9). The Spark path must regex-split the
    ``corpus@addr`` form, pack the address, binary-search the article
    containing it, and aggregate the distinct sorted source set per
    (target_corpus, article)."""
    from .operators.rangejoin import asof_join_broadcast
    d = load(spark, sf, "documents").select("doc_id")
    i = F.col("doc_id")
    addr1 = F.format_string("%dp%d.%02d%02d", i % 7 + 1, i % 5 + 1,
                            i % 9 + 1, i % 50)
    addr2 = F.format_string("%dp%d.%02d%02d", i % 7 + 1, (i / 5).cast("long") % 5 + 1,
                            (i / 9).cast("long") % 9 + 1, (i * 3) % 50)
    to1 = F.when(i % 11 == 0, addr1).otherwise(F.concat(F.lit("corpusB@"), addr1))
    to2 = F.concat(F.lit("corpusB@"), addr2)
    links = d.select("doc_id", F.explode(F.array(to1, to2)).alias("to"))
    has_corpus = F.col("to").contains("@")
    parsed = links.select(
        "doc_id",
        F.when(has_corpus, F.regexp_extract("to", r"^(.+)@(.+)$", 1))
        .otherwise(F.lit("self")).alias("target_corpus"),
        F.when(has_corpus, F.regexp_extract("to", r"^(.+)@(.+)$", 2))
        .otherwise(F.col("to")).alias("addr"))
    with_kpos = parsed.select("doc_id", "target_corpus",
                              _addr_to_kpos(F.col("addr")).alias("kpos"))
    resolved = asof_join_broadcast(with_kpos, _RL_STARTS, _RL_LABELS,
                                   fact_key="kpos", out_col="article_s")
    return (resolved
            .groupBy("target_corpus",
                     F.col("article_s").cast("long").alias("article_id"))
            .agg(F.count("*").alias("n_links"),
                 F.countDistinct("doc_id").alias("n_sources"),
                 F.concat_ws(",", F.array_sort(F.collect_set("doc_id"))
                             .cast("array<string>")).alias("sources_str"),
                 F.min("kpos").alias("min_kpos"),
                 F.max("kpos").alias("max_kpos")))


_SQL_REVERSE_LINKS_RESOLVED = """
WITH l AS (
  SELECT doc_id,
    CASE WHEN doc_id % 11 = 0 THEN 'self' ELSE 'corpusB' END AS target_corpus,
    (doc_id % 7 + 1)::BIGINT AS b, (doc_id % 5)::BIGINT AS p,
    (doc_id % 9)::BIGINT AS ln, (doc_id % 50)::BIGINT AS ch
  FROM documents
  UNION ALL
  SELECT doc_id, 'corpusB',
    (doc_id % 7 + 1)::BIGINT, ((doc_id // 5) % 5)::BIGINT,
    ((doc_id // 9) % 9)::BIGINT, ((doc_id * 3) % 50)::BIGINT
  FROM documents),
r AS (
  SELECT doc_id, target_corpus, (b * 100 + p)::BIGINT AS article_id,
         (((b * 65536 + p) * 1024 + ln) * 1024 + ch)::BIGINT AS kpos
  FROM l),
stats AS (
  SELECT target_corpus, article_id, count(*)::BIGINT AS n_links,
         count(DISTINCT doc_id)::BIGINT AS n_sources,
         min(kpos)::BIGINT AS min_kpos, max(kpos)::BIGINT AS max_kpos
  FROM r GROUP BY 1, 2),
srcs AS (
  SELECT target_corpus, article_id,
         string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS sources_str
  FROM (SELECT DISTINCT target_corpus, article_id, doc_id FROM r)
  GROUP BY 1, 2)
SELECT stats.target_corpus, stats.article_id, n_links, n_sources,
       sources_str, min_kpos, max_kpos
FROM stats JOIN srcs USING (target_corpus, article_id)
"""

# ------------------------------------------- stand-off external markup

_PREPARSE_LINES_SCHEMA = "doc_id long, line long, text_line string"


def _parsed_lines(spark: SparkSession, sf: str) -> DataFrame:
    """documents -> (doc_id, line, text_line) through the pre-format line
    semantics (same kernel as q_preparse_lines): vectorized batch algebra
    with a real-parse_pre fallback, equivalence pinned by
    tests/test_linebatch.py."""
    from .functions.linebatch import pre_lines_batch
    d = load(spark, sf, "documents").select("doc_id", "text")

    def run(batches):
        for pdf in batches:
            yield pre_lines_batch(pdf["doc_id"], pdf["text"])

    return d.mapInPandas(run, schema=_PREPARSE_LINES_SCHEMA)


def q_standoff_kfields(spark: SparkSession, sf: str) -> DataFrame:
    """External JSON annotations resolved against a PARSED corpus:

    1. corpus = documents parsed by the pre-format parser -> line table;
    2. two stand-off JSON rows per doc, each carrying a display address
       '1p1.LLCC' targeting line (doc_id+j) % min(n_lines, 99) at token
       position j+1 (importExternalMarkup parses, then FLOORS into the
       containing unit);
    3. ingestion: get_json_object -> regex parse addr -> kpos pack ->
       floor to line start (unpack line component) -> join to the parsed
       line -> kfields SORTED BY KEY per line (importKFields
       externalmarkup.js:54,89).

    Output: (doc_id, line, kfields_str, n_ann, line_len) where line_len
    proves the join hit the REAL parsed text.
    """
    # the parsed line table feeds BOTH the annotation generator and the
    # resolution join; persist so the Python parse kernel runs once per
    # invocation (identical logical plan across invocations -> one cache
    # entry, bounded at the line-table size)
    lines = _parsed_lines(spark, sf).persist()
    n_eff = F.least(F.count("*"), F.lit(99))
    nl = lines.groupBy("doc_id").agg(n_eff.alias("n_eff"))
    j = F.explode(F.array(F.lit(0), F.lit(1))).alias("j")
    ann_src = nl.select("doc_id", "n_eff", j)
    target_line = (F.col("doc_id") + F.col("j")) % F.col("n_eff")
    addr = F.format_string("1p1.%02d%02d", target_line + 1, F.col("j") + 1)
    json_str = F.format_string(
        '{"addr":"%s","key":"k%d","value":"v%d"}',
        addr, (F.col("doc_id") + F.col("j")) % 4, F.col("j"))
    # external rows: (doc_id, json) — everything downstream re-derives
    # from the JSON string, as an external side-file would arrive
    ann = ann_src.select("doc_id", json_str.alias("json"))
    kpos = _addr_to_kpos(F.get_json_object("json", "$.addr"))
    parsed = ann.select(
        "doc_id",
        F.get_json_object("json", "$.key").alias("key"),
        F.get_json_object("json", "$.value").alias("value"),
        kpos.alias("kpos"))
    # floor to the containing line (findArticle analogue at line grain):
    # line index = the line component of the packed address
    pat = codec.DEFAULT_PATTERN
    line_of = (F.col("kpos") / pat.char_mod).cast("long") % (1 << pat.linebits)
    resolved = (parsed.withColumn("line", line_of)
                .join(lines, ["doc_id", "line"]))
    return (resolved.groupBy("doc_id", "line")
            .agg(F.concat_ws(",", F.sort_array(
                     F.collect_list(F.concat_ws(":", "key", "value"))))
                 .alias("kfields_str"),
                 F.count("*").alias("n_ann"),
                 F.min(F.length("text_line")).alias("line_len")))


def q_standoff_afields(spark: SparkSession, sf: str) -> DataFrame:
    """The importAFields/importFields shape (externalmarkup.js:20-60,
    90-120): the same stand-off annotations resolved to their ARTICLE
    (document), then pivoted to parallel pos[]/value[] arrays SORTED BY
    KPOS (the struct-of-arrays finalize, romable.js:221-265) — emitted
    string-joined for cross-engine hashing. Complements standoff_kfields,
    which sorts by KEY at line grain."""
    lines = _parsed_lines(spark, sf).persist()
    n_eff = F.least(F.count("*"), F.lit(99))
    nl = lines.groupBy("doc_id").agg(n_eff.alias("n_eff"))
    j = F.explode(F.array(F.lit(0), F.lit(1))).alias("j")
    ann_src = nl.select("doc_id", "n_eff", j)
    target_line = (F.col("doc_id") + F.col("j")) % F.col("n_eff")
    addr = F.format_string("1p1.%02d%02d", target_line + 1, F.col("j") + 1)
    json_str = F.format_string(
        '{"addr":"%s","key":"k%d","value":"v%d"}',
        addr, (F.col("doc_id") + F.col("j")) % 4, F.col("j"))
    ann = ann_src.select("doc_id", json_str.alias("json"))
    kpos = _addr_to_kpos(F.get_json_object("json", "$.addr"))
    parsed = ann.select(
        "doc_id", F.get_json_object("json", "$.value").alias("value"),
        kpos.alias("kpos"))
    # pivot: kpos-sorted parallel arrays per article (sort_array on the
    # (kpos, value) struct sorts by kpos first — the romable finalize)
    pv = F.sort_array(F.collect_list(F.struct("kpos", "value")))
    return (parsed.groupBy("doc_id")
            .agg(F.count("*").alias("n_ann"),
                 F.concat_ws(",", F.transform(pv, lambda s: s["kpos"])
                             .cast("array<string>")).alias("pos_str"),
                 F.concat_ws(",", F.transform(pv, lambda s: s["value"]))
                 .alias("value_str")))


_SQL_STANDOFF_AFIELDS = """
WITH t AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
ix AS (SELECT doc_id, ls,
         list_filter(range(1, len(ls) + 1), i -> ls[i] <> '') AS ne
       FROM t),
b AS (SELECT doc_id, ls, list_min(ne) AS f, list_max(ne) AS l
      FROM ix WHERE len(ne) > 0),
lines AS (
  SELECT doc_id, (i - f)::BIGINT AS line
  FROM b, unnest(range(f, l + 1)) AS u(i)),
nl AS (SELECT doc_id, least(count(*), 99)::BIGINT AS n_eff
       FROM lines GROUP BY doc_id),
ann AS (
  SELECT doc_id,
         ((1 * 65536 + 0) * 1024 + (doc_id + j) % n_eff) * 1024 + j + 1
           AS kpos,
         'v' || j AS value
  FROM nl, unnest([0, 1]) AS u(j))
SELECT doc_id, count(*)::BIGINT AS n_ann,
       string_agg(kpos::VARCHAR, ',' ORDER BY kpos) AS pos_str,
       string_agg(value, ',' ORDER BY kpos) AS value_str
FROM ann GROUP BY doc_id
"""


# line algebra identical to _SQL_PREPARSE_LINES (queries_ext.py)
_SQL_STANDOFF_KFIELDS = """
WITH t AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
ix AS (SELECT doc_id, ls,
         list_filter(range(1, len(ls) + 1), i -> ls[i] <> '') AS ne
       FROM t),
b AS (SELECT doc_id, ls, list_min(ne) AS f, list_max(ne) AS l
      FROM ix WHERE len(ne) > 0),
lines AS (
  SELECT doc_id, (i - f)::BIGINT AS line,
         CASE WHEN ls[i] = '' THEN ' ' ELSE ls[i] END AS text_line
  FROM b, unnest(range(f, l + 1)) AS u(i)),
nl AS (SELECT doc_id, least(count(*), 99)::BIGINT AS n_eff
       FROM lines GROUP BY doc_id),
ann AS (
  SELECT doc_id, ((doc_id + j) % n_eff)::BIGINT AS line,
         'k' || ((doc_id + j) % 4) AS key, 'v' || j AS value
  FROM nl, unnest([0, 1]) AS u(j)),
r AS (SELECT ann.doc_id, ann.line, key, value, length(text_line) AS ll
      FROM ann JOIN lines ON lines.doc_id = ann.doc_id
                         AND lines.line = ann.line)
SELECT doc_id, line,
       string_agg(key || ':' || value, ',' ORDER BY key || ':' || value)
         AS kfields_str,
       count(*)::BIGINT AS n_ann,
       min(ll)::BIGINT AS line_len
FROM r GROUP BY doc_id, line
"""

# --------------------------------------------------- a3 schema toc tree

_A3_TMPL = (
    '<頁 n="1"/>\n'
    '<卷 t="品">T{a}</卷>\n'
    'alpha beta\n'
    '<品>S{b}</品>\n'
    'gamma d\n'
    '<a n="anc{c}"/>tail words\n'
    '<卷>T2x{a}</卷>\n'
    '<品>S2y{b}</品>'
)


def q_a3_toc(spark: SparkSession, sf: str) -> DataFrame:
    """Synthesized accelon3 corpora (one per document, texts derived from
    doc_id) through the REAL a3 parser: the 卷 tag's t="品" establishes the
    tree path, the second 卷 re-roots it (tree.js truncate-or-reset), the
    anchor emits a global field. Output: one row per toc/anchor node with
    the encodeTreeItem base-36 kpos. The oracle recomputes every row in
    closed form (fixed template -> fixed line positions). The template has
    only 97*13*5 distinct instantiations, so the REAL parser runs once per
    distinct content (parse_a3_cached dedupe-then-parse); repeats are
    dictionary hits."""
    import pandas as pd

    from .functions.linebatch import parse_a3_cached
    # the per-distinct-content parse is CPU-bound and embarrassingly
    # parallel, but a small corpus arrives as one parquet split — spread
    # it across all cores before the parse (tiny rows, negligible shuffle)
    d = (load(spark, sf, "documents").select("doc_id")
         .repartition(spark.sparkContext.defaultParallelism))

    def run(batches):
        for pdf in batches:
            ids, kinds, depths, texts, kposs = [], [], [], [], []
            for doc_id in pdf["doc_id"]:
                content = _A3_TMPL.format(a=doc_id % 97, b=doc_id % 13,
                                          c=doc_id % 5)
                p = parse_a3_cached(content)
                for depth, text, kpos in p.toc:
                    ids.append(doc_id)
                    kinds.append("toc")
                    depths.append(depth)
                    texts.append(text)
                    kposs.append(kpos)
                for name, kpos in p.anchors:
                    ids.append(doc_id)
                    kinds.append("anchor")
                    depths.append(-1)
                    texts.append(name)
                    kposs.append(kpos)
            yield pd.DataFrame({"doc_id": ids, "kind": kinds,
                                "depth": depths, "text": texts,
                                "kpos": kposs})

    rows = d.mapInPandas(
        run, schema="doc_id long, kind string, depth long, text string, kpos long")
    # lowercase: the reference encodeTreeItem (JS toString(36)) and this
    # repo's encode_tree_item both emit lowercase base-36; Spark conv /
    # DuckDB to_base are uppercase, so fold case on BOTH engines.
    return rows.select("doc_id", "kind", "depth", "text", "kpos",
                       F.lower(F.conv(F.col("kpos").cast("string"), 10, 36))
                       .alias("kpos36"))


def _a3_toc_sql() -> str:
    base = codec.pack(1, 0, 0, 0)
    lk = codec.DEFAULT_PATTERN.char_mod  # one line = char_mod kpos steps
    rows = [
        ("toc", 0, "'T' || (doc_id % 97)", base + 0 * lk),
        ("toc", 1, "'S' || (doc_id % 13)", base + 2 * lk),
        ("anchor", -1, "'anc' || (doc_id % 5)", base + 4 * lk),
        ("toc", 0, "'T2x' || (doc_id % 97)", base + 5 * lk),
        ("toc", 1, "'S2y' || (doc_id % 13)", base + 6 * lk),
    ]
    selects = [
        f"SELECT doc_id, '{kind}' AS kind, {depth}::BIGINT AS depth, "
        f"{text} AS text, {kpos}::BIGINT AS kpos, "
        f"lcase(to_base({kpos}, 36)) AS kpos36 FROM documents"
        for kind, depth, text, kpos in rows
    ]
    return "\nUNION ALL\n".join(selects)


# ------------------------------------------- sub-page column addressing

_COL_PATTERN = codec.AddressPattern(column=4)  # htll a-d


def q_kpos_roundtrip_col(spark: SparkSession, sf: str) -> DataFrame:
    """Column-addressed kpos round-trip (C11 + htll/handlers.js:51-55):
    pack a (book, page, column, line, ch) address by folding the column
    into the page component, unpack it back, render the display form
    '{book}p{page}{letter}.{line}{ch}' and RE-PARSE the display form to
    prove the inverse — all as Column arithmetic + regex (codegen)."""
    pat = _COL_PATTERN
    l = load(spark, sf, "lineitem")
    book = F.col("l_orderkey") % 50 + 1
    page = F.col("l_linenumber") % 8          # display page, 0-based
    colx = F.col("l_suppkey") % 4
    line = F.col("l_partkey") % 90
    ch = F.col("l_suppkey") % 30
    packed_page = page * pat.column + colx    # handlers.js:51-55 fold
    kpos = codec.pack_col(book, packed_page, line, ch, pat)
    d = l.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                 kpos.alias("kpos"))
    u = codec.unpack_cols(F.col("kpos"), pat)
    pg_disp = (u["page"] / pat.column).cast("long")
    col_idx = u["page"] % pat.column
    letter = F.element_at(F.lit(["a", "b", "c", "d"]),
                          (col_idx + 1).cast("int"))
    addr = F.format_string("%dp%d%s.%02d%02d", u["book"], pg_disp + 1,
                           letter, u["line"] + 1, u["ch"])
    d = d.select("l_orderkey", "l_linenumber", "kpos",
                 u["book"].alias("book"), pg_disp.alias("page"),
                 col_idx.alias("col"), u["line"].alias("line"),
                 u["ch"].alias("ch"), addr.alias("addr"))
    # re-parse the display form back to kpos (the codec.parse inverse)
    col_re = r"^(\d+)p(\d+)([a-d])\.(\d{2})(\d{2})$"
    rb = F.regexp_extract("addr", col_re, 1).cast("long")
    rp = F.regexp_extract("addr", col_re, 2).cast("long") - 1
    rc = (F.ascii(F.regexp_extract("addr", col_re, 3)) - 97).cast("long")
    rl = F.regexp_extract("addr", col_re, 4).cast("long") - 1
    rch = F.regexp_extract("addr", col_re, 5).cast("long")
    kpos_back = codec.pack_col(rb, rp * pat.column + rc, rl, rch, pat)
    return d.withColumn("kpos_back", kpos_back)


def _kpos_col_sql() -> str:
    pat = _COL_PATTERN
    pack = (f"((((l_orderkey % 50 + 1) * {1 << pat.pagebits}"
            f" + ((l_linenumber % 8) * {pat.column} + l_suppkey % 4))"
            f" * {1 << pat.linebits} + l_partkey % 90) * {pat.char_mod}"
            f" + l_suppkey % 30)")
    u = codec.oracle_unpack_sql("kpos", pat)
    return f"""
WITH k AS (SELECT l_orderkey, l_linenumber, {pack}::BIGINT AS kpos
           FROM lineitem),
d AS (SELECT l_orderkey, l_linenumber, kpos,
        {u['book']} AS book,
        ({u['page']} // {pat.column})::BIGINT AS page,
        ({u['page']} % {pat.column})::BIGINT AS col,
        {u['line']} AS line, {u['ch']} AS ch
      FROM k)
SELECT l_orderkey, l_linenumber, kpos, book, page, col, line, ch,
  book || 'p' || (page + 1) || chr((97 + col)::INT) || '.'
    || printf('%02d', line + 1) || printf('%02d', ch) AS addr,
  kpos::BIGINT AS kpos_back
FROM d
"""


# ------------------------------------- streaming: sliding windows


def q_stream_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window counts computed BY THE STREAMING ENGINE (2h window,
    1h slide — each event in exactly two windows); must equal the batch
    two-offset replication SQL."""
    from .streaming.windowed import stream_sliding_query
    return stream_sliding_query(spark, sf)


def _stream_sliding_sql() -> str:
    from .streaming.windowed import STREAM_SLIDING_SQL
    return STREAM_SLIDING_SQL


# ----------------------------------------- C9: base64 image round-trip


def q_media_base64(spark: SparkSession, sf: str) -> DataFrame:
    """Binary payloads base64-encoded and decoded back in-engine (the
    reference stores images as base64, accelon3handler/img.js:19-41).
    The oracle knows the expected sizes arithmetically; `ok` proves the
    Spark decode inverts the encode byte-for-byte (md5 equality)."""
    from .operators.media import synth_media
    docs = load(spark, sf, "documents")
    m = synth_media(docs)
    # Spark's base64 is the MIME codec (CRLF every 76 chars) — strip the
    # line breaks for the canonical length; unbase64 accepts either form
    b64 = F.regexp_replace(F.base64("payload"), "[\\r\\n]", "")
    return m.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.length(b64).cast("long").alias("b64_len"),
        (F.md5(F.unbase64(b64)) == F.md5(F.col("payload"))).alias("ok"))


_SQL_MEDIA_BASE64 = """
WITH d AS (
  SELECT doc_id,
    (12 + (16 + doc_id % 64) * (16 + doc_id % 48))::BIGINT AS n_bytes
  FROM documents)
SELECT doc_id, n_bytes,
  (4 * ((n_bytes + 2) // 3))::BIGINT AS b64_len,
  TRUE AS ok
FROM d
"""


# ------------------------------------- TPC-H Q5 shape: 6-way local join


def q_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """Q5 shape: customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region
    with the LOCAL-supplier equi-condition (customer and supplier share a
    nation) — the 6-way join pattern with two broadcast dims and a
    compound join key. Revenue stays decimal-exact until the final cast."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01"))
    l = load(spark, sf, "lineitem")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region").where(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice").cast("decimal(38,4)")
           * (F.lit(1).cast("decimal(38,4)")
              - F.col("l_discount").cast("decimal(38,4)")))
    j = (c.join(o, c.c_custkey == o.o_custkey)
         .join(l, l.l_orderkey == o.o_orderkey)
         .join(s, (l.l_suppkey == s.s_suppkey)
               & (c.c_nationkey == s.s_nationkey))
         .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
         .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return (j.groupBy("n_name")
            .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"),
                 F.count("*").alias("n_items")))


_SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,4))
        * (CAST(1 AS DECIMAL(38,4)) - CAST(l_discount AS DECIMAL(38,4)))), 2)
       AS DOUBLE) AS revenue,
  count(*)::BIGINT AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# --------------------------------------- incremental checkpoint/resume


def q_incremental_hourly(spark: SparkSession, sf: str) -> DataFrame:
    """Checkpoint/resume END-TO-END with an oracle: events are staged as
    two immutable increments (event_id parity split), processed through
    streaming/incremental.process_new in TWO separate calls — the first
    bounded to one increment, the second resuming from the manifest and
    picking up only the remaining one — then the per-increment partial
    hourly aggregates are merged. The merged table must equal the plain
    batch GROUP BY over all events (the DuckDB twin), proving the
    increment split + resume + merge loses and duplicates nothing.
    Decimal sums keep the merge exact."""
    import os

    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    from .streaming.incremental import process_new

    base = os.path.join("/tmp/ksana_incr_stage",
                        os.path.basename(os.path.normpath(sf)))
    in_dir, out_dir = os.path.join(base, "in"), os.path.join(base, "out")
    src = f"{sf}/events.parquet"
    marker = os.path.join(in_dir, "inc0.parquet")
    if (not os.path.exists(marker)
            or os.path.getmtime(marker) < os.path.getmtime(src)):
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)  # stale manifest+outputs
        os.makedirs(in_dir, exist_ok=True)
        t = pq.read_table(src)
        even = pc.equal(pc.bit_wise_and(t["event_id"], 1), 0)
        pq.write_table(t.filter(even), os.path.join(in_dir, "inc0.parquet"))
        pq.write_table(t.filter(pc.invert(even)),
                       os.path.join(in_dir, "inc1.parquet"))

    def batch_fn(df: DataFrame, inc: str) -> DataFrame:
        return (df.groupBy(F.date_format("ts", "yyyy-MM-dd HH").alias("hour"),
                           "event_type")
                .agg(F.count("*").alias("n"),
                     F.sum(F.col("value").cast("decimal(38,2)"))
                     .alias("sum_value_d")))

    # first call processes ONE increment and commits its marker ...
    first = process_new(spark, in_dir, out_dir, batch_fn, max_increments=1)
    # ... the second call RESUMES from the manifest: only the rest runs.
    # (Both return [] on a warm staging dir — outputs already committed.)
    second = process_new(spark, in_dir, out_dir, batch_fn)
    assert len(first) + len(second) in (0, 2), (first, second)

    parts = spark.read.parquet(os.path.join(out_dir, "inc0.parquet"),
                               os.path.join(out_dir, "inc1.parquet"))
    return (parts.groupBy("hour", "event_type")
            .agg(F.sum("n").alias("n"),
                 F.sum("sum_value_d").cast("double").alias("sum_value")))


_SQL_INCREMENTAL_HOURLY = """
SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
       count(*)::BIGINT AS n,
       CAST(sum(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


# ----------------------------------- training-data pipeline widening

# deterministic hash split: md5 of the id string -> first two hex chars
# -> bucket 0..255 -> 80/10/10. Stable across engines, runs, cluster
# sizes — the property a train/val/test split must have.
_SPLIT_TRAIN, _SPLIT_VAL = 204, 230  # 256 * 0.8, 256 * 0.9 (floor)


def q_train_split(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2),
                    16, 10).cast("long")
    split = (F.when(bucket < _SPLIT_TRAIN, "train")
             .when(bucket < _SPLIT_VAL, "val").otherwise("test"))
    return d.select("doc_id", bucket.alias("bucket"), split.alias("split"))


_SQL_TRAIN_SPLIT = f"""
WITH h AS (
  SELECT doc_id, substr(md5(doc_id::VARCHAR), 1, 2) AS hx FROM documents),
b AS (
  SELECT doc_id,
    ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
     + strpos('0123456789abcdef', substr(hx, 2, 1)) - 1)::BIGINT AS bucket
  FROM h)
SELECT doc_id, bucket,
  CASE WHEN bucket < {_SPLIT_TRAIN} THEN 'train'
       WHEN bucket < {_SPLIT_VAL} THEN 'val' ELSE 'test' END AS split
FROM b
"""


def q_sample_per_source(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified deterministic sampling: k docs per source, picked by
    hash order (md5 of id) with id tie-break — the reproducible
    subset-per-stratum primitive for eval-set construction."""
    from pyspark.sql import Window
    d = load(spark, sf, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (d.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("source", "doc_id", F.col("rn").cast("long").alias("rn")))


_SQL_SAMPLE_PER_SOURCE = """
SELECT source, doc_id, rn::BIGINT AS rn
FROM (SELECT source, doc_id,
        row_number() OVER (PARTITION BY source
                           ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
      FROM documents)
WHERE rn <= 3
"""

_CHUNK = 256  # context-window token budget


def q_context_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Context-window chunking: the corpus token stream (docs concatenated
    in id order, NO gaps) cut into fixed 256-token windows; emit one row
    per (chunk, doc) overlap — the training-data packing map that says
    which documents contribute how many tokens to each training sequence.

    Reuses doc_offsets_hierarchical with gap=0 (the same chunked prefix
    sum that powers tpos), so the plan stays scale-safe; the chunk fan-out
    is an explode over each doc's touched window range.
    """
    from .operators import tokens as tox
    from .operators.tpos import doc_offsets_hierarchical
    t = tox.word_tokens(load(spark, sf, "documents"))
    counts = t.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    offs = doc_offsets_hierarchical(t, gap=0)
    d = counts.join(offs, "doc_id")
    lo = (F.col("tpos_offset") / _CHUNK).cast("long")
    hi = ((F.col("tpos_offset") + F.col("n_tok") - 1) / _CHUNK).cast("long")
    x = d.select("doc_id", "n_tok", "tpos_offset",
                 F.explode(F.sequence(lo, hi)).alias("chunk_id"))
    start = F.greatest(F.col("tpos_offset"), F.col("chunk_id") * _CHUNK)
    end = F.least(F.col("tpos_offset") + F.col("n_tok"),
                  (F.col("chunk_id") + 1) * _CHUNK)
    return (x.select("chunk_id", "doc_id",
                     (end - start).alias("n_tokens_in_chunk"))
            .where(F.col("n_tokens_in_chunk") > 0))


_SQL_CONTEXT_CHUNKS = f"""
WITH t AS (SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
               AS n_tok
           FROM documents),
o AS (SELECT doc_id, n_tok,
        coalesce(sum(n_tok) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
          AS off
      FROM t WHERE n_tok > 0),
x AS (SELECT doc_id, n_tok, off,
        unnest(range(off // {_CHUNK}, (off + n_tok - 1) // {_CHUNK} + 1))
          AS chunk_id
      FROM o)
SELECT chunk_id::BIGINT AS chunk_id, doc_id,
  (least(off + n_tok, (chunk_id + 1) * {_CHUNK})
   - greatest(off, chunk_id * {_CHUNK}))::BIGINT AS n_tokens_in_chunk
FROM x
WHERE least(off + n_tok, (chunk_id + 1) * {_CHUNK})
      - greatest(off, chunk_id * {_CHUNK}) > 0
"""


def q_dedup_components(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup CLUSTERING: n-gram-Jaccard candidate pairs -> connected
    components (large-star/small-star alternation, O(log n) rounds on any
    topology — the 10^12-edge path; the min-label engine remains for
    shallow graphs) -> one row per document with its component id and
    whether it is the kept representative (the component minimum). Docs
    with no near-dup partner form singleton components. The oracle
    recomputes the same fixpoint as a recursive-CTE transitive closure
    over the identical pair SQL. (At 100 TB the pair input is the
    minhash_lsh_pairs candidate stream instead of the exact Jaccard join;
    the component operator is input-agnostic.)"""
    from .operators.components import connected_components_star
    from .operators.dedup import ngram_jaccard_pairs
    d = load(spark, sf, "documents")
    pairs = ngram_jaccard_pairs(d, n=3, threshold_num=1, threshold_den=5)
    comp = connected_components_star(pairs.select("id_a", "id_b"),
                                     src="id_a", dst="id_b",
                                     vertices=d.select("doc_id"))
    return comp.select(F.col("id").alias("doc_id"), "component",
                       (F.col("id") == F.col("component")).alias("is_rep"))


# pair SQL = q_ngram_jaccard's oracle (same n/threshold constants)
_SQL_DEDUP_COMPONENTS = """
WITH t AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
  FROM t, unnest(range(1, len(toks) - 1)) AS u(i)
  WHERE len(toks) >= 3),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
co AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT id_a, id_b
  FROM co JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
  WHERE inter * 5 >= (sa.sz + sb.sz - inter) * 1),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (
  -- transitive closure: every (vertex, reachable vertex) pair
  WITH RECURSIVE r(a, b) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT r.a, e.b FROM r JOIN edges e ON r.b = e.a)
  SELECT a, min(b) AS component FROM r GROUP BY a)
SELECT a AS doc_id, component::BIGINT AS component,
       (a = component) AS is_rep
FROM reach
"""


def q_embed_neardup_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup pairs through the LSH BUCKETED candidate path
    (the 10^12-vector plan: bucket join, never cross product), exact-
    verified by cosine. Deterministic planes -> exact SQL twin; candidate
    recall vs the all-pairs plan is asserted in tests."""
    from .operators.ann import lsh_cosine_pairs
    e = load(spark, sf, "embeddings")
    return lsh_cosine_pairs(e, threshold=0.4, nbits=6, dim=64)


def _embed_neardup_lsh_sql() -> str:
    from .operators.ann import _hyperplanes
    planes = _hyperplanes(dim=64, nbits=6)
    lits = "[" + ", ".join(
        "[" + ", ".join(repr(x) for x in row) + "]" for row in planes) + "]"
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
           FROM embeddings),
pl AS (SELECT {lits} AS planes),
b AS (SELECT vec_id, emb,
        list_sum(list_transform(range(1, 7), i ->
          CASE WHEN round(list_sum(list_transform(range(1, 65),
                     j -> emb[j] * planes[i][j])), 6) > 0
               THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END)) AS bucket
      FROM e, pl),
c AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b, a.emb AS ea, b2.emb AS eb
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id),
p AS (SELECT id_a, id_b, unnest(ea)::DOUBLE AS x, unnest(eb)::DOUBLE AS y
      FROM c),
s AS (SELECT id_a, id_b,
        round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 6)
          AS cos_sim
      FROM p GROUP BY id_a, id_b)
SELECT id_a, id_b, cos_sim FROM s WHERE cos_sim >= 0.4
"""


# -------------------------------------- portable-hash sketch twins (round 3)
# minhash_pairs / simhash keep xxhash64 (the 64-bit JVM-side production
# hash, rows-only: DuckDB has no xxhash64). These twins run the IDENTICAL
# algorithm over a 28-bit md5-derived base hash both engines share, so the
# whole sketch pipeline gets exact cross-engine value parity.

_MD5H28 = ("list_sum(list_transform(range(1, 8), i2 -> "
           "(strpos('0123456789abcdef', substr(md5({s}), i2, 1)) - 1) "
           "* (1::BIGINT << (4 * (7 - i2)))))")
_DOC_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


def q_minhash_md5(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.dedup import minhash_md5_pairs
    # the sf testdata is ONE parquet file => one input split; spread the
    # signature stage (at scale the scan has thousands of splits and this
    # repartition disappears)
    d = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism)
    return minhash_md5_pairs(d, k=16, bands=4, n=3)


def _minhash_md5_sql() -> str:
    from .operators.dedup import _P, _perm_constants
    consts = _perm_constants(16)
    al = "[" + ", ".join(str(a) for a, _ in consts) + "]"
    bl = "[" + ", ".join(str(b) for _, b in consts) + "]"
    return f"""
WITH t AS (SELECT doc_id, {_DOC_TOKS} AS toks FROM documents),
shd AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3 THEN
      list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' ')))
    ELSE []::VARCHAR[] END AS shingles
  FROM t),
hvt AS (
  SELECT doc_id,
    list_transform(shingles, s -> {_MD5H28.format(s='s')}) AS hv
  FROM shd WHERE len(shingles) > 0),
sg AS (
  SELECT doc_id,
    list_transform(range(1, 17), j ->
      list_min(list_transform(hv, h -> (({al})[j] * h + ({bl})[j]) % {_P})))
      AS sig
  FROM hvt),
bk AS (
  SELECT doc_id, bi AS band,
         array_to_string(sig[(bi * 4 + 1):(bi * 4 + 4)], ',') AS bkey
  FROM sg, unnest(range(0, 4)) AS u(bi)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
  FROM bk a JOIN bk b2
    ON a.band = b2.band AND a.bkey = b2.bkey AND a.doc_id < b2.doc_id),
m AS (
  SELECT id_a, id_b,
    len(list_filter(range(1, 17), j -> sa.sig[j] = sb.sig[j]))::BIGINT
      AS n_match
  FROM cand JOIN sg sa ON sa.doc_id = id_a JOIN sg sb ON sb.doc_id = id_b)
SELECT id_a, id_b, n_match, (n_match::DOUBLE / 16) AS est_jaccard FROM m
"""


def q_simhash_md5(spark: SparkSession, sf: str) -> DataFrame:
    from .operators.dedup import simhash_md5
    return simhash_md5(load(spark, sf, "documents"), nbits=28)


_SQL_SIMHASH_MD5 = f"""
WITH t AS (SELECT doc_id, {_DOC_TOKS} AS toks FROM documents),
hvt AS (
  SELECT doc_id, list_transform(toks, s -> {_MD5H28.format(s='s')}) AS hv
  FROM t WHERE len(toks) > 0)
SELECT doc_id,
  list_sum(list_transform(range(1, 29), i ->
    CASE WHEN list_sum(list_transform(hv, h -> ((h >> (i - 1)) & 1) * 2 - 1)) > 0
         THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END))::BIGINT AS simhash
FROM hvt
"""


# ---------------------------------------- IVF with k-means-refined cells


def q_ivf_kmeans_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF top-k with Lloyd-refined coarse centroids (2 iterations from the
    first-16 init): assignment by 6dp-rounded cosine argmax, centroid
    update by EXACT decimal component sums (scale-invariant direction, no
    division) — so the whole iterative quantizer replays in SQL. Recall vs
    brute force tightens vs the placeholder quantizer
    (tests/test_media_ivf.py)."""
    from .operators import ann
    e = load(spark, sf, "embeddings")
    qv = [row[0] for row in
          e.where(F.col("vec_id") == 0).select(F.explode("embedding"))
          .collect()]  # collect-ok: one query vector (dim rows)
    cents = ann.ivf_centroids_kmeans(e, n_cells=16, iters=2)
    return ann.ivf_topk(e, qv, k=10, n_cells=16, n_probe=8, centroids=cents)


def _kmeans_cte_prefix(n_cells: int, iters: int,
                       dim: int) -> tuple[list[str], str, str]:
    """Shared Lloyd-quantizer CTE prefix: init (first-n_cells vectors) +
    `iters` unrolled assign/update rounds — assignment by 6dp-rounded
    cosine argmax (tie -> lowest cell), update by exact DECIMAL component
    sums (empty cells keep the previous direction). Returns (blocks,
    final_centroid_cte, sim_expr); callers append their own consumer CTEs
    (ivf_kmeans_topk: probe + top-k; semdedup: within-cell pairwise)."""
    sim = ("round(list_sum(list_transform(range(1, {d1}), "
           "i -> a.emb[i] * c.cemb[i])) "
           "/ greatest(sqrt(list_sum(list_transform(a.emb, x -> x * x))) "
           "* sqrt(list_sum(list_transform(c.cemb, x -> x * x))), 1e-30), 6)"
           ).format(d1=dim + 1)
    blocks = [f"""
e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
      FROM embeddings),
c0 AS (SELECT vec_id AS cell, emb AS cemb FROM e WHERE vec_id < {n_cells})"""]
    prev = "c0"
    for t in range(1, iters + 1):
        blocks.append(f"""
sims{t} AS (SELECT a.vec_id, c.cell, {sim} AS s FROM e a CROSS JOIN {prev} c),
asg{t} AS (SELECT vec_id, cell FROM (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rn
  FROM sims{t}) WHERE rn = 1),
sum{t} AS (
  SELECT asg{t}.cell, u.i,
    CAST(sum(CAST(round(e.emb[u.i], 6) AS DECIMAL(27,6))) AS DOUBLE) AS v
  FROM e JOIN asg{t} USING (vec_id), unnest(range(1, {dim + 1})) AS u(i)
  GROUP BY 1, 2),
c{t} AS (
  SELECT p.cell, COALESCE(s.cemb, p.cemb) AS cemb
  FROM {prev} p LEFT JOIN
    (SELECT cell, list(v ORDER BY i) AS cemb FROM sum{t} GROUP BY cell) s
    USING (cell))""")
        prev = f"c{t}"
    return blocks, prev, sim


def _ivf_kmeans_sql(n_cells: int = 16, iters: int = 2, n_probe: int = 8,
                    k: int = 10, dim: int = 64) -> str:
    """Unrolled Lloyd iterations as CTE chains (the shared
    _kmeans_cte_prefix), then probe + final top-k — the literal SQL replay
    of ivf_centroids_kmeans + ivf_topk."""
    blocks, prev, sim = _kmeans_cte_prefix(n_cells, iters, dim)
    blocks.append(f"""
simsF AS (SELECT a.vec_id, c.cell, {sim} AS s FROM e a CROSS JOIN {prev} c),
asgF AS (SELECT vec_id, cell FROM (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rn
  FROM simsF) WHERE rn = 1),
probe AS (SELECT cell FROM (
  SELECT cell, row_number() OVER (ORDER BY s DESC, cell) AS rn
  FROM simsF WHERE vec_id = 0) WHERE rn <= {n_probe}),
q AS (SELECT emb AS qemb FROM e WHERE vec_id = 0),
p AS (SELECT e.vec_id, unnest(e.emb)::DOUBLE AS x, unnest(q.qemb)::DOUBLE AS y
      FROM e JOIN asgF USING (vec_id), q
      WHERE asgF.cell IN (SELECT cell FROM probe)),
s2 AS (SELECT vec_id,
         round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 6)
           AS cos_sim
       FROM p GROUP BY vec_id)""")
    return ("WITH " + ",".join(blocks)
            + f"\nSELECT vec_id, cos_sim FROM s2 "
              f"ORDER BY cos_sim DESC, vec_id LIMIT {k}")


def q_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means the embedding space with the SAME Lloyd
    quantizer machinery as ivf_kmeans_topk (one exact-replayable
    refinement round — cluster QUALITY barely moves the pruning set, so
    semdedup spends one iteration where the recall-sensitive ANN probe
    spends two), then within each cell mark every vector whose 6dp cosine
    to some LOWER-id cell-mate is >= 0.4 as a semantic duplicate
    (keep-lowest-id). The quadratic stage is cell-local BLAS — one shuffle
    on the cell key, never an all-pairs product (operators/ann.py:
    semdedup). The oracle replays the shared Lloyd CTE prefix + a
    within-cell self-join."""
    from .operators import ann
    e = load(spark, sf, "embeddings")
    cents = ann.ivf_centroids_kmeans(e, n_cells=16, iters=1)
    return ann.semdedup(e, n_cells=16, iters=1, threshold=0.4,
                        centroids=cents)


def _semdedup_sql(n_cells: int = 16, iters: int = 1, dim: int = 64,
                  threshold: str = "0.4") -> str:
    """SQL replay of q_semdedup: the shared Lloyd CTE prefix, a final
    assignment, then max cosine to any lower-id same-cell vector."""
    blocks, prev, sim = _kmeans_cte_prefix(n_cells, iters, dim)
    blocks.append(f"""
simsF AS (SELECT a.vec_id, c.cell, {sim} AS s FROM e a CROSS JOIN {prev} c),
asgF AS (SELECT vec_id, cell FROM (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rn
  FROM simsF) WHERE rn = 1),
v AS (SELECT e.vec_id, e.emb, asgF.cell FROM e JOIN asgF USING (vec_id)),
cp AS (SELECT a.vec_id AS vid, b.vec_id AS oid, a.emb AS ea, b.emb AS eb
       FROM v a JOIN v b ON a.cell = b.cell AND b.vec_id < a.vec_id),
px AS (SELECT vid, oid, unnest(ea)::DOUBLE AS x, unnest(eb)::DOUBLE AS y
       FROM cp),
ps AS (SELECT vid, oid,
         round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 6) AS cs
       FROM px GROUP BY vid, oid),
mx AS (SELECT vid, max(cs) AS max_lower_sim FROM ps GROUP BY vid)""")
    return ("WITH " + ",".join(blocks) + f"""
SELECT v.vec_id, v.cell::INTEGER AS cell, mx.max_lower_sim,
       COALESCE(mx.max_lower_sim >= {threshold}, FALSE) AS is_dup
FROM v LEFT JOIN mx ON mx.vid = v.vec_id""")


# ------------------------------------- round-3 web-pipeline coverage adds


def q_repetition_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition n-gram signals (the north rule names
    'repetition n-grams' explicitly): per document, the most-frequent
    token-bigram count vs total bigrams (cross-multiplied flag, no float
    threshold) and the duplicate-trigram excess (occurrences - distinct).
    Explode -> (doc, gram) hash agg: map-side partial combine, the 100 TB
    shape (one shuffle keyed by (doc_id, gram), skew-free since grams are
    doc-scoped). Docs with < 3 tokens have no trigram and are excluded."""
    d = load(spark, sf, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    t = (d.select("doc_id", toks.alias("toks"))
         .where(F.size("toks") >= 3))

    def grams(n: int, out: str) -> DataFrame:
        g = F.explode(F.transform(
            F.sequence(F.lit(1), F.size("toks") - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at("toks", i + j)
                                         for j in range(n)])))
        per = (t.select("doc_id", g.alias("g"))
               .groupBy("doc_id", "g").agg(F.count("*").alias("c")))
        return per.groupBy("doc_id").agg(
            F.max("c").alias(f"top_{out}_cnt"),
            F.sum("c").alias(f"n_{out}s"),
            F.count("*").alias(f"n_distinct_{out}s"))

    bg = grams(2, "bigram")
    tg = grams(3, "trigram")
    return (bg.join(tg, "doc_id")
            .select("doc_id",
                    F.col("n_bigrams").cast("long").alias("n_bigrams"),
                    F.col("top_bigram_cnt").cast("long")
                    .alias("top_bigram_cnt"),
                    (F.col("top_bigram_cnt") * 5 > F.col("n_bigrams"))
                    .alias("repetitive"),
                    (F.col("n_trigrams") - F.col("n_distinct_trigrams"))
                    .cast("long").alias("dup_trigram_excess")))


_SQL_REPETITION_NGRAMS = """
WITH t AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents),
f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 3),
bg AS (SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS g
       FROM f, unnest(range(1, len(toks))) AS u(i)),
b1 AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
b2 AS (SELECT doc_id, max(c)::BIGINT AS top_bigram_cnt,
              sum(c)::BIGINT AS n_bigrams FROM b1 GROUP BY 1),
tg AS (SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS g
       FROM f, unnest(range(1, len(toks) - 1)) AS u(i)),
t1 AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2),
t2 AS (SELECT doc_id, (sum(c) - count(*))::BIGINT AS dup_trigram_excess
       FROM t1 GROUP BY 1)
SELECT b2.doc_id, n_bigrams, top_bigram_cnt,
       (top_bigram_cnt * 5 > n_bigrams) AS repetitive, dup_trigram_excess
FROM b2 JOIN t2 ON b2.doc_id = t2.doc_id
"""


def q_tfidf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 TF-IDF terms per document: tf from a (doc, token) hash agg,
    df from a token-level agg over that (two map-side-combining shuffles),
    N via a broadcast scalar join — the inverted-index weighting a
    retrieval/training pipeline derives from the same posting stats.
    Score = round(tf * ln(N/df), 6); ranking on the ROUNDED score with a
    token tie-break keeps both engines' row_number deterministic."""
    d = load(spark, sf, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    tok = d.select("doc_id", F.explode(toks).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    nd = d.agg(F.count("*").cast("double").alias("nd"))
    s = (tf.join(dfreq, "token").crossJoin(F.broadcast(nd))
         .select("doc_id", "token", F.col("tf").cast("long").alias("tf"),
                 F.round(F.col("tf") * F.log(F.col("nd") / F.col("df")), 6)
                 .alias("score")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "token")
    return (s.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).drop("rn"))


_SQL_TFIDF_TOPK = """
WITH t AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT count(*)::DOUBLE AS nd FROM documents),
s AS (SELECT doc_id, tf.token, tf::BIGINT AS tf,
             round(tf * ln(nd / df), 6) AS score
      FROM tf JOIN dfq ON tf.token = dfq.token, nd)
SELECT doc_id, token, tf, score FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, token) AS rn
  FROM s) WHERE rn <= 3
"""


def q_stream_quality(spark: SparkSession, sf: str) -> DataFrame:
    """The flagship quality pipeline EXECUTED BY THE STREAMING ENGINE
    (file-source readStream over the staged pages -> fused kernel pass ->
    append sink, Trigger.AvailableNow). Stateless map => streaming output
    must equal the batch pipeline exactly, so this query shares the
    pages_pipeline DuckDB twin verbatim (wired in queries.py)."""
    from .queries import stage_pages
    from .streaming.quality import stream_quality_query
    return stream_quality_query(spark, stage_pages(spark, sf))


def q_host_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-host rollup over the STAGED Common-Crawl-shaped pages table
    (url -> host by regex; the input_hint shape): page counts + text
    volume. The generator gives bighost.example ~50% of urls, so this is
    the skew-surface query — at scale the groupBy uses the same
    salted-two-phase plan as salted_source_agg; here the hot key is one
    group and the plain hash agg (map-side combined) is the right plan."""
    from .queries import stage_pages
    staged = spark.read.parquet(stage_pages(spark, sf))
    host = F.regexp_extract("url", r"^https://([^/]+)/", 1)
    return (staged.groupBy(host.alias("host"))
            .agg(F.count("*").alias("n_pages"),
                 F.sum(F.length("text")).alias("sum_text_chars")))


def _host_stats_sql() -> str:
    from .sources.pages import STAGE_PATH
    return f"""
SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS host,
       count(*)::BIGINT AS n_pages,
       sum(length(text))::BIGINT AS sum_text_chars
FROM read_parquet('{STAGE_PATH}/*.parquet')
GROUP BY 1
"""


# ---------------------------------- text -> embedding -> ANN, end-to-end

_EMB_DIM = 16


def q_text_embed_topk(spark: SparkSession, sf: str) -> DataFrame:
    """The full text->vector->similarity loop with no pre-built embedding
    table: every document gets a hashing-trick bag-of-words vector
    (token -> md5-derived bucket in [0,16), counts per bucket — the
    classic feature-hashing embedding, integer-exact), then brute-force
    cosine top-10 vs doc 0's vector with the repo's rounded-cosine
    determinism rules. Buckets are materialized with ONE transform pass
    (no-CSE discipline), the count vector with one fold; integer counts
    make the vectors cross-engine exact, so the whole chain — hash,
    bucket, count, cosine, top-k — replays in SQL."""
    from .operators.ann import cosine
    from .operators.dedup import _md5_hash28
    d = load(spark, sf, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    buckets = F.transform(toks, lambda t: F.pmod(_md5_hash28(t),
                                                 F.lit(_EMB_DIM)))
    seq = F.lit(list(range(_EMB_DIM)))
    vec = F.aggregate(
        buckets,
        F.array_repeat(F.lit(0).cast("long"), _EMB_DIM),
        lambda acc, b: F.zip_with(
            acc, seq,
            lambda c, i: c + F.when(b == i, 1).otherwise(0)),
    )
    e = (d.select("doc_id", vec.alias("v"))
         .where(F.size(toks) > 0))
    q = e.where(F.col("doc_id") == 0).select(F.col("v").alias("qv"))
    sim = F.round(cosine(F.col("v").cast("array<double>"),
                         F.col("qv").cast("array<double>")), 6)
    return (e.crossJoin(F.broadcast(q))
            .select("doc_id", sim.alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), "doc_id").limit(10))


def _text_embed_topk_sql() -> str:
    return f"""
WITH t AS (SELECT doc_id, {_DOC_TOKS} AS toks FROM documents),
bk AS (
  SELECT doc_id,
    list_transform(toks, s -> ({_MD5H28.format(s='s')}) % {_EMB_DIM}) AS bks
  FROM t WHERE len(toks) > 0),
ev AS (
  SELECT doc_id,
    list_transform(range(1, {_EMB_DIM + 1}),
                   i -> len(list_filter(bks, b -> b = i - 1))::DOUBLE) AS v
  FROM bk),
q AS (SELECT v AS qv FROM ev WHERE doc_id = 0),
p AS (SELECT doc_id, unnest(v)::DOUBLE AS x, unnest(qv)::DOUBLE AS y
      FROM ev, q),
s AS (SELECT doc_id,
        round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 6)
          AS cos_sim
      FROM p GROUP BY doc_id)
SELECT doc_id, cos_sim FROM s ORDER BY cos_sim DESC, doc_id LIMIT 10
"""


# ------------------------------- phone-rule scrub, non-trivially fired

# Five fixture pieces exercising the phone rule's FULL semantics: dash /
# dot / space separators, the optional +1 prefix, and — critically — the
# two context suppressions an RE2 twin cannot express: the negative
# LOOKBEHIND (?<![0-9]) (piece 2: '9415 555 0132' must NOT scrub) and the
# trailing (?![0-9]) (piece 4: a 5-digit tail must NOT scrub). The pieces
# are rule-orthogonal: no other scrub rule fires on any of them (asserted
# per-doc via n_other below and kernel-side in tests/test_scrub.py).
_PHONE_REPEAT = "call (415) 555-0199 now. "
_PHONE_TAIL = ("dial +1 415-555-2671 ok. id 9415 555 0132 raw. "
               "fax 415.555.0142 end. num 415.555.01321 long.")
_PHONE_REPEAT_SCRUBBED = "call <PHONE> now. "
_PHONE_TAIL_SCRUBBED = ("dial <PHONE> ok. id 9415 555 0132 raw. "
                        "fax <PHONE> end. num 415.555.01321 long.")


def q_scrub_phone_fixture(spark: SparkSession, sf: str) -> DataFrame:
    """VERDICT r3 next-round #5: the phone rule proven NON-trivially. A
    deterministic phone-bearing corpus is synthesized from doc_id (the
    repeat piece occurs doc_id % 3 times, the four tail pieces once) and
    scrubbed by the REAL ordered kernel (scrub_series — all six rules in
    order). The oracle reconstructs the scrubbed text and counts in CLOSED
    FORM — it knows exactly where phones occur, including the
    lookbehind-suppressed cases no RE2 twin could decide — so hash parity
    proves count AND byte-identical scrubbed text per doc."""
    from .functions import scrub as SC
    d = load(spark, sf, "documents").select("doc_id")

    def run(batches):
        import pandas as pd
        for pdf in batches:
            k = (pdf["doc_id"] % 3).astype("int64")
            text = (pd.Series([_PHONE_REPEAT] * len(pdf))
                    .str.repeat(k).fillna("") + _PHONE_TAIL)
            sc = SC.scrub_series(text)
            other = sum(sc[f"scrub_{n}"] for n in SC.SCRUB_RULE_NAMES
                        if n != "phone")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "scrubbed": sc["text"],
                "n_phone": sc["scrub_phone"].astype("int64"),
                "n_other": other.astype("int64"),
            })

    return d.mapInPandas(
        run, schema="doc_id long, scrubbed string, n_phone long, n_other long")


_SQL_SCRUB_PHONE_FIXTURE = f"""
SELECT doc_id,
  repeat('{_PHONE_REPEAT_SCRUBBED}', (doc_id % 3)::INT)
    || '{_PHONE_TAIL_SCRUBBED}' AS scrubbed,
  (doc_id % 3 + 2)::BIGINT AS n_phone,
  0::BIGINT AS n_other
FROM documents
"""


def q_ccnet_buckets_approx(spark: SparkSession, sf: str) -> DataFrame:
    """Driver evidence for the declared 10^12-doc CCNet sharding path
    (VERDICT r3 next-round #6): percentile_approx decile boundaries per
    language + broadcast range-predicate assignment — NO per-language sort.
    ROWS-ONLY by design: percentile_approx's boundary choice is
    engine-specific (GK sketch), so no DuckDB twin exists; per-doc
    agreement with the exact oracle-pinned ntile assigner (>=0.80 exact,
    >=0.99 within one decile) is asserted in tests/test_ccnet.py. Output is
    the same manifest shape as the exact `ccnet_buckets` query."""
    from .queries import ccnet_buckets_approx
    return (ccnet_buckets_approx(spark, sf)
            .groupBy("lang_detected", "ppl_decile")
            .agg(F.count("*").alias("n_docs")))


# --------------------------- CCNet line-level dedup over the pages table

_LINE_DF = 3  # lines occurring >= this many times corpus-wide are boilerplate


def q_line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style LINE-level deduplication over the staged Common-Crawl-
    shaped pages table: any line whose corpus-wide occurrence count is
    >= 3 is boilerplate (the generator's '&done' trailer appears on every
    page) and is dropped; the page text is re-assembled from the kept
    lines in order. Output per page: line counts + the deduplicated text,
    so hash parity proves the drop decisions AND the byte-exact re-join.

    100 TB shape: posexplode -> one corpus-wide line-count aggregation
    (algebraic, map-side combined; the hot '&done' key partial-aggregates
    per partition before the shuffle) over a 16-byte md5 LINE HASH (the
    dup_spans key discipline — raw line strings never shuffle) -> the
    above-floor set joins back onto the line stream as a PLAIN shuffle
    join on the hash, never a forced broadcast: on real web text the
    boilerplate set is corpus-scale (CCNet shards precisely because it
    is), so a broadcast hint is executor-OOM by design (VERDICT r4 #2);
    AQE still converts to broadcast at runtime when the set is genuinely
    small. Then one per-page re-aggregation; collect_list is bounded by
    a single page's line count."""
    from .queries import stage_pages
    p = spark.read.parquet(stage_pages(spark, sf)).select("url", "text")
    lines = (p.select(
        "url", F.posexplode(F.split("text", "\n")).alias("pos", "line"))
        .withColumn("lh", F.unhex(F.md5(F.col("line").cast("binary")))))
    boiler = (lines.groupBy("lh").agg(F.count("*").alias("df"))
              .where(F.col("df") >= _LINE_DF)
              .select("lh", F.lit(True).alias("is_boiler")))
    tagged = lines.join(boiler, "lh", "left")
    kept_struct = F.when(F.col("is_boiler").isNull(),
                         F.struct("pos", "line"))
    return (tagged.groupBy("url").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("is_boiler"), 1).otherwise(0))
        .alias("n_dropped"),
        F.concat_ws("\n", F.transform(
            F.array_sort(F.collect_list(kept_struct)),  # nulls skipped
            lambda s: s["line"])).alias("text_kept")))


def _line_dedup_sql() -> str:
    from .sources.pages import STAGE_PATH
    return f"""
WITH s AS (SELECT url, string_split(text, chr(10)) AS ls
           FROM read_parquet('{STAGE_PATH}/*.parquet')),
l AS (SELECT url, i AS pos, ls[i] AS line
      FROM s, unnest(range(1, len(ls) + 1)) AS u(i)),
b AS (SELECT line FROM l GROUP BY line HAVING count(*) >= {_LINE_DF}),
t AS (SELECT l.url, l.pos, l.line, b.line IS NOT NULL AS dr
      FROM l LEFT JOIN b USING (line))
SELECT url, count(*)::BIGINT AS n_lines,
       sum(CASE WHEN dr THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
       coalesce(string_agg(CASE WHEN NOT dr THEN line END, chr(10)
                           ORDER BY pos), '') AS text_kept
FROM t GROUP BY url
"""


# ----------------------------- URL canonicalization + first-crawl-wins

def _url_canon(col):
    """https://WWW.Host/path?q#f -> https://host/path: host lowercased,
    www. stripped, query/fragment stripped, trailing slash stripped. Host
    case-folds; the path is case-SENSITIVE (real-web semantics)."""
    host = F.lower(F.regexp_extract(col, r"^https://([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    rest = F.regexp_extract(col, r"^https://[^/?#]+([^?#]*)", 1)
    rest = F.regexp_replace(rest, r"/$", "")
    return F.concat(F.lit("https://"), host, rest)


def q_url_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """URL-level dedup, the step BEFORE content dedup in a web pipeline:
    canonicalize crawl urls and keep the earliest crawl per canonical url
    (first-crawl-wins, ties broken by raw url). The staged pages table has
    unique urls by construction, so a deterministic crawl log is
    synthesized per page from md5(url): every page contributes its raw
    crawl, pages with m%2==0 add a 'https://www.' + '?utm_source=feed'
    re-crawl one hour later, pages with m%3==0 add an UPPERCASED-host +
    trailing-slash crawl 30 minutes EARLIER (so canonicalization must win
    over the raw crawl). Output: one row per canonical url with its crawl
    count and the kept (url, ts).

    100 TB shape: variant synthesis is per-row; the dedup is ONE
    row_number window keyed by the canonical url (equivalently min_by) —
    a single shuffle on the dedup key, the same plan a real crawl-log
    dedup runs."""
    from .queries import stage_pages
    p = (spark.read.parquet(stage_pages(spark, sf))
         .select("url", F.col("warc_ts").cast("timestamp").alias("ts")))
    m = F.conv(F.substring(F.md5("url"), 1, 7), 16, 10).cast("long")
    host = F.regexp_extract("url", r"^https://([^/]+)", 1)
    path = F.regexp_extract("url", r"^https://[^/]+(.*)$", 1)
    v0 = F.struct(F.col("url").alias("u"), F.col("ts").alias("t"))
    v1 = F.when(m % 2 == 0, F.struct(
        F.concat(F.lit("https://www."), host, path,
                 F.lit("?utm_source=feed")).alias("u"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t")))
    v2 = F.when(m % 3 == 0, F.struct(
        F.concat(F.lit("https://"), F.upper(host), path,
                 F.lit("/")).alias("u"),
        (F.col("ts") - F.expr("INTERVAL 30 MINUTE")).alias("t")))
    crawls = (p.select(F.explode(F.filter(
        F.array(v0, v1, v2), lambda x: x.isNotNull())).alias("c"))
        .select(F.col("c.u").alias("url"), F.col("c.t").alias("ts")))
    from pyspark.sql import Window
    w = Window.partitionBy("url_canon").orderBy("ts", "url")
    ranked = (crawls.withColumn("url_canon", _url_canon(F.col("url")))
              .withColumn("rn", F.row_number().over(w)))
    return (ranked.groupBy("url_canon")
            .agg(F.count("*").alias("n_crawls"),
                 F.min(F.when(F.col("rn") == 1, F.col("url")))
                 .alias("kept_url"),
                 F.min(F.when(F.col("rn") == 1, F.col("ts")))
                 .alias("kept_ts")))


def _url_dedup_sql() -> str:
    from .sources.pages import STAGE_PATH
    return f"""
WITH p AS (SELECT url, warc_ts::TIMESTAMP AS ts,
             ('0x' || substr(md5(url), 1, 7))::BIGINT AS m,
             regexp_extract(url, '^https://([^/]+)', 1) AS host,
             regexp_extract(url, '^https://[^/]+(.*)$', 1) AS path
           FROM read_parquet('{STAGE_PATH}/*.parquet')),
crawls AS (
  SELECT url, ts FROM p
  UNION ALL
  SELECT 'https://www.' || host || path || '?utm_source=feed',
         ts + INTERVAL 1 HOUR FROM p WHERE m % 2 = 0
  UNION ALL
  SELECT 'https://' || upper(host) || path || '/',
         ts - INTERVAL 30 MINUTE FROM p WHERE m % 3 = 0),
c AS (SELECT url, ts,
        'https://' ||
        regexp_replace(lower(regexp_extract(url, '^https://([^/?#]+)', 1)),
                       '^www\\.', '') ||
        regexp_replace(regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1),
                       '/$', '') AS url_canon,
        row_number() OVER (PARTITION BY
          'https://' ||
          regexp_replace(lower(regexp_extract(url, '^https://([^/?#]+)', 1)),
                         '^www\\.', '') ||
          regexp_replace(regexp_extract(url, '^https://[^/?#]+([^?#]*)', 1),
                         '/$', '')
          ORDER BY ts, url) AS rn
      FROM crawls)
SELECT url_canon, count(*)::BIGINT AS n_crawls,
       min(CASE WHEN rn = 1 THEN url END) AS kept_url,
       min(CASE WHEN rn = 1 THEN ts END) AS kept_ts
FROM c GROUP BY url_canon
"""


# ------------------- exact-substring duplicate spans (Lee et al. style)

_SPAN_W = 8  # window width in tokens
_SPAN_S = 4  # stride


def q_dup_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-substring duplication signal (the Lee et al. 'Deduplicating
    Training Data' shape, token-windowed): slide an {_SPAN_W}-token window
    with stride {_SPAN_S} over each page, count for each window text the
    number of DISTINCT pages containing it, and report per page how many
    of its windows also occur in another page (plus the cross-multiplied
    >=10% flag). Catches copied spans inside otherwise-distinct documents
    — the case document-level minhash misses.

    100 TB shape: windows explode to (window_hash, page) rows — the
    window TEXT never leaves the row it was built in: both shuffle legs
    (the df count groupBy and the rollup join) key on a 16-byte md5 of
    the window, not the ~100-byte string, exactly like the Jaccard join
    (md5 rather than xxhash64 so the DuckDB twin stays value-exact).
    Windows are generated with ONE transform over the materialized token
    array, hashed in the same transform (no-CSE discipline)."""
    from .queries import stage_pages
    p = spark.read.parquet(stage_pages(spark, sf)).select("url", "text")
    toks = F.filter(F.split(F.regexp_replace("text", r"\s+", " "), " "),
                    lambda x: x != F.lit(""))
    base = (p.select("url", toks.alias("toks"))
            .where(F.size("toks") >= _SPAN_W))
    n_win = ((F.size("toks") - _SPAN_W) / _SPAN_S + 1).cast("int")
    wins = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.md5(F.concat_ws(
            " ", F.slice("toks", i * _SPAN_S + 1, _SPAN_W)).cast("binary")))
    pw = (base.select("url", F.explode(wins).alias("w")).distinct())
    docfreq = (pw.groupBy("w").agg(F.count("*").alias("df")))
    return (pw.join(docfreq, "w")
            .groupBy("url")
            .agg(F.count("*").alias("n_windows"),
                 F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
                 .cast("long").alias("n_dup_windows"))
            .select("url", "n_windows", "n_dup_windows",
                    (F.col("n_dup_windows") * 10 >= F.col("n_windows"))
                    .alias("heavy_dup")))


def _dup_spans_sql() -> str:
    from .sources.pages import STAGE_PATH
    return f"""
WITH t AS (SELECT url,
             list_filter(string_split(regexp_replace(text, '\\s+', ' ', 'g'),
                                      ' '), x -> x <> '') AS toks
           FROM read_parquet('{STAGE_PATH}/*.parquet')),
b AS (SELECT url, toks FROM t WHERE len(toks) >= {_SPAN_W}),
pw AS (SELECT DISTINCT url,
         md5(array_to_string(
           toks[(i * {_SPAN_S} + 1):(i * {_SPAN_S} + {_SPAN_W})], ' ')) AS w
       FROM b, unnest(range(0, ((len(toks) - {_SPAN_W}) // {_SPAN_S}) + 1))
            AS u(i)),
df AS (SELECT w, count(*) AS df FROM pw GROUP BY w)
SELECT url, count(*)::BIGINT AS n_windows,
       sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_windows,
       (sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) * 10
        >= count(*)) AS heavy_dup
FROM pw JOIN df USING (w) GROUP BY url
"""


# ------------- exact-substring duplicate REMOVAL (the Lee et al. cut)


def q_dup_span_cut(spark: SparkSession, sf: str) -> DataFrame:
    """The step after `dup_spans`: actually CUT the duplicated spans out
    of the text, keeping one copy globally (Lee et al. 'Deduplicating
    Training Data Makes Language Models Better' delete all-but-one
    occurrences of every duplicated substring). Per duplicated window the
    KEEPER page is min(url); every other page's instances become cut
    intervals [s, s+W-1] in token positions. Overlapping/adjacent
    intervals are unioned per page with a gaps-and-islands pass (prefix-
    max of interval end, new island when s > prev_max + 1 — since every
    interval in a run starts at most prev_max+1, each island is a
    contiguous [min_s, max_e] block), then the surviving tokens are
    re-assembled in order. Output per page: token totals, island count,
    cut/kept counts, and md5 of the cleaned text (byte-exact proof of the
    reconstruction).

    100 TB shape: both corpus-sized shuffles key on the 16-byte window
    md5 (dup_spans discipline — window TEXT never shuffles); the islands
    pass is a page-bounded window function (partitioned by url, never
    global); covered positions are MATERIALIZED once per row with one
    flatten(transform(...)) projection BEFORE the kept-token filter (the
    no-CSE rule — inside the filter lambda they would re-expand per
    token). The per-row cost of the kept filter is O(tokens · covered),
    both page-bounded."""
    from .queries import stage_pages
    p = spark.read.parquet(stage_pages(spark, sf)).select("url", "text")
    toks = F.filter(F.split(F.regexp_replace("text", r"\s+", " "), " "),
                    lambda x: x != F.lit(""))
    base = (p.select("url", toks.alias("toks"))
            .where(F.size("toks") >= _SPAN_W))
    n_win = ((F.size("toks") - _SPAN_W) / _SPAN_S + 1).cast("int")
    wins = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.struct(
            (i * _SPAN_S + 1).alias("s"),
            F.md5(F.concat_ws(" ", F.slice("toks", i * _SPAN_S + 1, _SPAN_W))
                  .cast("binary")).alias("w")))
    inst = (base.select("url", F.explode(wins).alias("x"))
            .select("url", F.col("x.s").alias("s"), F.col("x.w").alias("w")))
    keep = (inst.select("url", "w").distinct()
            .groupBy("w").agg(F.count("*").alias("df"),
                              F.min("url").alias("keeper")))
    cut = (inst.join(keep, "w")
           .where((F.col("df") >= 2) & (F.col("url") != F.col("keeper")))
           .select("url", "s", (F.col("s") + _SPAN_W - 1).alias("e")))
    w_ord = Window.partitionBy("url").orderBy("s", "e")
    prev_max = F.max("e").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1))
    isl = (cut
           .withColumn("ni", (F.col("s") > F.coalesce(prev_max, F.lit(-1))
                              + 1).cast("int"))
           .withColumn("isl", F.sum("ni").over(
               w_ord.rowsBetween(Window.unboundedPreceding, 0)))
           .groupBy("url", "isl")
           .agg(F.min("s").alias("s"), F.max("e").alias("e")))
    spans = (isl.groupBy("url")
             .agg(F.count("*").alias("n_islands"),
                  F.sum(F.col("e") - F.col("s") + 1).alias("cut_tokens"),
                  F.collect_list(F.struct("s", "e")).alias("spans")))
    empty_spans = F.array().cast("array<struct<s:int,e:int>>")
    joined = (base.join(spans, "url", "left")
              # materialize covered positions ONCE per row (no-CSE rule)
              .withColumn("covered", F.flatten(F.transform(
                  F.coalesce(F.col("spans"), empty_spans),
                  lambda sp: F.sequence(sp["s"], sp["e"])))))
    kept = F.filter(
        F.col("toks"),
        lambda x, i: ~F.array_contains(F.col("covered"), i + 1))
    return joined.select(
        "url",
        F.size("toks").cast("long").alias("total_tokens"),
        F.coalesce("n_islands", F.lit(0)).cast("long").alias("n_islands"),
        F.coalesce("cut_tokens", F.lit(0)).cast("long").alias("cut_tokens"),
        (F.size("toks") - F.coalesce("cut_tokens", F.lit(0)))
        .cast("long").alias("kept_tokens"),
        F.md5(F.concat_ws(" ", kept).cast("binary")).alias("cleaned_md5"))


def _dup_span_cut_sql() -> str:
    from .sources.pages import STAGE_PATH
    return f"""
WITH t AS (SELECT url,
             list_filter(string_split(regexp_replace(text, '\\s+', ' ', 'g'),
                                      ' '), x -> x <> '') AS toks
           FROM read_parquet('{STAGE_PATH}/*.parquet')),
b AS (SELECT url, toks FROM t WHERE len(toks) >= {_SPAN_W}),
inst AS (SELECT url, (i * {_SPAN_S} + 1) AS s,
           md5(array_to_string(
             toks[(i * {_SPAN_S} + 1):(i * {_SPAN_S} + {_SPAN_W})], ' ')) AS w
         FROM b, unnest(range(0, ((len(toks) - {_SPAN_W}) // {_SPAN_S}) + 1))
              AS u(i)),
keep AS (SELECT w, count(DISTINCT url) AS df, min(url) AS keeper
         FROM inst GROUP BY w),
cut AS (SELECT url, s, s + {_SPAN_W} - 1 AS e
        FROM inst JOIN keep USING (w)
        WHERE df >= 2 AND url <> keeper),
mrk AS (SELECT url, s, e,
          CASE WHEN s > coalesce(max(e) OVER (PARTITION BY url ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
               THEN 1 ELSE 0 END AS ni
        FROM cut),
num AS (SELECT url, s, e,
          sum(ni) OVER (PARTITION BY url ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        FROM mrk),
isl AS (SELECT url, isl, min(s) AS s, max(e) AS e FROM num GROUP BY 1, 2),
spans AS (SELECT url, count(*) AS n_islands, sum(e - s + 1) AS cut_tokens
          FROM isl GROUP BY url),
cov AS (SELECT url, u.p AS pos FROM isl, unnest(range(s, e + 1)) AS u(p)),
pos AS (SELECT url, u.i AS pos, toks[u.i] AS tok
        FROM b, unnest(range(1, len(toks) + 1)) AS u(i)),
kept AS (SELECT p.url, p.pos, p.tok FROM pos p
         LEFT JOIN cov c ON p.url = c.url AND p.pos = c.pos
         WHERE c.pos IS NULL),
cln AS (SELECT url, md5(string_agg(tok, ' ' ORDER BY pos)) AS cleaned_md5
        FROM kept GROUP BY url)
SELECT b.url, len(b.toks)::BIGINT AS total_tokens,
       coalesce(spans.n_islands, 0)::BIGINT AS n_islands,
       coalesce(spans.cut_tokens, 0)::BIGINT AS cut_tokens,
       (len(b.toks) - coalesce(spans.cut_tokens, 0))::BIGINT AS kept_tokens,
       coalesce(cln.cleaned_md5, md5('')) AS cleaned_md5
FROM b LEFT JOIN spans USING (url) LEFT JOIN cln USING (url)
"""


# ------------------------- benchmark decontamination (n-gram overlap)

_DECON_NGRAM = 3   # gram width (13 in GPT-3's filter; 3 at toy vocab scale)
_DECON_PROMPT = 8  # benchmark prompt = first N tokens of the sampled doc


def q_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: flag every document sharing at least one
    token {_DECON_NGRAM}-gram with a benchmark set (the GPT-3/Llama
    n-gram-overlap filter). The benchmark is synthesized deterministically
    — docs with doc_id % 17 == 3 contribute their first 8 tokens as a
    'benchmark prompt' — so the sampled docs flag themselves (they ARE in
    the corpus; that's the filter's point) and vocabulary overlap flags a
    nontrivial set of others. Output: every doc with its count of DISTINCT
    overlapping grams + the boolean flag.

    100 TB shape: the benchmark gram set is small by construction ->
    broadcast semi-ish join against the exploded per-doc distinct grams
    (no corpus shuffle), then one doc-keyed count agg. Per-doc grams are
    array_distinct'ed BEFORE the explode, so 'distinct overlapping grams'
    needs no countDistinct."""
    d = load(spark, sf, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    base = d.select("doc_id", toks.alias("toks"))

    def gram_arr(tcol):
        return F.when(
            F.size(tcol) >= _DECON_NGRAM,
            F.array_distinct(F.transform(
                F.sequence(F.lit(1), F.size(tcol) - (_DECON_NGRAM - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tcol, i + j)
                           for j in range(_DECON_NGRAM)]),
            ))).otherwise(F.array().cast("array<string>"))

    doc_grams = (base.select("doc_id", gram_arr(F.col("toks")).alias("gs"))
                 .select("doc_id", F.explode("gs").alias("g")))
    bench_grams = (base.where(F.col("doc_id") % 17 == 3)
                   .select(gram_arr(F.slice("toks", 1, _DECON_PROMPT))
                           .alias("gs"))
                   .select(F.explode("gs").alias("g")).distinct())
    hits = (doc_grams.join(F.broadcast(bench_grams), "g")
            .groupBy("doc_id").agg(F.count("*").alias("n_hit_grams")))
    n_hits = F.coalesce("n_hit_grams", F.lit(0)).cast("long")
    return (d.select("doc_id").join(hits, "doc_id", "left")
            .select("doc_id", n_hits.alias("n_hit_grams"),
                    (n_hits > 0).alias("contaminated")))


_SQL_DECONTAMINATE = f"""
WITH t AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents),
dg AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+{_DECON_NGRAM - 1}],
                                               ' ') AS g
       FROM t, unnest(range(1, len(toks) - {_DECON_NGRAM - 2})) AS u(i)
       WHERE len(toks) >= {_DECON_NGRAM}),
bp AS (SELECT doc_id, toks[1:{_DECON_PROMPT}] AS toks FROM t
       WHERE doc_id % 17 = 3),
bg AS (SELECT DISTINCT array_to_string(toks[i:i+{_DECON_NGRAM - 1}],
                                       ' ') AS g
       FROM bp, unnest(range(1, len(toks) - {_DECON_NGRAM - 2})) AS u(i)
       WHERE len(toks) >= {_DECON_NGRAM}),
h AS (SELECT doc_id, count(*)::BIGINT AS n_hit_grams
      FROM dg JOIN bg USING (g) GROUP BY doc_id)
SELECT d.doc_id, coalesce(h.n_hit_grams, 0)::BIGINT AS n_hit_grams,
       coalesce(h.n_hit_grams, 0) > 0 AS contaminated
FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id
"""


# --------------- DSIR-style hashed importance weights (Xie et al. 2023)

_DSIR_B = 256        # hashed feature buckets
_DSIR_Q = 1_000_000  # likelihood-ratio quantization denominator


def q_dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Data Selection via Importance Resampling, integer-exact variant:
    rank documents by how target-like their hashed unigram distribution
    is. Tokens hash into {_DSIR_B} buckets (md5-derived, portable); the
    TARGET distribution comes from the same deterministic benchmark
    prompts as `decontaminate` (doc_id % 17 == 3, first 8 tokens); each
    bucket gets a QUANTIZED likelihood ratio
    floor((target_count+1) * 1e6 / (raw_count+1)) — add-one smoothing as
    in the paper, but integer division instead of log-space floats so
    both engines agree bit-for-bit. A document's score is the sum of its
    tokens' bucket ratios (token multiplicity counts, as in DSIR); the
    top 20% by (score desc, doc_id) are selected.

    100 TB shape: the ratio table is {_DSIR_B} rows -> broadcast to the
    token stream; per-doc sum is one map-side-combined agg. The exact
    global top-20% rank here is oracle-pinnable; at scale the cutoff
    comes from percentile_approx on the score (the ccnet_buckets_approx
    pattern) and selection becomes a pure predicate."""
    d = load(spark, sf, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    base = d.select("doc_id", toks.alias("toks"))
    bucket = lambda c: F.conv(F.substring(F.md5(c), 1, 7), 16, 10) % _DSIR_B
    tok = (base.select("doc_id", F.explode("toks").alias("t"))
           .select("doc_id", bucket(F.col("t")).cast("long").alias("b")))
    raw = tok.groupBy("b").agg(F.count("*").alias("cr"))
    tgt = (base.where(F.col("doc_id") % 17 == 3)
           .select(F.explode(F.slice("toks", 1, _DECON_PROMPT)).alias("t"))
           .select(bucket(F.col("t")).cast("long").alias("b"))
           .groupBy("b").agg(F.count("*").alias("ct")))
    ratio = (raw.join(tgt, "b", "left")
             .select("b", _idiv((F.coalesce("ct", F.lit(0)) + 1) * _DSIR_Q,
                                F.col("cr") + 1).alias("rq")))
    scores = (tok.join(F.broadcast(ratio), "b")
              .groupBy("doc_id").agg(F.sum("rq").alias("dsir_score")))
    n_sel = _idiv(F.count("*").over(Window.partitionBy()), F.lit(5))
    rn = F.row_number().over(
        Window.partitionBy().orderBy(F.desc("dsir_score"), "doc_id"))
    return (d.select("doc_id").join(scores, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("dsir_score", F.lit(0)).cast("long")
                    .alias("dsir_score"))
            .select("doc_id", "dsir_score",
                    (rn <= n_sel).alias("selected")))


_SQL_DSIR_WEIGHTS = f"""
WITH t AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents),
tok AS (SELECT doc_id,
          ('0x' || substr(md5(u.t), 1, 7))::BIGINT % {_DSIR_B} AS b
        FROM t, unnest(toks) AS u(t)),
raw AS (SELECT b, count(*) AS cr FROM tok GROUP BY b),
tgt AS (SELECT ('0x' || substr(md5(u.t), 1, 7))::BIGINT % {_DSIR_B} AS b,
               count(*) AS ct
        FROM (SELECT toks[1:{_DECON_PROMPT}] AS toks FROM t
              WHERE doc_id % 17 = 3), unnest(toks) AS u(t)
        GROUP BY b),
ratio AS (SELECT raw.b,
            ((coalesce(tgt.ct, 0) + 1) * {_DSIR_Q} // (raw.cr + 1)) AS rq
          FROM raw LEFT JOIN tgt USING (b)),
sc AS (SELECT tok.doc_id, sum(ratio.rq)::BIGINT AS dsir_score
       FROM tok JOIN ratio USING (b) GROUP BY tok.doc_id),
alldocs AS (SELECT d.doc_id, coalesce(sc.dsir_score, 0)::BIGINT AS dsir_score
            FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id)
SELECT doc_id, dsir_score,
       (row_number() OVER (ORDER BY dsir_score DESC, doc_id)
        <= (SELECT count(*) // 5 FROM alldocs)) AS selected
FROM alldocs
"""


# --------------------------- domain-mix rebalancing (Pile/Dolma style)

def _idiv(a, b):
    """Exact integer division on long columns: (a - a % b) is exactly
    divisible by b, so the double division returns the exact integer
    quotient (all values < 2^53). Spark's `/` alone is DOUBLE division —
    floor() of a misrounded quotient can disagree with DuckDB's `//`."""
    return ((a - a % b) / b).cast("long")


def q_domain_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Domain-mix rebalancing: each source gets an integer target weight
    t_i (derived from its id: (suffix % 4) + 1 — a curated-vs-web tiering
    stand-in), and the mix keeps the largest corpus every source can
    supply its share of: K = min_i floor(c_i * T / t_i), then exactly
    floor(K * t_i / T) docs per source chosen by hash order (md5 rank,
    doc_id tie-break — the deterministic equivalent of uniform sampling).
    Output: every doc with its hash rank and selected flag; the selected
    counts realize the target mix exactly (up to floor).

    100 TB shape: per-source counts are one map-side-combined agg over a
    handful of keys; the K scalar and per-source quotas broadcast back
    (dim-sized); selection is a rank-vs-quota predicate inside one
    per-source window (at extreme scale the rank becomes a hash-threshold
    predicate with a quantile-estimated cutoff — no global sort either
    way)."""
    d = load(spark, sf, "documents").select("doc_id", "source")
    t_w = (F.regexp_extract("source", r"(\d+)$", 1).cast("long") % 4 + 1)
    counts = (d.groupBy("source").agg(F.count("*").alias("c"))
              .select("source", "c", t_w.alias("t")))
    totals = counts.agg(F.sum("t").alias("tt"))
    k = (counts.crossJoin(F.broadcast(totals))
         .agg(F.min(_idiv(F.col("c") * F.col("tt"), F.col("t"))).alias("k"),
              F.max("tt").alias("tt")))
    quota = (counts.crossJoin(F.broadcast(k))
             .select("source", _idiv(F.col("k") * F.col("t"), F.col("tt"))
                     .alias("quota")))
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(F.md5(F.col("doc_id")
                                                   .cast("string")),
                                             "doc_id"))
    return (d.withColumn("rank_in_source", rn.cast("long"))
            .join(F.broadcast(quota), "source")
            .select("doc_id", "source", "rank_in_source",
                    (F.col("rank_in_source") <= F.col("quota"))
                    .alias("selected")))


_SQL_DOMAIN_MIX = """
WITH c AS (SELECT source, count(*) AS c,
             (regexp_extract(source, '(\\d+)$', 1)::BIGINT % 4 + 1) AS t
           FROM documents GROUP BY source),
k AS (SELECT sum(t) AS tt, min(c * (SELECT sum(t) FROM c) // t) AS k FROM c),
quota AS (SELECT source, (k.k * c.t // k.tt)::BIGINT AS quota
          FROM c, k),
r AS (SELECT doc_id, source,
        row_number() OVER (PARTITION BY source
                           ORDER BY md5(doc_id::VARCHAR), doc_id)::BIGINT
        AS rank_in_source
      FROM documents)
SELECT r.doc_id, r.source, r.rank_in_source,
       (r.rank_in_source <= quota.quota) AS selected
FROM r JOIN quota USING (source)
"""


# ----------------- model-based quality filtering (fastText-style linear)

_QC_B = 4096  # hashed feature buckets = rows of the frozen "model" table
_QC_W = 1000  # integer weight range [-W, W]


def q_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """Model-based quality filtering, fastText inference shape (the
    GPT-3/CCNet/LLaMA web-pipeline stage: a trained linear classifier over
    hashed bag-of-words scores every page): features are hashed unigrams
    PLUS word-bigrams (fastText wordNgrams=2) with token multiplicity; the
    MODEL is a (bucket -> integer weight) side table — synthesized
    deterministically here from md5 of the bucket id, standing in for
    trained parameters, loaded exactly the way a real trained table would
    be; a document's score is the exact integer sum of its feature
    weights and keep = n_feats > 0 AND score >= 0, which equals the sign
    of the mean-pooled linear score (dividing by n_feats cannot change
    the sign — so the decision is integer-exact with no float division).

    100 TB shape: the model table is {_QC_B} rows -> broadcast join onto
    the exploded feature stream (no corpus-sized shuffle for the lookup);
    the per-doc sum partial-aggregates map-side; ONE shuffle keyed by
    doc_id."""
    d = load(spark, sf, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    base = d.select("doc_id", toks.alias("toks"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.concat_ws(" ", F.element_at("toks", i),
                              F.element_at("toks", i + F.lit(1))))
    feats = F.concat(
        F.col("toks"),
        F.when(F.size("toks") >= 2, bigrams)
        .otherwise(F.array().cast("array<string>")))
    ftok = (base.select("doc_id", feats.alias("feats"))
            .select("doc_id", F.explode("feats").alias("f"))
            .select("doc_id",
                    (F.conv(F.substring(F.md5(F.col("f")), 1, 7), 16, 10)
                     .cast("long") % _QC_B).alias("b")))
    model = spark.range(_QC_B).select(
        F.col("id").alias("b"),
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 7),
                16, 10).cast("long") % (2 * _QC_W + 1) - _QC_W).alias("w"))
    scored = (ftok.join(F.broadcast(model), "b")
              .groupBy("doc_id")
              .agg(F.sum("w").alias("qc_score"),
                   F.count("*").alias("n_feats")))
    return (d.select("doc_id").join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("qc_score", F.lit(0)).cast("long")
                    .alias("qc_score"),
                    F.coalesce("n_feats", F.lit(0)).cast("long")
                    .alias("n_feats"))
            .withColumn("keep", (F.col("n_feats") > 0)
                        & (F.col("qc_score") >= 0)))


_SQL_QUALITY_CLASSIFIER = f"""
WITH t AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents),
fe AS (SELECT doc_id,
         list_concat(toks,
           CASE WHEN len(toks) >= 2 THEN
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i + 1])
           ELSE []::VARCHAR[] END) AS feats
       FROM t),
ftok AS (SELECT doc_id,
           ('0x' || substr(md5(u.f), 1, 7))::BIGINT % {_QC_B} AS b
         FROM fe, unnest(feats) AS u(f)),
model AS (SELECT r.i AS b,
            ('0x' || substr(md5(r.i::VARCHAR), 1, 7))::BIGINT
              % {2 * _QC_W + 1} - {_QC_W} AS w
          FROM range(0, {_QC_B}) AS r(i)),
sc AS (SELECT doc_id, sum(w)::BIGINT AS qc_score,
              count(*)::BIGINT AS n_feats
       FROM ftok JOIN model USING (b) GROUP BY doc_id)
SELECT d.doc_id, coalesce(sc.qc_score, 0)::BIGINT AS qc_score,
       coalesce(sc.n_feats, 0)::BIGINT AS n_feats,
       (coalesce(sc.n_feats, 0) > 0 AND coalesce(sc.qc_score, 0) >= 0)
         AS keep
FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
"""


# ----------------- intra-document repeated-line removal (C4 shape)


def q_intra_line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """WITHIN-document repeated-line removal (the C4/Gopher intra-page
    boilerplate rule — distinct from `line_dedup`, which drops lines by
    CORPUS-wide frequency): keep only the FIRST occurrence of each line
    inside a page, re-assemble the kept text in order. The staged pages
    have no natural intra-page repeats, so the input is derived by
    appending each page's own first line (same expression in both
    engines) — every page then has >= 1 in-page duplicate and the oracle
    hash proves both the drop decisions and the byte-exact re-join.

    100 TB shape: first-occurrence detection is an algebraic min(pos)
    window partitioned by (url, line) — page-bounded partitions, no
    global sort — then one per-page re-aggregation; both exchanges key on
    url-prefixed keys. No corpus-wide state at all (this rule is
    embarrassingly page-parallel; it shuffles only because the line
    stream is exploded — inside the fused pipeline the same rule runs
    shuffle-free per Arrow batch)."""
    from pyspark.sql import Window
    from .queries import stage_pages
    p = spark.read.parquet(stage_pages(spark, sf)).select("url", "text")
    aug = p.select("url", F.concat_ws(
        "\n", "text",
        F.element_at(F.split("text", "\n"), 1)).alias("text"))
    lines = aug.select(
        "url", F.posexplode(F.split("text", "\n")).alias("pos", "line"))
    first = lines.withColumn(
        "min_pos", F.min("pos").over(Window.partitionBy("url", "line")))
    kept = F.when(F.col("pos") == F.col("min_pos"),
                  F.struct("pos", "line"))
    return (first.groupBy("url").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("pos") != F.col("min_pos"), 1).otherwise(0))
        .alias("n_dropped"),
        F.concat_ws("\n", F.transform(
            F.array_sort(F.collect_list(kept)),  # nulls skipped
            lambda s: s["line"])).alias("text_kept")))


def _intra_line_dedup_sql() -> str:
    from .sources.pages import STAGE_PATH
    return f"""
WITH s0 AS (SELECT url, text || chr(10) || string_split(text, chr(10))[1]
              AS text
            FROM read_parquet('{STAGE_PATH}/*.parquet')),
s AS (SELECT url, string_split(text, chr(10)) AS ls FROM s0),
l AS (SELECT url, i AS pos, ls[i] AS line
      FROM s, unnest(range(1, len(ls) + 1)) AS u(i)),
m AS (SELECT url, pos, line,
        min(pos) OVER (PARTITION BY url, line) AS min_pos
      FROM l)
SELECT url, count(*)::BIGINT AS n_lines,
       sum(CASE WHEN pos <> min_pos THEN 1 ELSE 0 END)::BIGINT
         AS n_dropped,
       coalesce(string_agg(CASE WHEN pos = min_pos THEN line END, chr(10)
                           ORDER BY pos), '') AS text_kept
FROM m GROUP BY url
"""


# ----------------- MinHash fuzzy dedup, END-TO-END (GPT-3/Gopher shape)

_MHD_MIN_MATCH = 8  # keep pairs agreeing on >= 8/16 signature slots


def q_minhash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """The CANONICAL fuzzy-dedup pipeline end-to-end in one query —
    shingle -> MinHash signatures -> LSH band buckets -> candidate pairs
    -> signature-agreement filter (>= {mm}/16 slots, est Jaccard 0.5) ->
    connected components (large-star/small-star) -> keep-lowest-id
    representative per cluster. This is the GPT-3/Gopher document-dedup
    stage a user would actually run; the building blocks (`minhash_md5`,
    `dedup_components`) are each value-proven separately, and here the
    COMPOSITION is value-proven too: the DuckDB twin chains the minhash
    CTE stack into the same recursive-CTE closure.

    100 TB shape: inherits the pieces' plans verbatim — shuffle-free
    signature fold, bucketed band join (never cross-product), O(log n)
    star rounds — plus one final left join of the doc universe against
    the component labels. No new scale surface."""
    from .operators.components import connected_components_star
    from .operators.dedup import minhash_md5_pairs
    d = load(spark, sf, "documents")
    pairs = (minhash_md5_pairs(
        d.repartition(spark.sparkContext.defaultParallelism),
        k=16, bands=4, n=3)
        .where(F.col("n_match") >= _MHD_MIN_MATCH))
    comp = connected_components_star(pairs.select("id_a", "id_b"),
                                     src="id_a", dst="id_b",
                                     vertices=d.select("doc_id"))
    return comp.select(F.col("id").alias("doc_id"), "component",
                       (F.col("id") == F.col("component")).alias("is_rep"))


q_minhash_dedup.__doc__ = q_minhash_dedup.__doc__.format(mm=_MHD_MIN_MATCH)


def _minhash_dedup_sql() -> str:
    # the proven minhash_md5 CTE stack (everything before its final
    # SELECT) feeding the proven recursive-closure tail
    base = _minhash_md5_sql()
    head, _, _tail = base.rpartition("SELECT id_a, id_b, n_match")
    assert head, "minhash_md5 SQL shape changed"
    return head.rstrip() + f""",
pairs AS (
  SELECT id_a, id_b FROM m WHERE n_match >= {_MHD_MIN_MATCH}),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (
  WITH RECURSIVE r(a, b) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT r.a, e.b FROM r JOIN edges e ON r.b = e.a)
  SELECT a, min(b) AS component FROM r GROUP BY a)
SELECT a AS doc_id, component::BIGINT AS component,
       (a = component) AS is_rep
FROM reach
"""


# ----------------- BPE tokenizer TRAINING: round-1 pair counting


def q_bpe_pair_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer TRAINING, round 1 of BPE (Sennrich et al. 2016): count
    adjacent character pairs over the corpus word-frequency dictionary
    and flag the argmax merge (ties -> lexicographically smallest pair).
    This is the stage that actually dominates tokenizer training at
    corpus scale; the inference-side counterpart (`token_count_bpe`)
    already exists. Pair count = sum over distinct words of
    word_freq * (occurrences of the pair inside the word) — exact
    integers end to end.

    100 TB shape: the word-frequency dict is the classic first shuffle
    (map-side combining word count — the token stream never shuffles
    raw); pairs then explode from the DICT (vocabulary-sized, orders of
    magnitude smaller than the corpus) into one more map-side-combined
    hash agg. The argmax is a single-row broadcast join, not a sort."""
    d = load(spark, sf, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    words = (d.select(F.explode(toks).alias("w"))
             .groupBy("w").agg(F.count("*").alias("freq")))
    chars = F.split(F.col("w"), "")
    pairs_in_word = F.transform(
        F.sequence(F.lit(1), F.size(chars) - 1),
        lambda i: F.concat(F.element_at(chars, i),
                           F.element_at(chars, i + F.lit(1))))
    pair_rows = (words.where(F.length("w") >= 2)
                 .select("freq", F.explode(pairs_in_word).alias("pair"))
                 .groupBy("pair").agg(F.sum("freq").alias("cnt")))
    # deterministic argmax: (max cnt) then (min pair at that cnt), both
    # plain aggregates — no reliance on engine-specific max_by tie rules
    mx = pair_rows.agg(F.max("cnt").alias("mx"))
    top = (pair_rows.join(F.broadcast(mx), F.col("cnt") == F.col("mx"))
           .agg(F.min("pair").alias("best_pair")))
    return (pair_rows.join(F.broadcast(top))
            .select("pair", "cnt",
                    (F.col("pair") == F.col("best_pair")).alias("is_merge")))


_SQL_BPE_PAIR_COUNTS = f"""
WITH words AS (
  SELECT u.w AS w, count(*)::BIGINT AS freq
  FROM documents, unnest({_DOC_TOKS}) AS u(w)
  GROUP BY u.w),
pr AS (
  SELECT w[i:i+1] AS pair, sum(freq)::BIGINT AS cnt
  FROM words, unnest(range(1, length(w))) AS r(i)
  WHERE length(w) >= 2
  GROUP BY 1),
top AS (SELECT min(pair) AS best_pair FROM pr
        WHERE cnt = (SELECT max(cnt) FROM pr))
SELECT pr.pair, pr.cnt, (pr.pair = top.best_pair) AS is_merge
FROM pr, top
"""


# ----------------- BPE tokenizer TRAINING: the iterated merge loop

_BPE_MERGE_ITERS = 3
# Symbol sentinels: every symbol is stored wrapped, '\x01sym\x02', so a
# word is the concatenation of its wrapped symbols and applying a merge
# (a, b) is ONE plain string replace of '\x01a\x02\x01b\x02' with
# '\x01ab\x02' — both engines' replace() scans left-to-right and never
# re-matches inside a replacement, which IS BPE's greedy non-overlapping
# merge order (e.g. 'aaa' + merge (a,a) -> ['aa','a'], never ['a','aa']).
# Adjacent wrapped symbols share no characters, so consecutive merge
# sites all fire in one pass (the classic space-delimited encoding
# misses every other site because matches share the delimiter). The
# sentinels are absent from the corpus by the generator's charset; words
# containing them are filtered identically in both engines regardless.
_BPE_L = "\x01"
_BPE_R = "\x02"


def q_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer TRAINING, the real iterated loop (Sennrich et al. 2016
    §3 — the round-1-only `bpe_pair_counts` closed out, VERDICT r4 #2):
    {iters} unrolled merge+recount iterations over the corpus word-
    frequency dictionary. Each iteration counts adjacent symbol pairs
    (weighted by word frequency), picks the argmax merge (ties ->
    lexicographically smallest pair), APPLIES it to every word, and
    recounts on the merged symbols. Output: every pair count of every
    iteration with its is_merge flag — the full training trace, so hash
    parity proves the recount after each applied merge, not just round 1.

    100 TB shape: the corpus-sized work is the ONE word-frequency shuffle
    (map-side combined); every iteration after that runs on the
    vocabulary-sized dict — pairs explode from the dict into a map-side-
    combined hash agg, the argmax merge reaches words/pairs as a 1-row
    broadcast, and the merge itself is a shuffle-free per-row string
    replace. Raw tokens never shuffle again; the unrolled-CTE DuckDB twin
    replays every iteration bit-for-bit (the pagerank/classifier_train
    oracle pattern)."""
    out, _ = _bpe_train(spark, sf)
    d_col = F.call_function("replace", F.col("pair"),
                            F.lit(_BPE_R + _BPE_L), F.lit(" "))
    return (out.withColumn("d", d_col)
            .select("iter",
                    F.col("d").substr(F.lit(2), F.length("d") - F.lit(2))
                    .alias("pair"),
                    "cnt", "is_merge"))


def _bpe_train(spark: SparkSession, sf: str) -> tuple[DataFrame, DataFrame]:
    """Shared BPE training loop: returns (trace, words_after_merges) —
    trace has one row per (iter, pair) with count + is_merge; words is the
    dictionary in sentinel-wrapped symbol form after all merges applied."""
    d = load(spark, sf, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    words = (d.select(F.explode(toks).alias("w"))
             .where(~F.col("w").contains(_BPE_L)
                    & ~F.col("w").contains(_BPE_R))
             .groupBy("w").agg(F.count("*").alias("freq"))
             .select(F.regexp_replace(
                 "w", "(.)", _BPE_L + "$1" + _BPE_R).alias("ws"), "freq")
             # ONE corpus-sized aggregation total: the dict materializes
             # here (vocab-sized) and every iteration reads it, never the
             # token stream again
             .localCheckpoint())
    out = None
    for it in range(1, _BPE_MERGE_ITERS + 1):
        syms = F.split(F.expr("substring(ws, 2, length(ws) - 2)"),
                       _BPE_R + _BPE_L)
        wsyms = (words.select("freq", syms.alias("ss"))
                 .where(F.size("ss") >= 2))
        pairs = F.transform(
            F.sequence(F.lit(1), F.size("ss") - 1),
            lambda i: F.concat(
                F.lit(_BPE_L), F.element_at(F.col("ss"), i),
                F.lit(_BPE_R + _BPE_L),
                F.element_at(F.col("ss"), i + F.lit(1)),
                F.lit(_BPE_R)))
        pr = (wsyms.select("freq", F.explode(pairs).alias("pair"))
              .groupBy("pair").agg(F.sum("freq").alias("cnt")))
        # vocab-sized materialization (the dedup_components lineage
        # discipline): pr is referenced by mx/best/trace and feeds the
        # next iteration's dict — without truncation each reference
        # replays the whole prior-iteration stack (~3^k branches)
        pr = pr.localCheckpoint()
        mx = pr.agg(F.max("cnt").alias("mx"))
        best = (pr.join(F.broadcast(mx), F.col("cnt") == F.col("mx"))
                .agg(F.min("pair").alias("best")))
        out_it = (pr.join(F.broadcast(best))
                  .select(F.lit(it).alias("iter"), "pair", "cnt",
                          (F.col("pair") == F.col("best")).alias("is_merge")))
        out = out_it if out is None else out.unionAll(out_it)
        words = (words.join(F.broadcast(best))
                 .select(F.call_function(
                     "replace", F.col("ws"), F.col("best"),
                     F.call_function("replace", F.col("best"),
                                     F.lit(_BPE_R + _BPE_L), F.lit("")))
                     .alias("ws"), "freq")
                 .localCheckpoint())
    return out, words


def q_bpe_vocab(spark: SparkSession, sf: str) -> DataFrame:
    """The tokenizer ARTIFACT the training loop exists to produce: the
    subword vocabulary after the {iters} learned merges are applied to
    the whole word dictionary — per symbol, its corpus frequency (sum of
    word frequencies weighted by in-word occurrences) and the number of
    distinct dictionary words it appears in. This is the encode-side
    table a deployment ships; `token_count_bpe` is its inference twin.

    100 TB shape: identical to `bpe_merges` (one corpus shuffle for the
    word dict, vocabulary-sized work after), plus one final explode +
    map-side-combined agg over the merged dict."""
    _, words = _bpe_train(spark, sf)
    syms = F.split(F.expr("substring(ws, 2, length(ws) - 2)"),
                   _BPE_R + _BPE_L)
    return (words.select("ws", "freq", F.explode(syms).alias("token"))
            .groupBy("token")
            .agg(F.sum("freq").alias("freq"),
                 F.countDistinct("ws").alias("n_words")))


def q_bpe_encode_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-scale TOKENIZATION with the trained tokenizer — the
    inference step a pipeline runs after `bpe_merges`: every document's
    words are encoded with the learned merges and the per-document
    sequence length is emitted (n_words, n_subword_tokens, compression
    ratio vs characters). This is the number a pretraining data plan is
    costed in.

    100 TB shape: the trained ENCODE DICT (word -> subword count) is
    vocabulary-sized, so it broadcasts legitimately onto the corpus token
    stream — per-doc aggregation then map-side combines; the corpus
    shuffles once, on doc_id. Integer-exact end to end, so the DuckDB
    twin replays training + encoding bit-for-bit."""
    _, words = _bpe_train(spark, sf)
    syms = F.split(F.expr("substring(ws, 2, length(ws) - 2)"),
                   _BPE_R + _BPE_L)
    dict_df = words.select(
        F.array_join(syms, "").alias("w"),  # symbols concat == the word
        F.size(syms).alias("n_sub"))
    d = load(spark, sf, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    tok_rows = d.select("doc_id", F.explode(toks).alias("w"))
    return (tok_rows.join(F.broadcast(dict_df), "w")  # dict is vocab-sized
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_words"),
                 F.sum("n_sub").alias("n_subword_tokens"),
                 F.sum(F.length("w")).alias("n_chars")))


q_bpe_merges.__doc__ = q_bpe_merges.__doc__.format(iters=_BPE_MERGE_ITERS)
q_bpe_vocab.__doc__ = q_bpe_vocab.__doc__.format(iters=_BPE_MERGE_ITERS)


def _bpe_cte_stack() -> tuple[str, str]:
    """The unrolled training CTE stack shared by the two BPE twins:
    returns (cte_body, final_words_cte_name)."""
    l_, r_ = _BPE_L, _BPE_R
    steps, prev = [], "w0"
    for k in range(1, _BPE_MERGE_ITERS + 1):
        steps.append(f"""
sy{k} AS (SELECT freq, string_split(ws[2:length(ws)-1], '{r_}{l_}') AS ss
          FROM {prev}),
pr{k} AS (SELECT '{l_}' || ss[i] || '{r_}{l_}' || ss[i+1] || '{r_}' AS pair,
                 sum(freq)::BIGINT AS cnt
          FROM sy{k}, unnest(range(1, len(ss))) AS rr(i)
          GROUP BY 1),
b{k} AS (SELECT min(pair) AS best FROM pr{k}
         WHERE cnt = (SELECT max(cnt) FROM pr{k})),
o{k} AS (SELECT {k} AS iter, pair, cnt, pair = best AS is_merge
         FROM pr{k}, b{k}),
w{k} AS (SELECT replace(ws, best, replace(best, '{r_}{l_}', '')) AS ws, freq
         FROM {prev}, b{k})""")
        prev = f"w{k}"
    body = f"""w0 AS (
  SELECT regexp_replace(u.w, '(.)', '{l_}\\1{r_}', 'g') AS ws,
         count(*)::BIGINT AS freq
  FROM documents, unnest({_DOC_TOKS}) AS u(w)
  WHERE strpos(u.w, '{l_}') = 0 AND strpos(u.w, '{r_}') = 0
  GROUP BY 1),
{",".join(steps)}"""
    return body, prev


def _bpe_merges_sql() -> str:
    l_, r_ = _BPE_L, _BPE_R
    body, _ = _bpe_cte_stack()
    union = " UNION ALL ".join(
        f"SELECT * FROM o{k}" for k in range(1, _BPE_MERGE_ITERS + 1))
    return f"""
WITH {body},
uu AS ({union}),
dd AS (SELECT iter, replace(pair, '{r_}{l_}', ' ') AS d, cnt, is_merge
       FROM uu)
SELECT iter, d[2:length(d)-1] AS pair, cnt, is_merge
FROM dd
"""


def _bpe_vocab_sql() -> str:
    l_, r_ = _BPE_L, _BPE_R
    body, final = _bpe_cte_stack()
    return f"""
WITH {body},
sy AS (SELECT ws, freq, string_split(ws[2:length(ws)-1], '{r_}{l_}') AS ss
       FROM {final})
SELECT u.s AS token, sum(freq)::BIGINT AS freq,
       count(DISTINCT ws)::BIGINT AS n_words
FROM sy, unnest(ss) AS u(s)
GROUP BY 1
"""


def _bpe_encode_docs_sql() -> str:
    l_, r_ = _BPE_L, _BPE_R
    body, final = _bpe_cte_stack()
    return f"""
WITH {body},
dc AS (SELECT array_to_string(ss, '') AS w, len(ss)::BIGINT AS n_sub
       FROM (SELECT string_split(ws[2:length(ws)-1], '{r_}{l_}') AS ss
             FROM {final})),
tk AS (SELECT doc_id, u.w AS w
       FROM documents, unnest({_DOC_TOKS}) AS u(w))
SELECT doc_id, count(*)::BIGINT AS n_words,
       sum(n_sub)::BIGINT AS n_subword_tokens,
       sum(length(w))::BIGINT AS n_chars
FROM tk JOIN dc USING (w)
GROUP BY doc_id
"""


def q_bpe_fertility(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer FERTILITY by language — the multilingual-pipeline metric
    that decides whether a trained tokenizer under-serves a language
    (fertility = subword tokens per word; high fertility inflates both
    training cost and effective context for that language — the standard
    multilingual-tokenizer diagnostic, e.g. XLM-R's per-language
    fertility tables). Reuses the shared `_bpe_train` loop, then rolls
    the encoded corpus up per `lang` instead of per doc: word/subword/
    char totals plus ppm-quantized fertility and chars-per-token (integer
    DIV so both engines agree bit-for-bit; int64 headroom: sums * 10^6
    stay under 2^63 up to ~9·10^12 corpus tokens — beyond that, quantize
    coarser or use DECIMAL, the ivf_kmeans pattern).

    100 TB shape: identical to `bpe_encode_docs` — the vocab-sized encode
    dict broadcasts onto the token stream, the per-lang agg map-side
    combines to a LANGUAGE-cardinality result (dozens of rows however
    large the corpus)."""
    _, words = _bpe_train(spark, sf)
    syms = F.split(F.expr("substring(ws, 2, length(ws) - 2)"),
                   _BPE_R + _BPE_L)
    dict_df = words.select(
        F.array_join(syms, "").alias("w"),
        F.size(syms).alias("n_sub"))
    d = load(spark, sf, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    tok_rows = d.select("lang", F.explode(toks).alias("w"))
    return (tok_rows.join(F.broadcast(dict_df), "w")  # dict is vocab-sized
            .groupBy("lang")
            .agg(F.count("*").alias("n_words"),
                 F.sum("n_sub").alias("n_subword_tokens"),
                 F.sum(F.length("w")).alias("n_chars"))
            .select("lang", "n_words", "n_subword_tokens", "n_chars",
                    F.expr("n_subword_tokens * 1000000L DIV n_words")
                    .alias("fertility_ppm"),
                    F.expr("n_chars * 1000000L DIV n_subword_tokens")
                    .alias("chars_per_token_ppm")))


def _bpe_fertility_sql() -> str:
    l_, r_ = _BPE_L, _BPE_R
    body, final = _bpe_cte_stack()
    return f"""
WITH {body},
dc AS (SELECT array_to_string(ss, '') AS w, len(ss)::BIGINT AS n_sub
       FROM (SELECT string_split(ws[2:length(ws)-1], '{r_}{l_}') AS ss
             FROM {final})),
tk AS (SELECT lang, u.w AS w
       FROM documents, unnest({_DOC_TOKS}) AS u(w))
SELECT lang, count(*)::BIGINT AS n_words,
       sum(n_sub)::BIGINT AS n_subword_tokens,
       sum(length(w))::BIGINT AS n_chars,
       (sum(n_sub) * 1000000 // count(*))::BIGINT AS fertility_ppm,
       (sum(length(w)) * 1000000 // sum(n_sub))::BIGINT
         AS chars_per_token_ppm
FROM tk JOIN dc USING (w)
GROUP BY lang
"""


# ----------------- cross-document sequence packing (pretraining prep)

_PACK_CAP = 256  # tokens per training sequence


def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-document SEQUENCE PACKING plan — the GPT-style pretraining
    prep that concatenates documents in id order and splits every
    {cap} tokens: each doc gets its global token offset (an EXCLUSIVE
    prefix sum over per-doc token counts), the training sequence it
    starts in (bin = offset div {cap}) and its position within that
    sequence. Zero-token docs are excluded in both engines.

    100 TB shape: the offset comes from the repo's 3-level super-chunked
    hierarchical prefix sum (`operators/tpos.doc_offsets_hierarchical`,
    gap=0) — every window chunk-bounded for the full int64 id range, no
    single-task global sort anywhere; the oracle replays it as a plain
    SQL window sum, which is exactly the equivalence the operator's own
    tests pin."""
    from .operators.tpos import doc_offsets_hierarchical
    d = load(spark, sf, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    tok_rows = d.select(
        "doc_id", F.posexplode(toks).alias("pos", "tok"))
    offs = doc_offsets_hierarchical(tok_rows, gap=0)
    counts = tok_rows.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    return (counts.join(offs, "doc_id")
            .select("doc_id", "n_tok",
                    F.col("tpos_offset").alias("seq_offset"),
                    F.floor(F.col("tpos_offset") / _PACK_CAP).cast("long")
                    .alias("bin"),
                    (F.col("tpos_offset") % _PACK_CAP).alias("bin_pos")))


q_pack_sequences.__doc__ = q_pack_sequences.__doc__.format(cap=_PACK_CAP)

_SQL_PACK_SEQUENCES = f"""
WITH c AS (SELECT doc_id, len({_DOC_TOKS})::BIGINT AS n_tok
           FROM documents
           WHERE len({_DOC_TOKS}) > 0),
o AS (SELECT doc_id, n_tok,
        coalesce(sum(n_tok) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
          AS seq_offset
      FROM c)
SELECT doc_id, n_tok, seq_offset,
       (seq_offset // {_PACK_CAP})::BIGINT AS bin,
       (seq_offset % {_PACK_CAP})::BIGINT AS bin_pos
FROM o
"""


def q_pack_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """MATERIALIZED packed training sequences — the shard a trainer
    actually reads (VERDICT r4 item #4: `pack_sequences` emitted only the
    offsets/bins map). Every token gets its global position gpos =
    doc_offset + pos from the same 3-level hierarchical prefix sum
    (gap=0); the {cap}-token training sequence is bin = gpos div {cap};
    each bin emits its token count and the in-order token sequence
    (space-joined, so hash parity is byte-exact on the full sequence
    content and order).

    100 TB shape: ONE shuffle on the bin key; collect_list is bounded by
    the {cap}-token cap per bin (never a whole-document or whole-corpus
    array), the in-bin sort is the bounded array_sort of <= {cap} structs
    keyed by the unique gpos, and the offsets join is the plain size-aware
    doc-keyed join (never a doc-dim broadcast hint)."""
    from .operators.tpos import doc_offsets_hierarchical
    d = load(spark, sf, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    tok_rows = d.select(
        "doc_id", F.posexplode(toks).alias("pos", "tok"))
    offs = doc_offsets_hierarchical(tok_rows, gap=0)
    g = (tok_rows.join(offs, "doc_id")
         .select((F.col("tpos_offset") + F.col("pos")).alias("gpos"), "tok"))
    return (g.groupBy(F.expr(f"gpos div {_PACK_CAP}").alias("bin"))
            .agg(F.count("*").alias("n_tok"),
                 F.concat_ws(" ", F.transform(
                     F.array_sort(F.collect_list(
                         F.struct(F.col("gpos"), F.col("tok")))),
                     lambda s: s["tok"])).alias("tokens_str")))


q_pack_tokens.__doc__ = q_pack_tokens.__doc__.format(cap=_PACK_CAP)

_SQL_PACK_TOKENS = f"""
WITH c AS (SELECT doc_id, {_DOC_TOKS} AS toks FROM documents
           WHERE len({_DOC_TOKS}) > 0),
n AS (SELECT doc_id, len(toks)::BIGINT AS n_tok FROM c),
o AS (SELECT doc_id,
        coalesce(sum(n_tok) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
          AS seq_offset
      FROM n),
t AS (SELECT doc_id, unnest(toks) AS tok,
             unnest(range(0, len(toks))) AS pos
      FROM c),
g AS (SELECT o.seq_offset + t.pos AS gpos, t.tok
      FROM t JOIN o USING (doc_id))
SELECT (gpos // {_PACK_CAP})::BIGINT AS bin, count(*)::BIGINT AS n_tok,
       string_agg(tok, ' ' ORDER BY gpos) AS tokens_str
FROM g GROUP BY 1
"""


# ----------------- incremental (dump-N vs history) MinHash near-dup

_XSM_OFF = 3_000_000  # new-dump id offset (distinct from _XS_OFF's space)
_XSM_MIN = 8          # near-dup verdict: >= 8/16 signature slots agree


def q_cross_snapshot_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """INCREMENTAL fuzzy dedup — the near-dup counterpart of
    `cross_snapshot_dedup`: dedupe dump N against the history WITHOUT
    re-clustering everything. The new dump is derived (every 5th history
    doc, id + {off}, text + ' rev2 rev2' — a lightly-edited re-crawl, so
    candidates are NEAR duplicates, not exact). Both sides get 16-slot
    md5 MinHash signatures; the new dump's band keys probe the history's
    band table; surviving candidates verify by signature agreement and
    each new doc keeps its BEST match (max n_match, ties -> lowest old
    id). Output: one row per new doc, matched old id (null if none),
    n_match, is_neardup = n_match >= {mm}.

    100 TB shape: the history band table is computed once and lives
    partitioned by band key at rest; each incremental dump shuffles only
    ITS OWN band rows to probe it (the asymmetric join — both sides big,
    hash join on the band key, no broadcast). Signature folds are
    shuffle-free; the best-match window partitions by new id."""
    from pyspark.sql import Window
    from .operators.dedup import (_md5_hash28, _minhash_fold,
                                  _persist_bounded, shingle_array)
    k, bands, rows_per_band = 16, 4, 4
    old = load(spark, sf, "documents").select("doc_id", "text")
    new = (old.where(F.col("doc_id") % 5 == 0)
           .select((F.col("doc_id") + _XSM_OFF).alias("doc_id"),
                   F.concat(F.col("text"),
                            F.lit(" rev2 rev2")).alias("text")))

    def sigs(df, slot):
        sh = shingle_array(df, 3)
        hashes = F.transform(F.col("shingles"), _md5_hash28)
        return _persist_bounded(
            slot, sh.where(F.size("shingles") > 0)
            .select("doc_id", _minhash_fold(hashes, k).alias("sig")))

    def banded(s, idname):
        return s.select(
            F.col("doc_id").alias(idname),
            F.posexplode(F.array(*[
                F.concat_ws(",", *[
                    F.element_at("sig", band * rows_per_band + r + 1)
                    .cast("string") for r in range(rows_per_band)
                ]) for band in range(bands)
            ])).alias("band", "bkey"))

    so, sn = sigs(old, "xsm_old"), sigs(new, "xsm_new")
    cand = (banded(sn, "new_id")
            .join(banded(so, "old_id").withColumnRenamed("bkey", "obkey")
                  .withColumnRenamed("band", "oband"),
                  (F.col("bkey") == F.col("obkey"))
                  & (F.col("band") == F.col("oband")))
            .select("new_id", "old_id").dropDuplicates(["new_id", "old_id"]))
    n_match = F.size(F.filter(
        F.zip_with("sig_n", "sig_o", lambda x, y: x == y), lambda m: m))
    scored = (cand
              .join(sn.select(F.col("doc_id").alias("new_id"),
                              F.col("sig").alias("sig_n")), "new_id")
              .join(so.select(F.col("doc_id").alias("old_id"),
                              F.col("sig").alias("sig_o")), "old_id")
              .select("new_id", "old_id",
                      n_match.cast("long").alias("n_match")))
    best = (scored.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("new_id")
            .orderBy(F.desc("n_match"), "old_id")))
        .where(F.col("rn") == 1).drop("rn"))
    return (new.select(F.col("doc_id").alias("new_id"))
            .join(best, "new_id", "left")
            .select("new_id", "old_id",
                    F.coalesce("n_match", F.lit(0)).cast("long")
                    .alias("n_match"),
                    (F.coalesce("n_match", F.lit(0)) >= _XSM_MIN)
                    .alias("is_neardup")))


q_cross_snapshot_minhash.__doc__ = q_cross_snapshot_minhash.__doc__.format(
    off=_XSM_OFF, mm=_XSM_MIN)


def _cross_snapshot_minhash_sql() -> str:
    from .operators.dedup import _P, _perm_constants
    consts = _perm_constants(16)
    al = "[" + ", ".join(str(a) for a, _ in consts) + "]"
    bl = "[" + ", ".join(str(b) for _, b in consts) + "]"

    def sig_stack(p, src):
        return f"""
{p}t AS (SELECT doc_id, {_DOC_TOKS} AS toks FROM {src}),
{p}shd AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3 THEN
      list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' ')))
    ELSE []::VARCHAR[] END AS shingles
  FROM {p}t),
{p}hv AS (
  SELECT doc_id,
    list_transform(shingles, s -> {_MD5H28.format(s='s')}) AS hv
  FROM {p}shd WHERE len(shingles) > 0),
{p}sg AS (
  SELECT doc_id,
    list_transform(range(1, 17), j ->
      list_min(list_transform(hv, h -> (({al})[j] * h + ({bl})[j]) % {_P})))
      AS sig
  FROM {p}hv),
{p}bk AS (
  SELECT doc_id, bi AS band,
         array_to_string(sig[(bi * 4 + 1):(bi * 4 + 4)], ',') AS bkey
  FROM {p}sg, unnest(range(0, 4)) AS u(bi))"""

    return f"""
WITH nd AS (SELECT doc_id + {_XSM_OFF} AS doc_id,
              text || ' rev2 rev2' AS text
            FROM documents WHERE doc_id % 5 = 0),
{sig_stack('o', 'documents')},
{sig_stack('n', 'nd')},
cand AS (
  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
  FROM nbk n JOIN obk o ON n.band = o.band AND n.bkey = o.bkey),
m AS (
  SELECT new_id, old_id,
    len(list_filter(range(1, 17), j -> sn.sig[j] = so.sig[j]))::BIGINT
      AS n_match
  FROM cand JOIN nsg sn ON sn.doc_id = new_id
            JOIN osg so ON so.doc_id = old_id),
best AS (
  SELECT new_id, old_id, n_match,
         row_number() OVER (PARTITION BY new_id
                            ORDER BY n_match DESC, old_id) AS rn
  FROM m)
SELECT nd.doc_id AS new_id, best.old_id,
       coalesce(best.n_match, 0)::BIGINT AS n_match,
       (coalesce(best.n_match, 0) >= {_XSM_MIN}) AS is_neardup
FROM nd LEFT JOIN best ON nd.doc_id = best.new_id AND best.rn = 1
"""


# ----------------- final corpus manifest (the shipped-training-set join)


def q_corpus_manifest(spark: SparkSession, sf: str) -> DataFrame:
    """The CAPSTONE join a pipeline actually ships: one row per document
    with every gating decision — quality keep (the flagship rules
    kernel), fuzzy-dedup representative (end-to-end MinHash components),
    benchmark contamination — and the final verdict
    final_keep = quality_keep AND is_rep AND NOT contaminated.
    Each input is value-proven on its own; this proves the JOIN of the
    three decision streams (the DuckDB twin nests all three proven SQL
    stacks as CTEs). At sf0.001 every gate is live: ~20% of drops come
    from each source.

    100 TB shape: three doc-keyed streams hash-join on doc_id — with the
    corpus bucketed by doc_id at rest all three joins are co-located
    (operators/bucketed.py); nothing here adds a new scale surface."""
    from .queries import q_keep_drop
    kd = q_keep_drop(spark, sf).select(
        "doc_id", F.col("keep").alias("quality_keep"))
    mh = q_minhash_dedup(spark, sf)
    dc = q_decontaminate(spark, sf).select("doc_id", "contaminated")
    return (kd.join(mh, "doc_id").join(dc, "doc_id")
            .select("doc_id", "quality_keep", "is_rep", "component",
                    "contaminated",
                    (F.col("quality_keep") & F.col("is_rep")
                     & ~F.col("contaminated")).alias("final_keep")))


def corpus_manifest_sql(keep_drop_sql: str) -> str:
    """SQL twin template — keep_drop_sql is injected by queries.py (the
    quality_report composition pattern; queries_ref must not import
    queries at module scope)."""
    return f"""
WITH kd AS ({keep_drop_sql}),
mh AS ({_minhash_dedup_sql()}),
dc AS ({_SQL_DECONTAMINATE})
SELECT kd.doc_id, kd.keep AS quality_keep, mh.is_rep, mh.component,
       dc.contaminated,
       (kd.keep AND mh.is_rep AND NOT dc.contaminated) AS final_keep
FROM kd JOIN mh ON kd.doc_id = mh.doc_id JOIN dc ON kd.doc_id = dc.doc_id
"""


# ----------------- C4 line-level heuristics (Raffel et al. 2020 shape)


def q_c4_line_filter(spark: SparkSession, sf: str) -> DataFrame:
    """The C4 line rules (Raffel et al. 2020): keep only lines that END IN
    TERMINAL PUNCTUATION and have >= 5 words; keep a page only if >= 3
    lines survive; re-assemble the kept text. The staged vocabulary lines
    carry almost no terminal punctuation, so the input derives it
    deterministically — lines whose md5 bucket is 0/1 (mod 3) get '.'/'!'
    appended, the same expression in both engines — which keeps BOTH
    predicate branches live on every page (the intra_line_dedup derived-
    input discipline).

    100 TB shape: line tagging is a pure per-row map (codegen'd split +
    endswith + hash); the only shuffle is the per-page re-aggregation
    keyed by url, map-side combined. Page-parallel at any scale."""
    from .queries import stage_pages
    p = spark.read.parquet(stage_pages(spark, sf)).select("url", "text")
    lines = p.select(
        "url", F.posexplode(F.split("text", "\n")).alias("pos", "line"))
    b = (F.conv(F.substring(F.md5(F.col("line")), 1, 7), 16, 10)
         .cast("long") % 3)
    line2 = F.concat(F.col("line"),
                     F.when(b == 0, F.lit("."))
                     .when(b == 1, F.lit("!")).otherwise(F.lit("")))
    tagged = lines.select("url", "pos", line2.alias("line2"))
    nw = F.size(F.filter(F.split("line2", " "), lambda x: x != F.lit("")))
    keep = (F.substring("line2", -1, 1).isin(".", "!")
            & (nw >= 5)).alias("keep_line")
    kept_struct = F.when(F.col("keep_line"), F.struct("pos", "line2"))
    return (tagged.select("url", "pos", "line2", keep)
            .groupBy("url").agg(
                F.count("*").alias("n_lines"),
                F.sum(F.col("keep_line").cast("long"))
                .alias("n_kept_lines"),
                (F.sum(F.col("keep_line").cast("long")) >= 3)
                .alias("page_keep"),
                F.concat_ws("\n", F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["line2"])).alias("text_kept")))


def _c4_line_filter_sql() -> str:
    from .sources.pages import STAGE_PATH
    return f"""
WITH s AS (SELECT url, string_split(text, chr(10)) AS ls
           FROM read_parquet('{STAGE_PATH}/*.parquet')),
l AS (SELECT url, i AS pos, ls[i] AS line
      FROM s, unnest(range(1, len(ls) + 1)) AS u(i)),
t AS (SELECT url, pos,
        line || CASE ('0x' || substr(md5(line), 1, 7))::BIGINT % 3
                  WHEN 0 THEN '.' WHEN 1 THEN '!' ELSE '' END AS line2
      FROM l),
k AS (SELECT url, pos, line2,
        (right(line2, 1) IN ('.', '!')
         AND len(list_filter(string_split(line2, ' '), x -> x <> '')) >= 5)
          AS keep_line
      FROM t)
SELECT url, count(*)::BIGINT AS n_lines,
       sum(CASE WHEN keep_line THEN 1 ELSE 0 END)::BIGINT AS n_kept_lines,
       (sum(CASE WHEN keep_line THEN 1 ELSE 0 END) >= 3) AS page_keep,
       coalesce(string_agg(CASE WHEN keep_line THEN line2 END, chr(10)
                           ORDER BY pos), '') AS text_kept
FROM k GROUP BY url
"""


# ----------------- Gopher document-quality rules (Rae et al. 2021, App. A)

_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def q_gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    """The Gopher repetition-free document-quality gates (Rae et al. 2021,
    Appendix A1.1) over the crawl: word-count bounds [50, 100k], mean word
    length in [3, 10], symbol-to-word ratio <= 0.1 ('#'/'...'), < 90% of
    lines bullet-led, < 30% of lines ellipsis-terminated, >= 80% of words
    containing an alphabetic character, and >= 2 distinct stop words.
    Thresholds are integer cross-multiplied (house rule: no float
    ratios). The staged vocabulary carries no bullets/ellipses/hash
    symbols, so those branches are derived deterministically — pages
    whose md5(url) bucket is 0 (mod 13) are "listy": EVERY line gets a
    '• ' prefix (these fail the 90%-bullet gate); on other pages, lines
    whose md5 bucket is 0/1/2 (mod 7) get a '• ' prefix / '...' suffix /
    ' #tag' suffix — the same expressions in both engines (the
    intra_line_dedup derived-input discipline); word-count / mean-length
    / alpha / stop-word branches are live naturally (5-400-word pages,
    digit-heavy pages, no-space zh pages, non-en stop-word misses).

    Distinct-stop-word counting folds to a per-line BITMASK (one
    aggregate pass over the line's words), OR-merged per page with
    bit_or and popcounted — no distinct shuffle, no per-page set.

    100 TB shape: line tagging and per-line word stats are a pure per-row
    map over exploded lines (codegen split + tiny-array folds, the
    doc_stats pattern); the only shuffle is ONE map-side-combined
    groupBy(url). Page-parallel at any scale."""
    from .queries import stage_pages
    p = spark.read.parquet(stage_pages(spark, sf)).select("url", "text")
    lines = p.select("url", F.explode(F.split("text", "\n")).alias("line"))
    b = (F.conv(F.substring(F.md5(F.col("line")), 1, 7), 16, 10)
         .cast("long") % 7)
    listy = (F.conv(F.substring(F.md5(F.col("url")), 1, 7), 16, 10)
             .cast("long") % 13) == 0
    line2 = (F.when(listy, F.concat(F.lit("• "), F.col("line")))
             .when(b == 0, F.concat(F.lit("• "), F.col("line")))
             .when(b == 1, F.concat(F.col("line"), F.lit("...")))
             .when(b == 2, F.concat(F.col("line"), F.lit(" #tag")))
             .otherwise(F.col("line")))
    t = lines.select("url", line2.alias("line2"))
    words = F.filter(F.split(F.col("line2"), " "), lambda x: x != F.lit(""))

    def _stopbit(x):
        e = F.lit(0).cast("long")
        for i, s in enumerate(_GOPHER_STOPS):
            e = F.when(x == F.lit(s), F.lit(1 << i).cast("long")).otherwise(e)
        return e
    perline = t.select(
        "url",
        F.size(words).cast("long").alias("nw"),
        F.coalesce(
            F.aggregate(F.transform(words, F.length),
                        F.lit(0).cast("long"), lambda a, x: a + x),
            F.lit(0).cast("long")).alias("wl"),
        F.size(F.filter(words, lambda x: x.rlike("[a-z]")))
        .cast("long").alias("al"),
        F.size(F.filter(words,
                        lambda x: x.startswith("#") | x.contains("...")))
        .cast("long").alias("sy"),
        F.aggregate(words, F.lit(0).cast("long"),
                    lambda a, x: a.bitwiseOR(_stopbit(x))).alias("sm"),
        F.col("line2").startswith("• ").cast("long").alias("bul"),
        F.col("line2").endswith("...").cast("long").alias("ell"))
    g = perline.groupBy("url").agg(
        F.count("*").alias("n_lines"),
        F.sum("nw").alias("n_words"),
        F.sum("wl").alias("sum_word_len"),
        F.sum("al").alias("n_alpha_words"),
        F.sum("sy").alias("n_symbol_words"),
        F.sum("bul").alias("n_bullet_lines"),
        F.sum("ell").alias("n_ellipsis_lines"),
        F.bit_count(F.bit_or("sm")).cast("long").alias("n_stop_words"))
    nw, wl = F.col("n_words"), F.col("sum_word_len")
    r_wc = ((nw >= 50) & (nw <= 100000)).alias("r_word_count")
    r_mwl = ((wl >= 3 * nw) & (wl <= 10 * nw)).alias("r_mean_word_len")
    r_sym = (10 * F.col("n_symbol_words") <= nw).alias("r_symbol_ratio")
    r_bul = (10 * F.col("n_bullet_lines")
             < 9 * F.col("n_lines")).alias("r_bullet")
    r_ell = (10 * F.col("n_ellipsis_lines")
             < 3 * F.col("n_lines")).alias("r_ellipsis")
    r_al = (5 * F.col("n_alpha_words") >= 4 * nw).alias("r_alpha")
    r_st = (F.col("n_stop_words") >= 2).alias("r_stop_words")
    out = g.select("url", "n_lines", "n_words", "sum_word_len",
                   "n_alpha_words", "n_symbol_words", "n_bullet_lines",
                   "n_ellipsis_lines", "n_stop_words",
                   r_wc, r_mwl, r_sym, r_bul, r_ell, r_al, r_st)
    return out.select(
        "*",
        (F.col("r_word_count") & F.col("r_mean_word_len")
         & F.col("r_symbol_ratio") & F.col("r_bullet")
         & F.col("r_ellipsis") & F.col("r_alpha")
         & F.col("r_stop_words")).alias("keep"))


def _gopher_rules_sql() -> str:
    from .sources.pages import STAGE_PATH
    stop_bits = " + ".join(
        f"(CASE WHEN list_contains(ws, '{s}') THEN {1 << i} ELSE 0 END)"
        for i, s in enumerate(_GOPHER_STOPS))
    return f"""
WITH s AS (SELECT url, string_split(text, chr(10)) AS ls
           FROM read_parquet('{STAGE_PATH}/*.parquet')),
l AS (SELECT url, ls[i] AS line
      FROM s, unnest(range(1, len(ls) + 1)) AS u(i)),
t AS (SELECT url,
        CASE WHEN ('0x' || substr(md5(url), 1, 7))::BIGINT % 13 = 0
          THEN '• ' || line
          ELSE CASE ('0x' || substr(md5(line), 1, 7))::BIGINT % 7
            WHEN 0 THEN '• ' || line
            WHEN 1 THEN line || '...'
            WHEN 2 THEN line || ' #tag' ELSE line END END AS line2
      FROM l),
w AS (SELECT url, line2,
        list_filter(string_split(line2, ' '), x -> x <> '') AS ws
      FROM t),
pl AS (SELECT url,
         len(ws)::BIGINT AS nw,
         coalesce(list_sum(list_transform(ws, x -> len(x))), 0)::BIGINT AS wl,
         len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))::BIGINT AS al,
         len(list_filter(ws, x -> starts_with(x, '#')
                                  OR contains(x, '...')))::BIGINT AS sy,
         ({stop_bits})::BIGINT AS sm,
         (CASE WHEN left(line2, 2) = '• ' THEN 1 ELSE 0 END)::BIGINT AS bul,
         (CASE WHEN right(line2, 3) = '...' THEN 1 ELSE 0 END)::BIGINT AS ell
       FROM w),
g AS (SELECT url, count(*)::BIGINT AS n_lines, sum(nw)::BIGINT AS n_words,
        sum(wl)::BIGINT AS sum_word_len, sum(al)::BIGINT AS n_alpha_words,
        sum(sy)::BIGINT AS n_symbol_words,
        sum(bul)::BIGINT AS n_bullet_lines,
        sum(ell)::BIGINT AS n_ellipsis_lines,
        bit_count(bit_or(sm))::BIGINT AS n_stop_words
      FROM pl GROUP BY url),
r AS (SELECT *,
        (n_words >= 50 AND n_words <= 100000) AS r_word_count,
        (sum_word_len >= 3 * n_words
         AND sum_word_len <= 10 * n_words) AS r_mean_word_len,
        (10 * n_symbol_words <= n_words) AS r_symbol_ratio,
        (10 * n_bullet_lines < 9 * n_lines) AS r_bullet,
        (10 * n_ellipsis_lines < 3 * n_lines) AS r_ellipsis,
        (5 * n_alpha_words >= 4 * n_words) AS r_alpha,
        (n_stop_words >= 2) AS r_stop_words
      FROM g)
SELECT url, n_lines, n_words, sum_word_len, n_alpha_words, n_symbol_words,
       n_bullet_lines, n_ellipsis_lines, n_stop_words,
       r_word_count, r_mean_word_len, r_symbol_ratio, r_bullet, r_ellipsis,
       r_alpha, r_stop_words,
       (r_word_count AND r_mean_word_len AND r_symbol_ratio AND r_bullet
        AND r_ellipsis AND r_alpha AND r_stop_words) AS keep
FROM r
"""


def q_gopher_dup_lines(spark: SparkSession, sf: str) -> DataFrame:
    """The Gopher repetition gates at LINE granularity (Rae et al. 2021,
    App. A1.1 'repetitious documents'): duplicate-line fraction <= 0.30
    and duplicate-line CHARACTER fraction <= 0.20, both integer
    cross-multiplied. A line's duplicate occurrences are (count - 1) per
    distinct line — the first occurrence is original, repeats are the
    boilerplate signal (navigation chrome, templated footers). The
    n-gram half of Gopher's repetition family is `repetition_ngrams`;
    together with `gopher_rules` this completes the published rule set.

    100 TB shape: two map-side-combined hash aggs — (url, line) then
    url — no window, no sort, no broadcast; grams are page-scoped so the
    shuffle keys are skew-free. The generator's repetitive pages repeat
    WORD blocks that rarely align to the 180-char line chop, so heavy
    line-level duplication is derived deterministically — pages whose
    md5(url) bucket is 0 (mod 11) get their line list DOUBLED (the
    templated-chrome shape the rule exists to catch), the same
    expression in both engines (the derived-input discipline)."""
    from .queries import stage_pages
    p = spark.read.parquet(stage_pages(spark, sf)).select("url", "text")
    ls = F.split("text", "\n")
    dupy = (F.conv(F.substring(F.md5(F.col("url")), 1, 7), 16, 10)
            .cast("long") % 11) == 0
    lines = p.select(
        "url",
        F.explode(F.when(dupy, F.concat(ls, ls)).otherwise(ls))
        .alias("line"))
    per = (lines.groupBy("url", "line")
           .agg(F.count("*").alias("c"))
           .select("url", "c",
                   F.length("line").cast("long").alias("len")))
    g = per.groupBy("url").agg(
        F.sum("c").alias("n_lines"),
        F.count("*").alias("n_distinct_lines"),
        (F.sum("c") - F.count("*")).alias("dup_lines"),
        F.sum(F.col("c") * F.col("len")).alias("line_chars"),
        F.sum((F.col("c") - 1) * F.col("len")).alias("dup_line_chars"))
    r_dl = (10 * F.col("dup_lines") <= 3 * F.col("n_lines")
            ).alias("r_dup_lines")
    r_dc = (5 * F.col("dup_line_chars") <= F.col("line_chars")
            ).alias("r_dup_line_chars")
    out = g.select("url", "n_lines", "n_distinct_lines", "dup_lines",
                   "line_chars", "dup_line_chars", r_dl, r_dc)
    return out.select(
        "*", (F.col("r_dup_lines")
              & F.col("r_dup_line_chars")).alias("keep"))


def _gopher_dup_lines_sql() -> str:
    from .sources.pages import STAGE_PATH
    return f"""
WITH s0 AS (SELECT url, string_split(text, chr(10)) AS ls0
            FROM read_parquet('{STAGE_PATH}/*.parquet')),
s AS (SELECT url,
        CASE WHEN ('0x' || substr(md5(url), 1, 7))::BIGINT % 11 = 0
          THEN list_concat(ls0, ls0) ELSE ls0 END AS ls
      FROM s0),
l AS (SELECT url, ls[i] AS line
      FROM s, unnest(range(1, len(ls) + 1)) AS u(i)),
per AS (SELECT url, line, count(*)::BIGINT AS c, len(line)::BIGINT AS len
        FROM l GROUP BY url, line),
g AS (SELECT url, sum(c)::BIGINT AS n_lines,
        count(*)::BIGINT AS n_distinct_lines,
        (sum(c) - count(*))::BIGINT AS dup_lines,
        sum(c * len)::BIGINT AS line_chars,
        sum((c - 1) * len)::BIGINT AS dup_line_chars
      FROM per GROUP BY url)
SELECT url, n_lines, n_distinct_lines, dup_lines, line_chars,
       dup_line_chars,
       (10 * dup_lines <= 3 * n_lines) AS r_dup_lines,
       (5 * dup_line_chars <= line_chars) AS r_dup_line_chars,
       (10 * dup_lines <= 3 * n_lines
        AND 5 * dup_line_chars <= line_chars) AS keep
FROM g
"""


# Gopher App. A1.1 n-gram character-fraction thresholds (Rae et al. 2021):
# top-n-gram coverage for n=2..4, duplicated-n-gram coverage for n=5..10.
# Gate passes when 100 * covered_chars <= pct * total_chars (integer
# cross-multiply, no float thresholds).
_GNG_TOP = {2: 20, 3: 18, 4: 16}
_GNG_DUP = {5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10}
_GNG_LENBITS = 20  # max-key packing: mk = c * 2^20 + len(gram)


def q_gopher_ngram_gates(spark: SparkSession, sf: str) -> DataFrame:
    """The FULL Gopher n-gram repetition gate set (Rae et al. 2021,
    App. A1.1) — `repetition_ngrams` covers the top-bigram flag and
    trigram excess on the documents table; this implements all NINE
    published character-fraction thresholds over the staged crawl: the
    most-frequent n-gram's character coverage for n=2..4 (<= 20/18/16%)
    and the occurrence-weighted character coverage of duplicated
    n-grams for n=5..10 (<= 15/14/13/12/11/10%). Coverage counts the
    space-joined gram's characters per occurrence (the deterministic
    integer convention both engines share; Gopher's prose leaves span
    overlap unspecified). Top-gram selection is deterministic via the
    packed max-key mk = count * 2^{lb} + len — max(mk) picks the
    highest count, longest gram on count ties — so ONE algebraic max
    replaces a per-n argmax join.

    100 TB shape: all nine gram sizes generate in ONE inline() pass over
    the token array (no nine-scan fan-out), then exactly TWO map-side-
    combined shuffles — (url, n, gram) counts, then the per-url
    conditional rollup. Gram keys are page-scoped so the shuffle is
    skew-free; no window, no broadcast, no sort."""
    from .queries import stage_pages
    p = (spark.read.parquet(stage_pages(spark, sf))
         .select("url", "text",
                 F.filter(F.split("text", " "),
                          lambda x: x != F.lit("")).alias("toks")))
    grams = p.select(
        "url", F.length("text").cast("long").alias("total_chars"),
        F.expr(
            "inline(flatten(transform(array(2,3,4,5,6,7,8,9,10), n -> "
            "transform(filter(sequence(1, greatest(size(toks) - n + 1, 1)),"
            "                 i -> i <= size(toks) - n + 1), "
            "  i -> struct(n AS n, "
            "              array_join(slice(toks, i, n), ' ') AS g)))))"))
    per = (grams.groupBy("url", "total_chars", "n", "g")
           .agg(F.count("*").alias("c"))
           .select("url", "total_chars", "n", "c",
                   F.length("g").cast("long").alias("glen")))
    mk = F.col("c") * F.lit(1 << _GNG_LENBITS) + F.col("glen")
    aggs = [F.coalesce(
        F.max(F.when(F.col("n") == n, mk)), F.lit(0)).alias(f"mk{n}")
        for n in _GNG_TOP]
    aggs += [F.coalesce(
        F.sum(F.when((F.col("n") == n) & (F.col("c") >= 2),
                     F.col("c") * F.col("glen"))), F.lit(0))
        .cast("long").alias(f"dcov{n}") for n in _GNG_DUP]
    g = per.groupBy("url", "total_chars").agg(*aggs)
    covs = [(F.expr(f"(mk{n} div {1 << _GNG_LENBITS}) "
                    f"* (mk{n} % {1 << _GNG_LENBITS})")
             .cast("long").alias(f"cov{n}")) for n in _GNG_TOP]
    g = g.select("url", "total_chars", *covs,
                 *[f"dcov{n}" for n in _GNG_DUP])
    gates = [(100 * F.col(f"cov{n}") <= p_ * F.col("total_chars"))
             for n, p_ in _GNG_TOP.items()]
    gates += [(100 * F.col(f"dcov{n}") <= p_ * F.col("total_chars"))
              for n, p_ in _GNG_DUP.items()]
    keep = gates[0]
    for g_ in gates[1:]:
        keep = keep & g_
    return g.select("url", "total_chars",
                    *[f"cov{n}" for n in _GNG_TOP],
                    *[f"dcov{n}" for n in _GNG_DUP],
                    keep.alias("keep"))


def _gopher_ngram_gates_sql() -> str:
    from .sources.pages import STAGE_PATH
    lb = 1 << _GNG_LENBITS
    tops = ",\n".join(
        f"        coalesce(max(CASE WHEN n = {n} THEN c * {lb} + glen END),"
        f" 0) AS mk{n}" for n in _GNG_TOP)
    dups = ",\n".join(
        f"        coalesce(sum(CASE WHEN n = {n} AND c >= 2"
        f" THEN c * glen END), 0)::BIGINT AS dcov{n}" for n in _GNG_DUP)
    covs = ", ".join(
        f"(mk{n} // {lb}) * (mk{n} % {lb}) AS cov{n}" for n in _GNG_TOP)
    gate_list = [f"100 * (mk{n} // {lb}) * (mk{n} % {lb})"
                 f" <= {p} * total_chars" for n, p in _GNG_TOP.items()]
    gate_list += [f"100 * dcov{n} <= {p} * total_chars"
                  for n, p in _GNG_DUP.items()]
    keep = "\n         AND ".join(gate_list)
    dcols = ", ".join(f"dcov{n}" for n in _GNG_DUP)
    return f"""
WITH p AS (SELECT url, len(text)::BIGINT AS total_chars,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM read_parquet('{STAGE_PATH}/*.parquet')),
gr AS (SELECT url, total_chars, n,
         array_to_string(toks[i:i+n-1], ' ') AS g
       FROM p, unnest(range(2, 11)) AS un(n),
            unnest(range(1, greatest(len(toks) - n + 2, 1))) AS u(i)),
per AS (SELECT url, total_chars, n, g, count(*)::BIGINT AS c,
          len(g)::BIGINT AS glen
        FROM gr GROUP BY url, total_chars, n, g),
agg AS (SELECT url, total_chars,
{tops},
{dups}
        FROM per GROUP BY url, total_chars)
SELECT url, total_chars, {covs}, {dcols},
       ({keep}) AS keep
FROM agg
"""


def q_normalized_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Near-exact dedup on NORMALIZED text (the FineWeb/Dolma fuzzy-exact
    step between byte-exact and MinHash): lowercase, strip every
    non-letter to a space, collapse whitespace, trim — then group on the
    md5 of the normalized form and keep min(url) per group. Catches
    reformatted mirrors (case, punctuation, digit, whitespace variants)
    that byte-exact `exact_dedup` misses; 56/400 staged pages collapse
    naturally, so both branches are live with no derived input.

    Empty-normal-form pages (e.g. fully non-Latin after the ASCII
    normalize) are keyed on their own url instead of the shared empty
    hash — at web scale the empty-norm group is corpus-sized and would
    be THE skew key; real pipelines route those to the script-specific
    path rather than dedup them here.

    100 TB shape: normalization is a per-row codegen map (no HOF); the
    group key is a 32-hex md5, so the two shuffles (groupBy + re-join)
    carry 16-byte keys, never the normalized text; both sides of the
    re-join are corpus-sized and doc-keyed — a plain shuffle hash join,
    no broadcast (the dup_spans / line_dedup key discipline)."""
    from .queries import stage_pages
    p = spark.read.parquet(stage_pages(spark, sf)).select("url", "text")
    norm = F.trim(F.regexp_replace(F.regexp_replace(
        F.lower(F.col("text")), "[^a-z ]", " "), " +", " "))
    keyed = p.select(
        "url",
        F.when(F.length(norm) > 0, F.md5(norm))
        .otherwise(F.md5(F.concat(F.lit("u:"), F.col("url"))))
        .alias("norm_key"))
    groups = keyed.groupBy("norm_key").agg(
        F.count("*").alias("group_size"),
        F.min("url").alias("keeper"))
    return (keyed.join(groups, "norm_key")
            .select("url", "norm_key",
                    F.col("group_size").cast("long").alias("group_size"),
                    "keeper",
                    (F.col("url") != F.col("keeper")).alias("is_dup")))


def _normalized_dedup_sql() -> str:
    from .sources.pages import STAGE_PATH
    return f"""
WITH n AS (SELECT url,
             trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
           FROM read_parquet('{STAGE_PATH}/*.parquet')),
k AS (SELECT url,
        CASE WHEN len(norm) > 0 THEN md5(norm)
             ELSE md5('u:' || url) END AS norm_key
      FROM n),
g AS (SELECT norm_key, count(*)::BIGINT AS group_size,
        min(url) AS keeper
      FROM k GROUP BY norm_key)
SELECT k.url, k.norm_key, g.group_size, g.keeper,
       (k.url <> g.keeper) AS is_dup
FROM k JOIN g USING (norm_key)
"""


# ----------------- URL blocklist filtering (UT1 / RefinedWeb shape)

_UF_KWS = ("bad", "fee", "ace", "dad")  # banned path substrings (hex-able)


def q_url_filter(spark: SparkSession, sf: str) -> DataFrame:
    """URL-level filtering, the first stage of RefinedWeb/CCNet-style web
    pipelines: drop pages whose HOST is on a curated blocklist (UT1
    shape: a (host, category) side table — synthesized deterministically
    here over the generator's host universe, loaded exactly the way the
    real multi-million-row UT1 list would be) or whose PATH contains a
    banned keyword. keep = neither rule fires.

    100 TB shape: the blocklist is dimension-sized -> BROADCAST left
    join on the extracted host (no corpus shuffle; the UT1 list is ~4M
    rows, still broadcastable); the keyword test is a per-row LIKE chain
    (whole-stage codegen, no HOF) — the whole query is a single
    shuffle-free map over the crawl."""
    from .queries import stage_pages
    staged = spark.read.parquet(stage_pages(spark, sf))
    host = F.regexp_extract("url", r"^https://([^/]+)/", 1)
    path = F.regexp_extract("url", r"^https://[^/]+/(.*)$", 1)
    block = (spark.range(16).filter(F.col("id") % 3 == 0)
             .select(F.concat(F.lit("host"), F.col("id").cast("string"),
                              F.lit(".example")).alias("host"),
                     F.when(F.col("id") % 2 == 0, F.lit("adult"))
                     .otherwise(F.lit("ads")).alias("category")))
    kw_hit = None
    for kw in _UF_KWS:
        t = path.like(f"%{kw}%")
        kw_hit = t if kw_hit is None else (kw_hit | t)
    return (staged.select("url", host.alias("host"),
                          kw_hit.alias("blocked_path"))
            .join(F.broadcast(block), "host", "left")
            .select("url", "host", "category",
                    F.col("category").isNotNull().alias("blocked_host"),
                    "blocked_path",
                    (F.col("category").isNull() & ~F.col("blocked_path"))
                    .alias("keep")))


def _url_filter_sql() -> str:
    from .sources.pages import STAGE_PATH
    likes = " OR ".join(f"path LIKE '%{k}%'" for k in _UF_KWS)
    return f"""
WITH p AS (SELECT url,
             regexp_extract(url, '^https://([^/]+)/', 1) AS host,
             regexp_extract(url, '^https://[^/]+/(.*)$', 1) AS path
           FROM read_parquet('{STAGE_PATH}/*.parquet')),
block AS (SELECT 'host' || i::VARCHAR || '.example' AS host,
            CASE WHEN i % 2 = 0 THEN 'adult' ELSE 'ads' END AS category
          FROM range(0, 16) AS r(i) WHERE i % 3 = 0)
SELECT p.url, p.host, block.category,
       (block.category IS NOT NULL) AS blocked_host,
       ({likes}) AS blocked_path,
       (block.category IS NULL AND NOT ({likes})) AS keep
FROM p LEFT JOIN block ON p.host = block.host
"""


# ----------------- distributed classifier TRAINING (batch perceptron)

_CT_B = 512  # hashed feature buckets = trained weight-vector length
_CT_THR = 300  # n_chars teacher threshold: label = +1 iff n_chars >= THR


def q_classifier_train(spark: SparkSession, sf: str) -> DataFrame:
    """TRAIN the web-quality linear classifier distributed (the upstream
    stage of `quality_classifier`, which only runs inference against a
    frozen weight table): two unrolled batch-perceptron iterations over
    hashed bag-of-words features, every update an exact integer
    aggregation — the same replay-as-SQL discipline as the Lloyd
    iterations in `ivf_kmeans_topk`.

    Teacher labels are deterministic (+1 iff n_chars >= {thr}, the
    CCNet-style "long pages are keepers" prior), so train loss is
    learnable, not noise-fitting. With w0 = 0 every doc starts
    misclassified (y*score = 0 <= 0), so iteration 1 is the pure
    label-weighted count sum w1[b] = sum(y*cnt); iteration 2 rescores
    with w1 and adds only the still-misclassified docs' contributions.
    Output = the full {b}-row weight table (b, w1, w2) — integer-exact,
    partition-order independent.

    100 TB shape: the feature-count table c is doc-sharded and
    partial-aggregates map-side; per iteration the weight table is {b}
    rows -> BROADCAST onto c for rescoring (no corpus-sized shuffle),
    then one {b}-key hash agg for the update. c is scanned once per
    iteration (persist it on a real cluster). Weight magnitude is
    bounded by total token count (~10^12 at 100 TB) and cnt <= doc
    length, so cnt*w1 stays far inside int64 under ANSI mode.
    """
    d = load(spark, sf, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    c = (d.select("doc_id",
                  F.when(F.col("n_chars") >= _CT_THR, F.lit(1))
                  .otherwise(F.lit(-1)).cast("long").alias("y"),
                  F.explode(toks).alias("f"))
         .select("doc_id", "y",
                 (F.conv(F.substring(F.md5(F.col("f")), 1, 7), 16, 10)
                  .cast("long") % _CT_B).alias("b"))
         .groupBy("doc_id", "y", "b").agg(F.count("*").alias("cnt")))
    # iteration 1: w0 = 0 -> every doc misclassified -> full-corpus update
    w1 = c.groupBy("b").agg(F.sum(F.col("y") * F.col("cnt")).alias("w1"))
    # iteration 2: rescore with w1, update from still-misclassified docs
    s1 = (c.join(F.broadcast(w1), "b")
          .groupBy("doc_id", "y")
          .agg(F.sum(F.col("cnt") * F.col("w1")).alias("s1")))
    mis = s1.filter(F.col("y") * F.col("s1") <= 0).select("doc_id")
    d2 = (c.join(mis, "doc_id", "left_semi")
          .groupBy("b").agg(F.sum(F.col("y") * F.col("cnt")).alias("d2")))
    return (spark.range(_CT_B).select(F.col("id").alias("b"))
            .join(w1, "b", "left").join(d2, "b", "left")
            .select("b",
                    F.coalesce("w1", F.lit(0)).cast("long").alias("w1"),
                    (F.coalesce("w1", F.lit(0)) + F.coalesce("d2", F.lit(0)))
                    .cast("long").alias("w2")))


q_classifier_train.__doc__ = q_classifier_train.__doc__.format(
    thr=_CT_THR, b=_CT_B)

_SQL_CLASSIFIER_TRAIN = f"""
WITH c AS (SELECT doc_id,
             (CASE WHEN n_chars >= {_CT_THR} THEN 1 ELSE -1 END)::BIGINT
               AS y,
             ('0x' || substr(md5(u.f), 1, 7))::BIGINT % {_CT_B} AS b,
             count(*)::BIGINT AS cnt
           FROM documents,
                unnest(list_filter(string_split(text, ' '),
                                   x -> x <> '')) AS u(f)
           GROUP BY 1, 2, 3),
w1 AS (SELECT b, sum(y * cnt)::BIGINT AS w1 FROM c GROUP BY b),
s1 AS (SELECT c.doc_id, c.y, sum(c.cnt * w1.w1)::BIGINT AS s1
       FROM c JOIN w1 USING (b) GROUP BY 1, 2),
mis AS (SELECT doc_id FROM s1 WHERE y * s1 <= 0),
d2 AS (SELECT b, sum(y * cnt)::BIGINT AS d2 FROM c
       WHERE doc_id IN (SELECT doc_id FROM mis) GROUP BY b)
SELECT r.i AS b, coalesce(w1.w1, 0)::BIGINT AS w1,
       (coalesce(w1.w1, 0) + coalesce(d2.d2, 0))::BIGINT AS w2
FROM range(0, {_CT_B}) AS r(i)
LEFT JOIN w1 ON r.i = w1.b LEFT JOIN d2 ON r.i = d2.b
"""


# ================================================================ registry

QUERIES_REF: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "reverse_links_resolved": q_reverse_links_resolved,
    "standoff_kfields": q_standoff_kfields,
    "standoff_afields": q_standoff_afields,
    "a3_toc": q_a3_toc,
    "kpos_roundtrip_col": q_kpos_roundtrip_col,
    "incremental_hourly": q_incremental_hourly,
    "train_split": q_train_split,
    "sample_per_source": q_sample_per_source,
    "context_chunks": q_context_chunks,
    "embed_neardup_lsh": q_embed_neardup_lsh,
    "dedup_components": q_dedup_components,
    "local_supplier_volume": q_local_supplier_volume,
    "media_base64": q_media_base64,
    "stream_sliding": q_stream_sliding,
    "minhash_md5": q_minhash_md5,
    "simhash_md5": q_simhash_md5,
    "ivf_kmeans_topk": q_ivf_kmeans_topk,
    "repetition_ngrams": q_repetition_ngrams,
    "tfidf_topk": q_tfidf_topk,
    "host_stats": q_host_stats,
    "stream_quality": q_stream_quality,
    "text_embed_topk": q_text_embed_topk,
    "scrub_phone_fixture": q_scrub_phone_fixture,
    "line_dedup": q_line_dedup,
    "decontaminate": q_decontaminate,
    "url_dedup": q_url_dedup,
    "dup_spans": q_dup_spans,
    "dsir_weights": q_dsir_weights,
    "domain_mix": q_domain_mix,
    "semdedup": q_semdedup,
    "quality_classifier": q_quality_classifier,
    "classifier_train": q_classifier_train,
    "url_filter": q_url_filter,
    "intra_line_dedup": q_intra_line_dedup,
    "c4_line_filter": q_c4_line_filter,
    "gopher_rules": q_gopher_rules,
    "gopher_dup_lines": q_gopher_dup_lines,
    "gopher_ngram_gates": q_gopher_ngram_gates,
    "normalized_dedup": q_normalized_dedup,
    "minhash_dedup": q_minhash_dedup,
    "corpus_manifest": q_corpus_manifest,
    "cross_snapshot_minhash": q_cross_snapshot_minhash,
    "pack_sequences": q_pack_sequences,
    "bpe_pair_counts": q_bpe_pair_counts,
    "bpe_merges": q_bpe_merges,
    "bpe_vocab": q_bpe_vocab,
    "bpe_encode_docs": q_bpe_encode_docs,
    "bpe_fertility": q_bpe_fertility,
    "dup_span_cut": q_dup_span_cut,
    "pack_tokens": q_pack_tokens,
    "ccnet_buckets_approx": q_ccnet_buckets_approx,  # rows-only by design
}

ORACLE_SQL_REF: dict[str, str] = {
    "reverse_links_resolved": _SQL_REVERSE_LINKS_RESOLVED,
    "standoff_kfields": _SQL_STANDOFF_KFIELDS,
    "standoff_afields": _SQL_STANDOFF_AFIELDS,
    "a3_toc": _a3_toc_sql(),
    "kpos_roundtrip_col": _kpos_col_sql(),
    "incremental_hourly": _SQL_INCREMENTAL_HOURLY,
    "train_split": _SQL_TRAIN_SPLIT,
    "sample_per_source": _SQL_SAMPLE_PER_SOURCE,
    "context_chunks": _SQL_CONTEXT_CHUNKS,
    "embed_neardup_lsh": _embed_neardup_lsh_sql(),
    "dedup_components": _SQL_DEDUP_COMPONENTS,
    "local_supplier_volume": _SQL_LOCAL_SUPPLIER_VOLUME,
    "media_base64": _SQL_MEDIA_BASE64,
    "stream_sliding": _stream_sliding_sql(),
    "minhash_md5": _minhash_md5_sql(),
    "simhash_md5": _SQL_SIMHASH_MD5,
    "ivf_kmeans_topk": _ivf_kmeans_sql(),
    "repetition_ngrams": _SQL_REPETITION_NGRAMS,
    "tfidf_topk": _SQL_TFIDF_TOPK,
    "host_stats": _host_stats_sql(),
    "text_embed_topk": _text_embed_topk_sql(),
    "scrub_phone_fixture": _SQL_SCRUB_PHONE_FIXTURE,
    "line_dedup": _line_dedup_sql(),
    "decontaminate": _SQL_DECONTAMINATE,
    "url_dedup": _url_dedup_sql(),
    "dup_spans": _dup_spans_sql(),
    "dsir_weights": _SQL_DSIR_WEIGHTS,
    "domain_mix": _SQL_DOMAIN_MIX,
    "semdedup": _semdedup_sql(),
    "quality_classifier": _SQL_QUALITY_CLASSIFIER,
    "classifier_train": _SQL_CLASSIFIER_TRAIN,
    "url_filter": _url_filter_sql(),
    "intra_line_dedup": _intra_line_dedup_sql(),
    "c4_line_filter": _c4_line_filter_sql(),
    "gopher_rules": _gopher_rules_sql(),
    "gopher_dup_lines": _gopher_dup_lines_sql(),
    "gopher_ngram_gates": _gopher_ngram_gates_sql(),
    "normalized_dedup": _normalized_dedup_sql(),
    "minhash_dedup": _minhash_dedup_sql(),
    "cross_snapshot_minhash": _cross_snapshot_minhash_sql(),
    "pack_sequences": _SQL_PACK_SEQUENCES,
    "bpe_pair_counts": _SQL_BPE_PAIR_COUNTS,
    "bpe_merges": _bpe_merges_sql(),
    "bpe_vocab": _bpe_vocab_sql(),
    "bpe_encode_docs": _bpe_encode_docs_sql(),
    "bpe_fertility": _bpe_fertility_sql(),
    "dup_span_cut": _dup_span_cut_sql(),
    "pack_tokens": _SQL_PACK_TOKENS,
    # ccnet_buckets_approx: NO oracle by design (percentile_approx has no
    # DuckDB twin); agreement with the exact assigner is pytest-gated
}
