"""Join-mode proof for the doc-dim offsets->tokens join (VERDICT r4 #1)
and the line_dedup boilerplate tag join (VERDICT r4 #3): both must be
size-AWARE (planner's choice), never hint-FORCED broadcasts.

Observable: with spark.sql.autoBroadcastJoinThreshold=-1 — simulating a
build side too big to broadcast, which is what one row per document IS at
the module's 10^12-doc design point — the join must DEMOTE to
SortMergeJoin. A F.broadcast() hint would keep it BroadcastHashJoin
regardless of the threshold. Results must be identical either way.
"""

from __future__ import annotations

import io
from contextlib import contextmanager, redirect_stdout

import pandas as pd
from pyspark.sql import functions as F

from ksana_corpus_builder_spark.operators.tpos import with_tpos


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@contextmanager
def _no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _toy_tokens(spark):
    rows = [(d, p, f"t{(d * 7 + p) % 5}")
            for d in range(40) for p in range(d % 6 + 1)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "pos", "token"]))


def test_with_tpos_offsets_join_demotes_to_smj(spark):
    t = _toy_tokens(spark)
    base = sorted(map(tuple, with_tpos(t).collect()))
    with _no_broadcast(spark):
        df = with_tpos(t)
        plan = _plan(df)
        # the offsets->tokens join demotes (no hint); the chunk-dim totals
        # joins inside the hierarchical prefix sum stay hinted by design
        assert "SortMergeJoin" in plan
        assert "BroadcastHashJoin" in plan
        assert sorted(map(tuple, df.collect())) == base


def test_book_offsets_join_demotes_to_smj(spark):
    from ksana_corpus_builder_spark.operators.tpos import (
        doc_offsets_with_books,
    )
    t = _toy_tokens(spark).withColumn(
        "book", (F.col("doc_id") / 8).cast("long"))
    offs = doc_offsets_with_books(t)
    join = t.join(offs, ["book", "doc_id"])
    base = sorted(map(tuple, join.collect()))
    with _no_broadcast(spark):
        df = t.join(doc_offsets_with_books(t), ["book", "doc_id"])
        plan = _plan(df)
        assert "SortMergeJoin" in plan
        assert sorted(map(tuple, df.collect())) == base


def test_line_dedup_tag_join_demotes_to_smj(spark):
    from ksana_corpus_builder_spark.queries_ref import q_line_dedup
    sf = "/root/testdata/sf0.001"
    base = {r.url: (r.n_lines, r.n_dropped, r.text_kept)
            for r in q_line_dedup(spark, sf).collect()}
    with _no_broadcast(spark):
        df = q_line_dedup(spark, sf)
        plan = _plan(df)
        assert "SortMergeJoin" in plan
        assert "BroadcastHashJoin" not in plan  # nothing hinted in here
        got = {r.url: (r.n_lines, r.n_dropped, r.text_kept)
               for r in df.collect()}
        assert got == base
