"""Bucketed co-located join: matching bucket specs must eliminate the
join shuffle (zero Exchange in the physical plan) while producing exactly
the plain-join results.

Auto-broadcast is disabled inside these tests: at test scale Catalyst
would (rightly) broadcast the smaller side, which bypasses bucketing —
the property under test is the big-big join path where broadcast is not
an option and the at-rest bucket layout is what saves the shuffle.
"""

from __future__ import annotations

import io
from contextlib import contextmanager, redirect_stdout

import pandas as pd
from pyspark.sql import functions as F

from ksana_corpus_builder_spark.operators.bucketed import (
    bucketed_join,
    write_bucketed,
)


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


def test_bucketed_join_no_shuffle(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(200), "n_chars": [i * 3 % 97 for i in range(200)]}))
    labels = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(0, 200, 2)),
        "keep": [i % 3 == 0 for i in range(100)]}))
    write_bucketed(docs, "b_docs", "doc_id", buckets=4)
    write_bucketed(labels, "b_labels", "doc_id", buckets=4)
    try:
        with _no_broadcast(spark):
            j = bucketed_join(spark, "b_docs", "b_labels", "doc_id")
            plan = _plan(j)
            assert "Exchange" not in plan, "bucketed join still shuffles"
            assert "SortMergeJoin" in plan
            assert "Bucketed: true" in plan
            got = sorted((r.doc_id, r.n_chars, r.keep) for r in j.collect())
        plain = docs.join(labels, "doc_id")
        want = sorted((r.doc_id, r.n_chars, r.keep) for r in plain.collect())
        assert got == want
        # mismatched bucket counts need a shuffle - proving the
        # zero-Exchange plan above came from the matching bucket specs
        write_bucketed(labels, "b_labels3", "doc_id", buckets=3)
        with _no_broadcast(spark):
            j2 = bucketed_join(spark, "b_docs", "b_labels3", "doc_id")
            assert "Exchange" in _plan(j2)
    finally:
        for t in ("b_docs", "b_labels", "b_labels3"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_aggregate_no_shuffle(spark):
    """groupBy on the bucket key also reuses the at-rest distribution."""
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [i % 50 for i in range(300)],
        "v": list(range(300))}))
    write_bucketed(docs, "b_agg", "doc_id", buckets=4)
    try:
        agg = (spark.table("b_agg").groupBy("doc_id")
               .agg(F.sum("v").alias("s")))
        assert "Exchange" not in _plan(agg)
        got = {r.doc_id: r.s for r in agg.collect()}
        want = {r.doc_id: r.s
                for r in docs.groupBy("doc_id").agg(F.sum("v").alias("s"))
                .collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS b_agg")
