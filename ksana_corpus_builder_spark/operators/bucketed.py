"""Bucketed (co-located) joins — the at-rest layout lever for 100 TB.

At cluster scale the dominant cost of a big fact-fact join is the shuffle
of both sides. If the tables are WRITTEN bucketed by the join key
(``DataFrameWriter.bucketBy(n, key)``; ``bucket(key, n)`` partition
transform on Iceberg), Catalyst recognizes matching bucket specs and plans
the join with NO Exchange on either side — each task joins bucket i of A
against bucket i of B.

This module packages that contract for the corpus tables:

- :func:`write_bucketed` — persist a DataFrame as a bucketed+sorted table
  (the shape `documents`/`embeddings` should take at rest for repeated
  joins by id).
- :func:`bucketed_join` — join two same-bucketed tables, for plan
  assertion and reuse.

The shuffle-elimination property is asserted in
tests/test_bucketed_join.py by scanning the physical plan for Exchange
nodes (the equality test: same results as the plain join, zero shuffle).

Reference analogue: the KDB at-rest layout is a single sorted file per
corpus (kdbw.js); re-imagined for Spark the "layout decision at write
time that later reads exploit" is bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 8,
                   sort: bool = True) -> None:
    """Persist df as a parquet table bucketed (and bucket-sorted) by key.

    On Iceberg the same intent is ``writeTo(t).partitionedBy(bucket(N,
    key))``; the session-catalog bucketBy form is what local Spark
    supports and carries identical join-planning metadata."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two tables previously written with the SAME bucket spec on
    `key`. With matching specs Catalyst plans SortMergeJoin with zero
    Exchange — each task reads bucket i from both sides."""
    return (spark.table(left_table)
            .join(spark.table(right_table), key, how))
