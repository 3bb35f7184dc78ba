"""Inverted-index build (reference ``inverted.js`` finalize re-imagined).

posting list  = groupBy(token).agg(sort_array(collect_list(tpos)))
posting stats = count / min / max (cheap, shuffle-light: partial aggs
map-side, and the groupBy key is the token so AQE handles stop-word skew;
for truly hot tokens add a salt column and re-merge, see `salted_postings`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def posting_lists(tokens_with_tpos: DataFrame) -> DataFrame:
    """-> (token, postings array<long>, posting_length) sorted by token
    (reference inverted.js:96-114 sorts tokens lexicographically)."""
    return (
        tokens_with_tpos.groupBy("token")
        .agg(F.sort_array(F.collect_list("tpos")).alias("postings"),
             F.count("*").alias("posting_length"))
        .orderBy("token")
    )


def posting_stats(tokens_with_tpos: DataFrame) -> DataFrame:
    """Hash-comparable projection: no arrays, pure scalars."""
    return (
        tokens_with_tpos.groupBy("token")
        .agg(F.count("*").alias("posting_length"),
             F.min("tpos").alias("min_tpos"),
             F.max("tpos").alias("max_tpos"))
    )


def salted_postings(tokens_with_tpos: DataFrame, salts: int = 16) -> DataFrame:
    """Skew path for 100 TB: two-stage agg — collect per (token, salt), then
    merge sorted runs per token. The second stage sees `salts` rows per hot
    token instead of millions."""
    stage1 = (
        tokens_with_tpos
        .withColumn("salt", F.pmod(F.xxhash64("tpos"), F.lit(salts)))
        .groupBy("token", "salt")
        .agg(F.sort_array(F.collect_list("tpos")).alias("run"),
             F.count("*").alias("n"))
    )
    return (
        stage1.groupBy("token")
        .agg(F.sort_array(F.flatten(F.collect_list("run"))).alias("postings"),
             F.sum("n").alias("posting_length"))
    )
