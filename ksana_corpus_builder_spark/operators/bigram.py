"""Bigram adjacency + whitelist — the reference's two-job pattern (E4).

Job 1 (genbigram.js): count adjacent pairs, keep count > minoccur ->
whitelist artifact. Job 2 (inverted.js:55-73): while indexing, look each
(prev, cur) pair up in the broadcast whitelist and post it at tpos-1.

Spark: `lag(token) OVER (PARTITION BY doc ORDER BY pos)` for adjacency —
the window partitions by document, so it scales embarrassingly (no global
sort); the whitelist is a broadcast semi-join.

Subtlety preserved from the reference (inverted.js:40-45): when punctuation
is REMOVED, it must not reset adjacency — pairs separated by removed
punctuation still count. In the token-table model this falls out naturally:
removed tokens simply aren't rows, and lag sees through them. Regression
test: tests/test_operators.py::test_bigram_through_punctuation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def adjacent_pairs(tokens: DataFrame, id_col: str = "doc_id",
                   pos_col: str = "pos") -> DataFrame:
    """tokens -> (doc_id, pos, bigram='prev cur') for every adjacent pair."""
    w = Window.partitionBy(id_col).orderBy(pos_col)
    return (
        tokens.withColumn("prev", F.lag("token").over(w))
        .where(F.col("prev").isNotNull())
        .select(id_col, pos_col,
                F.concat_ws(" ", "prev", "token").alias("bigram"))
    )


def bigram_counts(tokens: DataFrame, minoccur: int = 0,
                  id_col: str = "doc_id") -> DataFrame:
    """genbigram summary: pair -> count, thresholded (HAVING, not top-k —
    reference genbigram.js:66)."""
    counts = adjacent_pairs(tokens, id_col).groupBy("bigram").agg(
        F.count("*").alias("cnt"))
    return counts.where(F.col("cnt") > minoccur) if minoccur else counts


def whitelist_postings(tokens_with_tpos: DataFrame, whitelist: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """Job-2 shape: bigram postings recorded at the FIRST token's tpos
    (reference posts at tPos-1, inverted.js:57-58)."""
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = (
        tokens_with_tpos
        .withColumn("prev", F.lag("token").over(w))
        .withColumn("prev_tpos", F.lag("tpos").over(w))
        .where(F.col("prev").isNotNull())
        .select(F.concat_ws(" ", "prev", "token").alias("bigram"),
                F.col("prev_tpos").alias("tpos"))
    )
    return pairs.join(F.broadcast(whitelist.select("bigram")), "bigram", "left_semi")
