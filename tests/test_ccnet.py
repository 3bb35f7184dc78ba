"""CCNet sharding: the exact ntile assigner (oracle-gated as the
`ccnet_buckets` query) vs the approx-quantile scale path."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ksana_corpus_builder_spark.queries import (_ccnet_labels,
                                                ccnet_buckets_approx)

SF = "/root/testdata/sf0.01"


def test_approx_deciles_agree_with_exact(spark):
    """The boundary-predicate assigner (no per-language sort — the 10^12
    path) must agree with the exact per-language ntile for nearly every
    document; disagreement is confined to ties at decile boundaries."""
    lab = _ccnet_labels(spark, SF)
    w = Window.partitionBy("lang_detected").orderBy(
        F.round("perplexity", 6), "doc_id")
    exact = (lab.withColumn("d_exact", F.ntile(10).over(w))
             .select("doc_id", "d_exact"))
    approx = ccnet_buckets_approx(spark, SF).withColumnRenamed(
        "ppl_decile", "d_approx")
    j = exact.join(approx, "doc_id")
    n = j.count()
    n_agree = j.where(F.col("d_exact") == F.col("d_approx")).count()
    n_close = j.where(
        F.abs(F.col("d_exact") - F.col("d_approx")) <= 1).count()
    assert n > 0
    assert n_agree / n >= 0.80, f"agreement {n_agree}/{n}"
    assert n_close / n >= 0.99, f"within-one {n_close}/{n}"


def test_approx_deciles_cover_range(spark):
    a = ccnet_buckets_approx(spark, SF)
    stats = a.agg(F.min("ppl_decile"), F.max("ppl_decile")).collect()[0]
    assert stats[0] >= 1 and stats[1] <= 10
