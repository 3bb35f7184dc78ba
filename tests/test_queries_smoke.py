"""Smoke: every queries() entry runs at sf0.001 and returns a stable schema.
(Full value-level oracle comparison: tools/check_oracle.py at sf0.01 and the
driver's own gate.)"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
QS = entrymod.queries()


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert {"doc_id", "keep", "lang_detected"} <= set(df.columns)


@pytest.mark.parametrize("name", sorted(QS))
def test_query_runs(spark, name):
    df = QS[name](spark, SF)
    assert df.columns  # schema resolves
    df.limit(3).collect()  # executes


def test_oracle_keys_subset():
    assert set(entrymod.oracle_sql()) <= set(QS)


def test_quality_classifier_feature_count_and_sign_rule(spark):
    """fastText-shape invariants: n_feats == 2*n_tok - 1 for docs with
    >= 2 tokens (unigrams + wordNgrams=2 bigrams, token multiplicity
    preserved), n_feats == n_tok below that; keep == (n_feats > 0 AND
    qc_score >= 0) — the integer sign rule that equals the sign of the
    mean-pooled linear score."""
    from pyspark.sql import functions as F
    df = QS["quality_classifier"](spark, SF)
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    d = (spark.read.parquet(f"{SF}/documents.parquet")
         .select("doc_id", F.size(toks).alias("n_tok")))
    rows = df.join(d, "doc_id").collect()
    assert rows
    for r in rows:
        expect = 2 * r.n_tok - 1 if r.n_tok >= 2 else r.n_tok
        assert r.n_feats == expect, r
        assert r.keep == (r.n_feats > 0 and r.qc_score >= 0), r
