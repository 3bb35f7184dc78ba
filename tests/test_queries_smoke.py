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
