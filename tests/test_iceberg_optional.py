"""Optional real-Iceberg gate (VERDICT r2 next-round #4).

BASELINE.json's north rule names Iceberg tables with snapshot-incremental
reads. This container ships NO iceberg-spark runtime jar and no network to
fetch one (verified: no *iceberg* jar under the pyspark jars dir, no ivy
cache, no pyiceberg) — so the repo simulates snapshot-incremental semantics
with parquet + a manifest checkpoint (streaming/incremental.py), and that
simulation is value-ORACLE-GATED by the `incremental_hourly` query
(manifest resume == batch GROUP BY, exact DuckDB parity).

This test closes the remaining gap honestly: when a runtime jar IS
available (point SPARK_GRAFT_ICEBERG_JAR at it, or drop it into the
pyspark jars dir), it exercises the REAL `writeTo(...).create()` /
`append()` / `option("start-snapshot-id", ...)` path end-to-end in a
fresh subprocess JVM and asserts incremental reads see exactly the rows
appended after the first snapshot — the same contract incremental_hourly
pins. Absent the jar, it skips with the reason recorded.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _iceberg_jar() -> str | None:
    env = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    import pyspark
    jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    hits = glob.glob(os.path.join(jars_dir, "iceberg-spark-runtime*.jar"))
    return hits[0] if hits else None


_DRIVER = r"""
import json, sys
from pyspark.sql import SparkSession

warehouse, jar = sys.argv[1], sys.argv[2]
spark = (SparkSession.builder.master("local[2]")
    .config("spark.jars", jar)
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.local.type", "hadoop")
    .config("spark.sql.catalog.local.warehouse", warehouse)
    .config("spark.ui.enabled", "false")
    .getOrCreate())

t = "local.db.pages"
spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string") \
    .writeTo(t).create()
snap1 = spark.sql(f"SELECT snapshot_id FROM {t}.snapshots "
                  "ORDER BY committed_at").collect()[0][0]
spark.createDataFrame([(3, "c"), (4, "d")], "id long, v string") \
    .writeTo(t).append()
inc = (spark.read.format("iceberg")
       .option("start-snapshot-id", str(snap1))
       .load(t).orderBy("id").collect())
full = spark.read.format("iceberg").load(t).count()
print(json.dumps({"incremental_ids": [r.id for r in inc], "full": full}))
"""


def test_iceberg_snapshot_incremental_read(tmp_path):
    jar = _iceberg_jar()
    if jar is None:
        pytest.skip(
            "no iceberg-spark runtime jar in this container (and no network "
            "to fetch one); snapshot-incremental semantics are oracle-gated "
            "via incremental_hourly (parquet + manifest simulation). Set "
            "SPARK_GRAFT_ICEBERG_JAR to run the real writeTo/start-snapshot"
            "-id path.")
    r = subprocess.run(
        [sys.executable, "-c", _DRIVER, str(tmp_path / "wh"), jar],
        capture_output=True, text=True, check=True, cwd=_REPO)
    out = json.loads(r.stdout.strip().splitlines()[-1])
    # incremental read from snapshot 1 sees ONLY the second append
    assert out["incremental_ids"] == [3, 4]
    assert out["full"] == 4
