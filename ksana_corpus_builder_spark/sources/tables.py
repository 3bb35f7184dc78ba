"""Table loaders for the driver's deterministic parquet testdata.

Scale notes: at 100 TB the same call sites read Iceberg tables
(``spark.read.format("iceberg").load(...)``) with partition pruning on
url-hash buckets + warc_ts days; here they read parquet directories. The
loader keeps the scan declarative — no caching, no collects — so Catalyst
pushes filters/column pruning into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
