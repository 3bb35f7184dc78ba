"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship quality-filter labels over sf0.001 documents
queries()     -> every implemented operator from SURVEY.md §2
oracle_sql()  -> DuckDB twins (see ksana_corpus_builder_spark/queries.py)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ksana_corpus_builder_spark.queries import ORACLE_SQL, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: keep/drop labels + langid over sf0.001 documents via the
    production vectorized-kernel path (plans/quality_pipeline kernels)."""
    sf = "/root/testdata/sf0.001"
    labels = QUERIES["keep_drop"](spark, sf)
    lang = QUERIES["langid"](spark, sf)
    return labels.join(lang, "doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
