"""The FLAGSHIP quality pipeline as a Structured Streaming job.

North-rule incremental-ingest shape: new Common-Crawl page files land in a
directory; each trigger runs the SAME fused mapInPandas kernel pass
(extract + rules + langid + perplexity + scrub) over only the new
increment and appends labels. The stage is STATELESS (a pure per-document
map), so append mode needs no watermark and the streaming result must
equal the batch pipeline row-for-row — which is exactly what the oracle
pins: the `stream_quality` query shares the `pages_pipeline` DuckDB twin
verbatim (same staged input, same output contract).

With Trigger.AvailableNow this doubles as a deterministic batch-over-
stream runner; in production the query runs continuously and the
checkpoint makes it resumable per increment (the Iceberg
`start-snapshot-id` analogue for a file-stream source).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_quality_query(spark: SparkSession, staged_dir: str) -> DataFrame:
    from ..plans.quality_pipeline import labels, process

    schema = spark.read.parquet(staged_dir).schema
    stream = spark.readStream.schema(schema).parquet(staged_dir)
    res = labels(process(stream)).select(
        "url", "keep",
        F.concat_ws(",", "rules_hit").alias("rules_hit_str"),
        "lang_detected",
        F.round("lang_score", 6).alias("lang_score"),
        F.round("perplexity", 6).alias("perplexity"))
    name = f"stream_quality_{abs(hash(staged_dir)) % 10**8}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (res.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
    return spark.table(name)
