"""ksana_corpus_builder_spark — a PySpark-native corpus quality engine.

A brand-new implementation (NOT a port) of the capabilities of
ksanaforge/ksana-corpus-builder, re-imagined Spark-first:

- the reference's per-document parse -> tokenize -> annotate -> index ->
  columnar-serialize dataflow becomes a declarative DataFrame pipeline with
  vectorized pandas/Arrow UDF kernels (zero per-row Python),
- its hand-rolled columnar KDB writer becomes Parquet/Iceberg,
- its mutable accumulators become groupBy/window aggregations,
- plus the web-scale quality layer the north rule asks for: language ID,
  perplexity scoring, Gopher/C4-style heuristic keep/drop rules,
  PII/toxicity scrubbing, dedup, similarity search, lineage + metrics.

Layout:
    session.py     SparkSession factory tuned for the target scale
    codec.py       packed positional address (kpos) codec
    tokenizer.py   vectorized tokenizer v2 semantics
    functions/     vectorized text/quality/langid/scrub/perplexity kernels
    operators/     tpos assignment, postings, bigrams, dedup, ANN, range join
    sources/       table loaders + deterministic synthetic pages
    plans/         end-to-end quality pipeline (labels/scrubbed/metrics)
    streaming/     incremental (snapshot-checkpointed) processing
    oracle/        pure-pandas golden oracle (no Spark) for fixture generation
"""

__version__ = "0.1.0"
