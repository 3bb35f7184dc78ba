"""Incremental + streaming execution.

The reference is a batch builder whose only "stream" is the intra-document
SAX callback sequence (SURVEY.md §2.10); resumability in the target is
specified as snapshot-increment batch processing (BASELINE.json north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

- incremental.py — manifest-based checkpoint/resume for batch increments
  (the Iceberg snapshot-increment pattern stood up on plain parquet).
- windowed.py — Structured Streaming event-time windowed aggregation with
  watermarks (readStream -> window -> sink).
- sessionize.py — custom stateful operator via applyInPandasWithState.
"""
