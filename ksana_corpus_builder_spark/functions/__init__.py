"""Vectorized kernels (pd.Series in / pd.Series out) shared by:

- the Spark pipeline (wrapped in pandas_udf / mapInPandas — Arrow batches,
  zero per-row Python),
- the pure-pandas golden oracle (same code, no Spark), and
- fixture generation.

Single source of truth for the semantics the north rule requires
(byte-identical scrubbed text, F1>=0.99 keep/drop agreement).
"""
