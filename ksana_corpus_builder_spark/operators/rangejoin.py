"""Range / as-of joins — the reference's findArticle binary search (J1).

Reference: annotations carry a kpos; articles are a sorted list of start
positions; `findArticle` binary-searches start <= kpos < next_start
(``romable.js:43-59``; callers ``externalmarkup.js:11-14``).

Two Spark strategies, picked by dimension size:

1. broadcast as-of (`asof_join_broadcast`): articles are dim-sized ->
   broadcast sorted starts, `searchsorted` per Arrow batch in a pandas UDF.
   O(batch * log n_articles), zero shuffle of the fact side.
2. union-window (`asof_join_window`): both sides big -> tag rows, union,
   `last(value, ignorenulls) OVER (PARTITION BY key ORDER BY k, is_fact)`
   — one shuffle on the partition key, no cross join, no inequality join
   blow-up. This is the SQL-expressible twin (the DuckDB oracle uses the
   same union-window trick).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_window(facts: DataFrame, dims: DataFrame, on: str,
                     fact_key: str, dim_key: str,
                     value_cols: list[str]) -> DataFrame:
    """For each fact row attach, from the dim row with the greatest
    dim_key <= fact_key in the same `on` group, the `value_cols`.

    Output: facts columns + value_cols (null when no dim precedes).
    """
    dim_types = dict(dims.dtypes)
    f = facts.select(
        "*", F.lit(1).alias("__is_fact"), F.col(fact_key).alias("__k"),
        *[F.lit(None).cast(dim_types[c]).alias(f"__v_{c}") for c in value_cols],
    )
    d = dims.select(
        F.col(on), F.lit(0).alias("__is_fact"), F.col(dim_key).alias("__k"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    u = f.unionByName(d, allowMissingColumns=True)
    w = (Window.partitionBy(on).orderBy("__k", "__is_fact")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u.select(
        *facts.columns,
        F.col("__is_fact"),
        *[F.last(f"__v_{c}", ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.where(F.col("__is_fact") == 1).drop("__is_fact")


def asof_join_broadcast(facts: DataFrame, starts: list[int], labels: list,
                        fact_key: str, out_col: str = "article") -> DataFrame:
    """Dim-side tiny: vectorized binary search per Arrow batch.
    `starts` must be sorted ascending; facts below starts[0] get None."""
    import numpy as np
    from pyspark.sql.types import StringType, StructField, StructType
    schema = StructType(list(facts.schema.fields)
                        + [StructField(out_col, StringType())])
    starts_arr = np.asarray(starts)
    labels_arr = np.asarray(labels, dtype=object)

    def attach(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # whole batch in one vectorized binary search (no per-row bisect)
            idx = np.searchsorted(starts_arr, pdf[fact_key].to_numpy(),
                                  side="right") - 1
            pdf[out_col] = np.where(idx >= 0, labels_arr[np.maximum(idx, 0)],
                                    None)
            yield pdf

    return facts.mapInPandas(attach, schema=schema)
