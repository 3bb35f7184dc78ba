"""documents -> long token table, declaratively.

The reference tokenizes per document and feeds a mutable accumulator
(``index.js:192-195`` -> ``inverted.js:putTokens``). Here the token table is
a pure DataFrame transform: split/explode with positions — JVM-side
(whole-stage codegen), no Python in the path.

Token position ``pos`` is 1-based within the document (the reference's
intra-document tpos advance). SPACE tokens never exist (split removes
them); empty strings are filtered, mirroring SPACE-consumes-no-position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_tokens(documents: DataFrame,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """-> (doc_id, pos, token). posexplode keeps ordinal positions."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    return (
        documents.select(id_col, F.posexplode(toks).alias("pos0", "token"))
        .select(id_col, (F.col("pos0") + 1).alias("pos"), "token")
    )
