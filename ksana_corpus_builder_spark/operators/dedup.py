"""Deduplication family for web-scale corpora.

- exact_duplicates: hash-groupBy on full text (canonical first pass at
  100 TB: hash is computed map-side, shuffle carries only (hash, id)).
- ngram_jaccard_pairs: shingle -> inverted index -> candidate pairs ->
  exact Jaccard verify. All-SQL-expressible (oracle twin exists).
- minhash_lsh_pairs: shingle -> K minhashes (deterministic affine hashes
  over xxhash64) -> band buckets -> bucket join -> verify. The scale path:
  candidate generation touches only colliding bands, never the cross
  product.
- simhash64: 64-bit fingerprint per doc; near-dups differ in few bits.

Determinism: every hash is xxhash64 (Spark built-in, stable across runs and
cluster sizes) composed with fixed affine constants — no Python RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed affine constants for K minhash permutations (public Carter-Wegman
# style universal hashing over a Mersenne prime). The prime and constants
# stay below 2^31 so `h * a + b` fits int64 under ANSI arithmetic.
_P = (1 << 31) - 1


def _perm_constants(k: int) -> list[tuple[int, int]]:
    # deterministic: derived from simple LCG on a fixed seed, no randomness
    a, consts = 0x9E3779B97F4A7C15, []
    for _ in range(k):
        a = (a * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = (a * 2862933555777941757 + 3037000493) % (1 << 63)
        consts.append((a % _P or 1, b % _P))
    return consts


def shingles(documents: DataFrame, n: int = 3, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """word n-gram shingles, distinct per doc -> (doc_id, shingle)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (documents
            .select(id_col, F.explode(F.array_distinct(sh)).alias("shingle")))


def exact_duplicates(documents: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """-> (text_hash, n_docs, doc_ids) for groups with >1 member."""
    return (
        documents
        .select(id_col, F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"),
             F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .where(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(documents: DataFrame, n: int = 3,
                        threshold_num: int = 8, threshold_den: int = 10,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Exact Jaccard >= threshold (integer cross-multiplied: jac >= num/den).

    inverted-index join: pairs share >=1 shingle; |A∩B| = co-count;
    |A∪B| = |A|+|B|-∩. The shingle join is the shuffle; hot shingles are
    the skew risk -> AQE skew-join + an optional frequency cap.
    """
    sh = shingles(documents, n, id_col, text_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    co = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                 F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        co.join(sa, "id_a").join(sb, "id_b")
        .withColumn("uni", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .where(F.col("inter") * threshold_den >= F.col("uni") * threshold_num)
        .select("id_a", "id_b", "inter", "uni")
    )


def minhash_signatures(documents: DataFrame, k: int = 32, n: int = 3,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """-> (doc_id, sig array<long>[k]) via min over affine perms of xxhash64."""
    sh = shingles(documents, n, id_col, text_col)
    h = sh.withColumn("h", F.pmod(F.xxhash64("shingle"), F.lit(_P)))
    mins = [
        F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(_P))).alias(f"m{i}")
        for i, (a, b) in enumerate(_perm_constants(k))
    ]
    agg = h.groupBy(id_col).agg(*mins)
    return agg.select(id_col, F.array(*[f"m{i}" for i in range(k)]).alias("sig"))


def minhash_lsh_pairs(documents: DataFrame, k: int = 32, bands: int = 8,
                      n: int = 3, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Candidate pairs whose signatures collide in >=1 band, with estimated
    Jaccard = matching minhashes / k. Bucket join, never cross product."""
    rows_per_band = k // bands
    sig = minhash_signatures(documents, k, n, id_col, text_col)
    banded = sig.select(
        id_col, "sig",
        F.posexplode(F.array(*[
            F.xxhash64(F.concat_ws(",", *[
                F.element_at("sig", band * rows_per_band + r + 1).cast("string")
                for r in range(rows_per_band)
            ])) for band in range(bands)
        ])).alias("band", "bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                          lambda m: m)) / F.lit(k)
    return cand.select("id_a", "id_b", est.alias("est_jaccard"))


def simhash64(documents: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """64-bit SimHash over word tokens: bit i of the fingerprint is the sign
    of sum over tokens of (+1 if bit i of xxhash64(token) else -1)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    t = documents.select(id_col, F.explode(toks).alias("token"))
    t = t.withColumn("h", F.xxhash64("token"))
    bit_sums = [
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                     1).otherwise(-1)).alias(f"b{i}")
        for i in range(64)
    ]
    agg = t.groupBy(id_col).agg(*bit_sums)
    fp = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return agg.select(id_col, fp.alias("simhash"))
