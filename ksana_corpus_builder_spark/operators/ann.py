"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: `F.zip_with` dot product (JVM-side, codegen),
  TakeOrderedAndProject for the top-k — the correctness baseline.
- LSH-bucketed variant (random-hyperplane signs -> bucket join): the scale
  path; probes only colliding buckets. Hyperplanes are deterministic
  (fixed LCG), broadcast as literal arrays.

Dot products accumulate in DOUBLE in list order on both engines, so the
DuckDB oracle (parallel-unnest zip) matches to the last ulp; queries round
to 6 decimals anyway for hash-compare safety.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """-> top-k (vec_id, cos_sim) vs a literal query vector; deterministic
    tie-break on id. Plan: scan -> project (codegen) -> TakeOrderedAndProject
    (no full sort, no shuffle of payloads)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(F.col(vec_col), q).alias("cos_sim")
    return (embeddings.select(id_col, sim)
            .orderBy(F.desc("cos_sim"), id_col).limit(k))


def _hyperplanes(dim: int, nbits: int) -> list[list[float]]:
    # deterministic pseudo-gaussian via fixed LCG -> uniform(-1,1) sums
    state, planes = 0x853C49E6748FEA9B, []
    for _ in range(nbits):
        row = []
        for _ in range(dim):
            acc = 0.0
            for _ in range(3):
                state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
                acc += (state / (1 << 64)) * 2.0 - 1.0
            row.append(acc)
        planes.append(row)
    return planes


def lsh_bucket(embeddings: DataFrame, nbits: int = 12, dim: int = 64,
               vec_col: str = "embedding") -> DataFrame:
    """+ `bucket` column = sign-bit signature under random hyperplanes.

    One numpy matmul per Arrow batch ((rows x dim) @ (dim x nbits) then a
    packed sign-bit dot) — the former per-plane interpreted array
    aggregates cost nbits CodegenFallback passes per row.

    Projections are rounded to 6dp BEFORE the sign test (matching the SQL
    twins' round(list_sum(...), 6) > 0) so summation-order ulp noise can
    never flip a bucket bit near zero — the repo's no-float-threshold rule.
    Contract: `vec_col` is non-null fixed-dim; null vectors cannot be
    bucketed and are dropped here (defensive, none exist in the tables)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    P = np.asarray(_hyperplanes(dim, nbits), dtype=np.float64)  # (nbits, dim)
    weights = (1 << np.arange(nbits)).astype(np.int64)
    out_schema = StructType(list(embeddings.schema.fields)
                            + [StructField("bucket", LongType())])

    def bucketize(batches):
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            pdf = pdf.copy()
            pdf["bucket"] = (np.round(X @ P.T, 6) > 0) @ weights
            yield pdf

    return embeddings.mapInPandas(bucketize, schema=out_schema)


def lsh_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
             nbits: int = 8, multiprobe: int = 1, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN: score only vectors in the query's bucket, plus (multiprobe >= 1)
    every bucket within Hamming distance `multiprobe` of it — the classic
    multi-probe LSH recall lever: probing C(nbits,1) extra buckets beats
    doubling tables for the same cost. Bucket membership is a partition-
    prunable predicate on a stored table at scale."""
    dim = len(query_vec)
    bucketed = lsh_bucket(embeddings, nbits, dim, vec_col)
    planes = _hyperplanes(dim, nbits)
    qb = 0
    for i, p in enumerate(planes):
        if round(sum(x * y for x, y in zip(query_vec, p)), 6) > 0:
            qb |= 1 << i
    probes = {qb}
    frontier = {qb}
    for _ in range(max(0, multiprobe)):
        frontier = {b ^ (1 << i) for b in frontier for i in range(nbits)}
        probes |= frontier
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (bucketed.where(F.col("bucket").isin([int(b) for b in sorted(probes)]))
            .select(id_col, F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), id_col).limit(k))


def lsh_cosine_pairs(embeddings: DataFrame, threshold: float,
                     nbits: int = 6, dim: int = 64,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """LSH-bucketed near-duplicate PAIRS: candidates are only vectors
    sharing a sign-signature bucket (the scale path for embedding dedup —
    the join touches ~n/2^nbits-sized buckets, never the cross product),
    verified by exact cosine >= threshold (rounded to 6dp).

    Candidate recall vs the exact all-pairs plan is bounded by the LSH
    collision probability (tested in tests/test_media_ivf.py); the bucket
    step itself is deterministic, so the whole operator has an exact SQL
    twin. Output: (id_a, id_b, cos_sim), id_a < id_b.

    The verify stage is one dense numpy gram matrix PER BUCKET
    (applyInPandas) — BLAS, not per-pair interpreted expressions; one
    shuffle on the bucket key, which is also the at-rest partition key of
    a bucketed vector table at scale.
    """
    import numpy as np
    import pandas as pd

    b = lsh_bucket(embeddings, nbits, dim, vec_col) \
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "bucket")
    thr = float(threshold)

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        ids = pdf["id"].to_numpy()
        X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        nrm = np.maximum(np.linalg.norm(X, axis=1), 1e-30)
        sims = np.round((X @ X.T) / np.outer(nrm, nrm), 6)
        ia, ib = np.nonzero(np.triu(sims >= thr, k=1))
        lo = np.minimum(ids[ia], ids[ib])
        hi = np.maximum(ids[ia], ids[ib])
        return pd.DataFrame({"id_a": lo.astype("int64"),
                             "id_b": hi.astype("int64"),
                             "cos_sim": sims[ia, ib]})

    return (b.groupBy("bucket")
            .applyInPandas(pairs, schema="id_a long, id_b long, cos_sim double"))


def ivf_centroids(embeddings: DataFrame, n_cells: int = 16,
                  id_col: str = "vec_id", vec_col: str = "embedding"):
    """Normalized coarse-centroid matrix (n_cells x dim). Centroids are the
    first n_cells vectors by id (deterministic coarse quantizer; a k-means
    refinement would slot in unchanged). ONE collect, shared by
    ivf_assign and the probe-selection in ivf_topk."""
    import numpy as np

    cents = [r[1] for r in (embeddings.orderBy(id_col).limit(n_cells)
                            .select(id_col, vec_col)
                            .collect())]  # collect-ok: n_cells rows (dim-sized)
    C = np.asarray(cents, dtype=np.float64)            # (n_cells, dim)
    return C / np.linalg.norm(C, axis=1, keepdims=True)


def ivf_centroids_kmeans(embeddings: DataFrame, n_cells: int = 16,
                         iters: int = 2, id_col: str = "vec_id",
                         vec_col: str = "embedding"):
    """Lloyd-refined coarse quantizer (replaces the first-n placeholder for
    real cell balance). Normalized (n_cells x dim) float64 matrix.

    Every step is deterministic AND cross-engine replayable:
    - init: the n_cells lowest-id vectors (ivf_centroids);
    - assignment: argmax over cells of round(cosine, 6), ties -> lowest
      cell (ivf_assign — the production assignment kernel);
    - update: the new centroid DIRECTION is the component-wise sum of the
      members' 6dp-rounded components, accumulated as DECIMAL(27,6) —
      EXACT, so the result is independent of partitioning/summation order
      (cosine is scale-invariant, so the direction sum needs no division
      and no float mean); empty cells keep their previous direction.
    The per-iteration driver transfer is one n_cells-row collect.
    """
    import numpy as np

    Cn = ivf_centroids(embeddings, n_cells, id_col, vec_col)
    dim = Cn.shape[1]
    for _ in range(max(0, iters)):
        assigned = ivf_assign(embeddings, n_cells, id_col, vec_col,
                              centroids=Cn)
        # component sums via posexplode -> narrow (cell, i) hash agg: the
        # map-side partial agg reduces to n_cells*dim rows before the
        # shuffle, and the plan stays small (a 64-wide decimal agg list
        # recompiles codegen per iteration — measured slower)
        rows = (assigned
                .select("cell", F.posexplode(vec_col).alias("i", "x"))
                .groupBy("cell", "i")
                .agg(F.sum(F.round(F.col("x").cast("double"), 6)
                           .cast("decimal(27,6)")).cast("double").alias("v"))
                .collect())  # collect-ok: n_cells*dim rows (dim-sized)
        S = Cn.copy()  # empty cells keep their previous direction
        touched = {r["cell"] for r in rows}
        for c in touched:
            S[c] = np.zeros(dim)
        for r in rows:
            S[r["cell"]][r["i"]] = r["v"]
        Cn = S / np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-30)
    return Cn


def ivf_assign(embeddings: DataFrame, n_cells: int = 16,
               id_col: str = "vec_id", vec_col: str = "embedding",
               centroids=None) -> DataFrame:
    """+ `cell` column: index of the nearest of n_cells coarse centroids.

    Assignment is a vectorized pandas UDF: one numpy matmul per Arrow
    batch — the 100 TB shape (batch_rows x dim) @ (dim x n_cells), zero
    per-row Python. Similarities are rounded to 6dp before the argmax
    (ties -> lowest cell index) so the assignment is reproducible across
    engines for the oracle twin.
    """
    import numpy as np

    Cn = (centroids if centroids is not None
          else ivf_centroids(embeddings, n_cells, id_col, vec_col))

    from pyspark.sql.types import IntegerType, StructField, StructType
    out_schema = list(embeddings.schema.fields) + [
        StructField("cell", IntegerType())]

    def assign(batches):
        for pdf in batches:
            X = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
            pdf = pdf.copy()
            pdf["cell"] = (np.round(Xn @ Cn.T, 6)
                           .argmax(axis=1).astype("int32"))
            yield pdf

    return embeddings.mapInPandas(assign, schema=StructType(out_schema))


def ivf_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
             n_cells: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids=None) -> DataFrame:
    """IVF ANN: score only vectors in the n_probe cells nearest the query.

    At 10^12 vectors the assignment is precomputed and the table is
    partitioned by `cell`, so a probe reads n_probe/n_cells of the data
    (partition pruning on the cell column); here assignment runs inline.
    The centroid collect happens ONCE and is shared with ivf_assign.
    Pass `centroids` (normalized n_cells x dim) to use a refined quantizer
    (ivf_centroids_kmeans) instead of the first-n coarse one.
    """
    import numpy as np

    Cn = (centroids if centroids is not None
          else ivf_centroids(embeddings, n_cells, id_col, vec_col))
    assigned = ivf_assign(embeddings, n_cells, id_col, vec_col, centroids=Cn)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    # rounded + stable argsort: probe order reproducible for the oracle
    probe = np.argsort(-np.round(Cn @ qn, 6), kind="stable")[:n_probe].tolist()

    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (assigned.where(F.col("cell").isin([int(c) for c in probe]))
            .select(id_col, F.round(cosine(F.col(vec_col), qcol), 6)
                    .alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), id_col).limit(k))


def block_cosine_pairs(embeddings: DataFrame, threshold: float,
                       blocks: int = 8, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """All-pairs cosine >= threshold via BLOCK nested loop + numpy matmul.

    The scale-true all-pairs plan: vectors are hashed into `blocks` buckets;
    every unordered bucket pair (i <= j) becomes one group holding both
    sides' vectors (2*blocks-fold replication through ONE shuffle), and each
    group computes a dense (n_i x d) @ (d x n_j) product — the arithmetic
    runs in BLAS, not per-pair expression evaluation. blocks ~ sqrt(tasks)
    at cluster scale; replication factor is 2*blocks copies of the table.

    Output: (id_a, id_b, cos_sim rounded to 6dp), id_a < id_b.
    """
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    blk = F.pmod(F.col(id_col), F.lit(blocks))
    rng = spark.range(blocks)

    # side A: vector in block i participates in groups (i, j) for j >= i
    a = (embeddings.withColumn("__i", blk)
         .join(rng.select(F.col("id").alias("__j")), F.col("__j") >= F.col("__i"))
         .select("__i", "__j", F.lit(0).alias("__side"),
                 F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")))
    # side B: vector in block j participates in groups (i, j) for i <= j
    b = (embeddings.withColumn("__j", blk)
         .join(rng.select(F.col("id").alias("__i")), F.col("__i") <= F.col("__j"))
         .select("__i", "__j", F.lit(1).alias("__side"),
                 F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")))
    both = a.unionByName(b)

    thr = float(threshold)

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        left = pdf[pdf["__side"] == 0]
        right = pdf[pdf["__side"] == 1]
        if not len(left) or not len(right):
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        ida = left["__id"].to_numpy()
        idb = right["__id"].to_numpy()
        A = np.asarray(list(left["__v"]), dtype=np.float64)
        Bm = np.asarray(list(right["__v"]), dtype=np.float64)
        na = np.maximum(np.linalg.norm(A, axis=1), 1e-30)
        nb = np.maximum(np.linalg.norm(Bm, axis=1), 1e-30)
        # dot first, divide by the norm product after — the same formula
        # shape as the SQL oracle (sum(ab) / (sqrt(aa)*sqrt(bb)))
        sims = np.round((A @ Bm.T) / np.outer(na, nb), 6)
        ia, ib = np.nonzero(sims >= thr)
        u, v = ida[ia], idb[ib]
        if pdf["__i"].iat[0] == pdf["__j"].iat[0]:
            # diagonal group: both sides hold the same block — each
            # unordered pair appears twice, keep the u < v orientation
            keep = u < v
            id_a, id_b = u[keep], v[keep]
            cs = sims[ia, ib][keep]
        else:
            # off-diagonal: each unordered pair appears once; normalize
            keep = u != v
            id_a = np.minimum(u, v)[keep]
            id_b = np.maximum(u, v)[keep]
            cs = sims[ia, ib][keep]
        return pd.DataFrame({"id_a": id_a.astype("int64"),
                             "id_b": id_b.astype("int64"),
                             "cos_sim": cs})

    return (both.groupBy("__i", "__j")
            .applyInPandas(pairs, schema="id_a long, id_b long, cos_sim double"))


def semdedup(embeddings: DataFrame, n_cells: int = 16, iters: int = 2,
             threshold: float = 0.4, id_col: str = "vec_id",
             vec_col: str = "embedding", centroids=None) -> DataFrame:
    """SemDeDup-style semantic deduplication (k-means cluster, then prune
    within clusters): every vector is assigned to its nearest Lloyd-refined
    centroid (ivf_assign — 6dp-rounded cosine argmax, the exact-replayable
    quantizer shared with ivf_topk), and WITHIN each cell a vector is a
    semantic duplicate if some LOWER-id cell-mate has cosine >= threshold
    (keep-lowest-id policy). Output per vector: (vec_id, cell,
    max_lower_sim — 6dp cosine to the nearest lower-id cell-mate, null for
    the cell's id-minimum — is_dup).

    100 TB shape: clustering bounds the quadratic stage to CELL-LOCAL gram
    matrices — one shuffle on the cell key (the at-rest partition key of a
    cell-bucketed vector table), one dense BLAS product per cell, never an
    all-pairs product. Oversized cells split with lsh_cosine_pairs inside
    the cell at extreme scale; here cells are ~n/n_cells.
    """
    import numpy as np
    import pandas as pd

    # prune BEFORE the pandas stages: column pruning does not cross
    # mapInPandas, so an unpruned scan would read every column at 100 TB
    embeddings = embeddings.select(id_col, vec_col)
    Cn = (centroids if centroids is not None
          else ivf_centroids_kmeans(embeddings, n_cells, iters,
                                    id_col, vec_col))
    assigned = (ivf_assign(embeddings, n_cells, id_col, vec_col,
                           centroids=Cn)
                .select(F.col(id_col).alias("vec_id"),
                        F.col(vec_col).alias("v"), "cell"))
    thr = float(threshold)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        X = np.stack(pdf["v"].to_numpy()[order]).astype(np.float64)
        nrm = np.maximum(np.linalg.norm(X, axis=1), 1e-30)
        # dot first, divide after — the oracle's formula shape
        # (sum(xy) / (sqrt(sum(xx)) * sqrt(sum(yy))))
        sims = np.round((X @ X.T) / np.outer(nrm, nrm), 6)
        lower = np.tril(np.ones(sims.shape, dtype=bool), k=-1)
        m = np.where(lower, sims, -np.inf).max(axis=1, initial=-np.inf)
        has_lower = np.isfinite(m)
        return pd.DataFrame({
            "vec_id": ids.astype("int64"),
            "cell": pdf["cell"].to_numpy()[order].astype("int32"),
            "max_lower_sim": pd.arrays.FloatingArray(
                np.where(has_lower, m, 0.0), ~has_lower),
            "is_dup": has_lower & (m >= thr),
        })

    return assigned.groupBy("cell").applyInPandas(
        prune,
        schema="vec_id long, cell int, max_lower_sim double, is_dup boolean")


def quantize_int8(embeddings: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 scalar quantization: q = round(x * 127 /
    max|x|). Cuts the vector footprint 4x (the memory-bound lever for
    billion-scale ANN: scans become int8 SIMD, floats only for the final
    rescale). -> (id, scale double, qvec array<int>)."""
    import numpy as np
    import pandas as pd

    def quant(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            # whole batch in BLAS: (rows x dim) stack, row-wise max, one
            # broadcasted round — zero per-row Python
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m = np.abs(X).max(axis=1)
            m[m == 0.0] = 1.0
            S = X * (127.0 / m)[:, None]
            # round HALF AWAY FROM ZERO (SQL round semantics in both Spark
            # and DuckDB) — np.round is banker's and would diverge from
            # the oracle twin on exact .5 products
            Q = np.trunc(S + np.copysign(0.5, S)).astype(np.int32)
            yield pd.DataFrame({"vec_id": pdf[id_col].to_numpy(),
                                "scale": m / 127.0, "qvec": list(Q)})

    return (embeddings.select(id_col, vec_col)
            .mapInPandas(quant, schema="vec_id long, scale double, qvec array<int>"))


def quantized_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Top-k cosine over int8-quantized vectors (dequantize = int dot *
    scale). Recall vs the exact float path is asserted in tests."""
    q = quantize_int8(embeddings, id_col, vec_col)
    qcol = F.lit([float(x) for x in query_vec]).cast("array<double>")
    dq = F.transform("qvec", lambda v: v.cast("double") * F.col("scale"))
    sim = F.round(cosine(dq, qcol), 6)
    return (q.select(id_col, sim.alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), id_col).limit(k))
