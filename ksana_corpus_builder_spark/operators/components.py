"""Connected components over near-duplicate pair graphs — the clustering
step that turns pairwise dedup candidates (exact/minhash/jaccard pairs)
into keep-one-representative groups.

Algorithm: min-label propagation to fixpoint — every vertex repeatedly
takes the minimum label among itself and its neighbors. Converges in
`diameter(G)` rounds; near-dup clusters are shallow (stars/cliques), so
2-4 rounds is typical. Each round is one shuffle on the edge key plus a
map-side min; lineage is truncated per round with localCheckpoint so the
plan stays bounded. At 10^12-edge scale the same loop runs with the
large-star/small-star optimization (alternately hang high vertices off
cluster minima — O(log n) rounds); the fixpoint contract and the per-round
join shape are identical, which is what the oracle pins.

The DuckDB twin computes the same fixpoint as a recursive-CTE transitive
closure (min reachable vertex id), so the whole iterative operator is
value-checked, not just row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", vertices: DataFrame | None = None,
                         max_iter: int = 25) -> DataFrame:
    """edges(src, dst) [+ optional vertices(id)] -> (id, component) where
    component = min vertex id in the connected component. Vertices not in
    `vertices` but present in edges are included; isolated vertices keep
    their own id as the component."""
    ends = (edges.select(F.col(src).alias("id"))
            .unionByName(edges.select(F.col(dst).alias("id"))))
    v = ends if vertices is None else ends.unionByName(
        vertices.select(F.col(vertices.columns[0]).alias("id")))
    labels = v.distinct().withColumn("label", F.col("id"))
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionByName(edges.select(F.col(dst).alias("a"),
                                     F.col(src).alias("b"))))

    from pyspark.sql import Observation

    for _ in range(max_iter):
        nbr = (sym.join(labels, sym.b == labels.id)
               .groupBy("a").agg(F.min("label").alias("nbr_label")))
        upd = F.least(labels.label, F.coalesce(nbr.nbr_label, labels.label))
        new = (labels.join(nbr, labels.id == nbr.a, "left")
               .select(labels.id, upd.alias("label"),
                       (upd != labels.label).alias("changed")))
        # ONE Spark job per round: the convergence metric is a CollectMetrics
        # node (df.observe) evaluated DURING the localCheckpoint job, not a
        # separate count() join afterwards — JVM-side, zero extra passes
        # (tests assert the one-job-per-round contract via job groups).
        obs = Observation()
        new = new.observe(obs, F.sum(F.col("changed").cast("long"))
                          .alias("n_changed"))
        new = (new.select("id", "label")
               .localCheckpoint())  # truncate per-round lineage (eager job)
        labels = new
        if not obs.get["n_changed"]:
            break
    else:
        raise RuntimeError(f"components did not converge in {max_iter} rounds")
    return labels.select("id", F.col("label").alias("component"))
