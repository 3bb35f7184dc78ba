"""Connected components over near-duplicate pair graphs — the clustering
step that turns pairwise dedup candidates (exact/minhash/jaccard pairs)
into keep-one-representative groups.

Two interchangeable fixpoint engines with the same (id, component) output
contract — component = min vertex id in the connected component:

- ``connected_components`` — min-label propagation: every vertex
  repeatedly takes the minimum label among itself and its neighbors.
  Converges in `diameter(G)` rounds; ideal for shallow near-dup clusters
  (stars/cliques, 2-4 rounds), degenerate on long chains.
- ``connected_components_star`` — the two-phase large-star/small-star
  alternation (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14): large-star hangs every high neighbor of u off
  min(N(u) ∪ {u}); small-star re-points u and its low neighbors at their
  minimum. Each phase is one shuffle-on-key aggregation plus a key join;
  converges in O(log n) rounds regardless of diameter (a 10k-vertex
  CHAIN converges in ~15 rounds — pytest-pinned ≤ 30), which is the
  10^12-edge production path. Fixpoint is detected exactly: the edge set
  is a star forest iff no vertex appears on both the child and the
  parent side, a cheap distinct-key semi-join probe per round.

Both engines truncate per-round lineage with localCheckpoint so the plan
stays bounded. The DuckDB twin computes the same fixpoint as a
recursive-CTE transitive closure (min reachable vertex id), so the whole
iterative operator is value-checked, not just row-counted — and both
engines are equivalence-tested against each other on random graphs.
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


def connected_components_star(edges: DataFrame, src: str = "src",
                              dst: str = "dst",
                              vertices: DataFrame | None = None,
                              max_iter: int = 60,
                              stats: dict | None = None) -> DataFrame:
    """Large-star/small-star connected components — same output contract
    as ``connected_components`` ((id, component), component = min id),
    O(log n) rounds on any topology. ``stats``, when given, receives
    ``{"rounds": k}`` for convergence tests."""
    ends = (edges.select(F.col(src).alias("id"))
            .unionByName(edges.select(F.col(dst).alias("id"))))
    all_v = ends if vertices is None else ends.unionByName(
        vertices.select(F.col(vertices.columns[0]).alias("id")))
    all_v = all_v.distinct().localCheckpoint()

    # canonical child->parent orientation: a = max endpoint, b = min
    e = (edges.select(F.greatest(F.col(src), F.col(dst)).alias("a"),
                      F.least(F.col(src), F.col(dst)).alias("b"))
         .where(F.col("a") != F.col("b")).distinct().localCheckpoint())

    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star: every neighbor v > u re-points at m = min(N(u)∪{u})
        sym = (e.select(F.col("a").alias("u"), F.col("b").alias("v"))
               .unionByName(
                   e.select(F.col("b").alias("u"), F.col("a").alias("v"))))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
                .select("u", F.least("mn", "u").alias("m")))
        e1 = (sym.join(mins, "u").where(F.col("v") > F.col("u"))
              .select(F.col("v").alias("a"), F.col("m").alias("b"))
              .distinct())  # v > u >= m, so (a, b) stays canonical
        # small-star: u and its low neighbors re-point at their minimum
        mn = e1.groupBy("a").agg(F.min("b").alias("m"))
        small = (e1.join(mn, "a")
                 .where(F.col("b") != F.col("m"))
                 .select(F.greatest("b", "m").alias("a"),
                         F.least("b", "m").alias("b"))
                 .unionByName(  # m = min(b) < a always
                     mn.select("a", F.col("m").alias("b"))))
        e = small.distinct().localCheckpoint()
        # exact fixpoint probe: a star forest has no vertex that is both a
        # child (a side) and a parent (b side) — one semi-join on distinct
        # keys, O(|V|) rows
        if (e.select("a").intersect(e.select(F.col("b").alias("a")))
                .isEmpty()):
            break
    else:
        raise RuntimeError(
            f"star components did not converge in {max_iter} rounds")
    if stats is not None:
        stats["rounds"] = rounds

    labels = (e.select(F.col("a").alias("id"), F.col("b").alias("component"))
              .unionByName(e.select(F.col("b").alias("id"),
                                    F.col("b").alias("component")))
              .distinct())
    return (all_v.join(labels, "id", "left")
            .select("id", F.coalesce("component", "id").alias("component")))
