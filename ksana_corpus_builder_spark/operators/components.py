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
  10^12-edge production path. Fixpoint is detected exactly — the edge
  set is a star forest iff no vertex appears on both the child and the
  parent side — with a probe-FIRST loop (an already-converged input runs
  zero rounds) costing one tag-union aggregation, not a two-distinct
  intersect join.

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
    # ONE scan of the (possibly expensive — e.g. a Jaccard self-join) edge
    # input: the symmetrized edge list is checkpointed up front and reused
    # by EVERY round and by the vertex set; without this the edge query
    # recomputes once per round plus once for the labels init.
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionByName(edges.select(F.col(dst).alias("a"),
                                     F.col(src).alias("b")))
           .localCheckpoint())
    ends = sym.select(F.col("a").alias("id"))
    v = ends if vertices is None else ends.unionByName(
        vertices.select(F.col(vertices.columns[0]).alias("id")))
    labels = v.distinct().withColumn("label", F.col("id"))

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
    # canonical child->parent orientation (a = max endpoint, b = min),
    # ONE scan of the (possibly expensive) edge input: self-loops survive
    # the checkpoint so the vertex set derives from it too, then drop out
    # of the star rounds.
    e0 = (edges.select(F.greatest(F.col(src), F.col(dst)).alias("a"),
                       F.least(F.col(src), F.col(dst)).alias("b"))
          .distinct().localCheckpoint())
    ends = (e0.select(F.col("a").alias("id"))
            .unionByName(e0.select(F.col("b").alias("id"))))
    all_v = ends if vertices is None else ends.unionByName(
        vertices.select(F.col(vertices.columns[0]).alias("id")))
    all_v = all_v.distinct()  # consumed once (final left join) — stay lazy
    e = e0.where(F.col("a") != F.col("b"))

    rounds = 0
    while not _is_star_forest(e):
        rounds += 1
        if rounds > max_iter:
            raise RuntimeError(
                f"star components did not converge in {max_iter} rounds")
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
    if stats is not None:
        stats["rounds"] = rounds

    labels = (e.select(F.col("a").alias("id"), F.col("b").alias("component"))
              .unionByName(e.select(F.col("b").alias("id"),
                                    F.col("b").alias("component")))
              .distinct())
    return (all_v.join(labels, "id", "left")
            .select("id", F.coalesce("component", "id").alias("component")))


def _is_star_forest(e: DataFrame) -> bool:
    """Exact fixpoint probe: with edges oriented child(a) -> parent(b), the
    set is a star forest iff no vertex appears on BOTH sides. ONE tag-union
    aggregation (groupBy vertex, max of side flags) instead of a
    two-distinct intersect join; duplicates don't affect the flags, so the
    probe runs on the raw edge stream."""
    tag = (e.select(F.col("a").alias("v"), F.lit(1).alias("c"),
                    F.lit(0).alias("p"))
           .unionByName(e.select(F.col("b").alias("v"), F.lit(0).alias("c"),
                                 F.lit(1).alias("p"))))
    both = (tag.groupBy("v").agg(F.max("c").alias("c"), F.max("p").alias("p"))
            .where((F.col("c") == 1) & (F.col("p") == 1)))
    return both.isEmpty()
