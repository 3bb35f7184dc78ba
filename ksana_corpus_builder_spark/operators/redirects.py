"""Redirect-chain resolution by pointer doubling (pointer jumping).

Crawl frontiers carry HTTP redirect edges (src -> location); URL
canonicalization and dedup need every source resolved to its FINAL
target, and real chains run several hops deep (http -> https -> www ->
path rewrite). A naive per-hop loop is O(L) shuffle joins for chains of
length L; the resolver here is the classic pointer-jumping composition —
each round joins the partial function with ITSELF, so k rounds resolve
any chain up to 2^k hops.

The reference resolves linkTo / corpus@addr targets with in-memory map
lookups (reference reverselink.js:34-59 importLinks walks addresses and
rewrites each `to` to resolved number form, single-process); this is the
distributed re-imagination: every round is one key-keyed shuffle
self-join between two corpus-sized sides — never a broadcast, never a
collect — the same O(log n) discipline as
:mod:`ksana_corpus_builder_spark.operators.components` large-star.

100 TB shape: per round the plan is one hash-partitioned self-join on
the current target key; rows carry (src, nxt, hops) longs only. Chains
in web redirect graphs are short (HTTP clients cap follow depth at
~10-20), so 4-5 rounds cover everything a crawler would have followed;
cycles (which real redirect graphs do contain) are absorbed — a node on
a cycle keeps composing forever, so callers cap rounds and treat
hops >= 2^rounds as "unresolved/looping", exactly what a fetcher does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_chains(edges: DataFrame, rounds: int, src: str = "src",
                   nxt: str = "nxt", hops: str = "hops") -> DataFrame:
    """Compose the redirect partial function with itself `rounds` times.

    `edges` must hold exactly one row per node: (src, nxt, hops) with
    TERMINAL nodes pointing at themselves with hops = 0 (the self-loop
    makes the terminal absorbing: composing past it adds 0). Returns the
    same (src, nxt, hops) shape where nxt is the node reached after
    min(chain length, 2^rounds) hops from src and hops counts the real
    hops taken — so any chain of length <= 2^rounds lands exactly on its
    terminal with its true length.
    """
    cur = edges.select(src, nxt, hops)
    for _ in range(int(rounds)):
        b = cur.select(F.col(src).alias("_jsrc"),
                       F.col(nxt).alias("_jnxt"),
                       F.col(hops).alias("_jhops"))
        cur = (cur.join(b, F.col(nxt) == F.col("_jsrc"))
               .select(F.col(src),
                       F.col("_jnxt").alias(nxt),
                       (F.col(hops) + F.col("_jhops")).alias(hops)))
    return cur
