"""Pointer-doubling redirect resolution: chains resolve in O(log L)
rounds, terminals absorb, under-provisioned rounds saturate predictably,
and cycles never crash (they just keep composing) — the properties that
make the operator safe on a real redirect graph."""

from __future__ import annotations

import pandas as pd

from ksana_corpus_builder_spark.operators.redirects import resolve_chains


def _edges(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["src", "nxt", "hops"]))


def _chain(n):
    """One chain 0 <- 1 <- 2 ... <- n-1 (node 0 terminal)."""
    return [(0, 0, 0)] + [(i, i - 1, 1) for i in range(1, n)]


def test_chain_100_resolves_in_7_rounds(spark):
    got = {r.src: (r.nxt, r.hops)
           for r in resolve_chains(_edges(spark, _chain(100)), 7).collect()}
    assert len(got) == 100
    assert all(got[i] == (0, i) for i in range(100))


def test_rounds_exactly_log2_of_chain(spark):
    # chain length 8 needs ceil(log2(8+1)) -> 2^3 >= 8 hops: 3 rounds
    got = {r.src: (r.nxt, r.hops)
           for r in resolve_chains(_edges(spark, _chain(9)), 3).collect()}
    assert got[8] == (0, 8)


def test_underprovisioned_rounds_saturate(spark):
    # 2 rounds cover only 2^2 = 4 hops: node 9 of a 10-chain reports the
    # node 4 hops upstream, hops == 4 — callers detect hops == 2^rounds
    # as "unresolved" (the crawler's max-redirect cap behavior)
    got = {r.src: (r.nxt, r.hops)
           for r in resolve_chains(_edges(spark, _chain(10)), 2).collect()}
    assert got[9] == (5, 4)
    assert got[3] == (0, 3)  # short chains still resolve exactly


def test_cycle_absorbs_without_divergence(spark):
    # 3-cycle + a tail into it: pointer doubling never terminates a cycle
    # but stays well-defined — after k rounds a cycle node reports 2^k
    # hops (== the unresolved sentinel), the tail node 2^k hops too
    cyc = [(0, 1, 1), (1, 2, 1), (2, 0, 1), (3, 0, 1)]
    got = {r.src: (r.nxt, r.hops)
           for r in resolve_chains(_edges(spark, cyc), 3).collect()}
    assert got[0] == ((8 % 3), 8)    # 8 hops around the 3-cycle from 0
    assert got[3][1] == 8            # tail: 1 into the cycle + 7 around
    assert got[3][0] == (7 % 3)
