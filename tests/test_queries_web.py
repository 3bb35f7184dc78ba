"""Invariant tests for the web-graph / cross-snapshot queries
(queries_web.py) — value parity itself is pinned by the DuckDB twins via
tools/check_oracle.py; these pin the ALGORITHMS against independent numpy/
pandas replays and the structural invariants the oracles can't state."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ksana_corpus_builder_spark import queries_web as qw

SF = "/root/testdata/sf0.001"


def test_pagerank_matches_numpy_replay(spark):
    """The distributed integer PageRank equals a straight-line numpy
    replay of the same recurrence (independent of both engines)."""
    out = {r.doc_id: r.pr for r in qw.q_pagerank(spark, SF).collect()}
    n = len(out)
    assert n > 0
    r = np.full(n, qw._PR_S, dtype=np.int64)
    src = np.arange(n, dtype=np.int64)
    dsts = [(src * 73 + 11) % n, (src * 131 + 29) % n]
    for _ in range(qw._PR_ITERS):
        inbound = np.zeros(n, dtype=np.int64)
        for dst in dsts:
            np.add.at(inbound, dst, r // 2)
        r = qw._PR_BASE + (17 * inbound) // 20
    for i in range(n):
        assert out[i] == r[i], (i, out[i], r[i])


def test_pagerank_mass_bounds(spark):
    """Every rank >= the damping base; floor division only loses mass, so
    total mass never exceeds N * S."""
    rows = qw.q_pagerank(spark, SF).collect()
    assert all(r.pr >= qw._PR_BASE for r in rows)
    assert sum(r.pr for r in rows) <= len(rows) * qw._PR_S


def test_boilerplate_blocks_pandas_replay(spark):
    """Block lexing + keep decisions + re-join equal a pure-Python replay
    over the same staged html bytes."""
    import re

    from ksana_corpus_builder_spark.queries import stage_pages
    staged = stage_pages(spark, SF)
    pdf = pd.read_parquet(staged, columns=["url", "html"])
    got = {r.url: r for r in qw.q_boilerplate_blocks(spark, SF).collect()}
    assert len(got) == len(pdf)
    pat = re.compile(r"<p>(.*?)</p>", re.DOTALL)
    for url, html in zip(pdf["url"], pdf["html"]):
        blocks = pat.findall(bytes(html).decode("utf-8"))
        kept = [b for b in blocks if len(b) >= qw._BB_MIN_CHARS]
        joined = "\n".join(kept)
        g = got[url]
        assert g.n_blocks == len(blocks)
        assert g.n_kept == len(kept)
        assert g.main_chars == sum(len(b) for b in kept)
        assert g.content_md5 == hashlib.md5(joined.encode()).hexdigest()


def test_cross_snapshot_dedup_split_semantics(spark):
    """Re-crawl rows (id >= 2*OFF) are duplicates by construction; the
    genuinely-new rows are duplicates only on a real old-content hash hit
    (verified against a pandas replay of the old-snapshot hash set)."""
    d = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    old_hashes = {hashlib.md5(t.encode()).hexdigest()
                  for t in d[d.doc_id % 3 != 2]["text"]}
    rows = qw.q_cross_snapshot_dedup(spark, SF).collect()
    n_new = (d.doc_id % 3 == 2).sum()
    n_recrawl = ((d.doc_id % 3 != 2) & (d.doc_id % 5 == 0)).sum()
    assert len(rows) == n_new + n_recrawl
    for r in rows:
        if r.new_id >= 2 * qw._XS_OFF:
            assert r.is_dup, r  # re-crawl of an old doc
        else:
            assert r.is_dup == (r.h in old_hashes), r


def test_stream_dedup_state_spans_batches(spark):
    """The staged input holds the duplicates in a SECOND file (later
    micro-batch at maxFilesPerTrigger=1); output = the distinct content
    hashes of the whole input, proving dedup state survived the batch
    boundary."""
    from ksana_corpus_builder_spark.sources.pages import (
        STREAM_DEDUP_N, stage_stream_dedup)
    staged = stage_stream_dedup()
    pdf = pd.read_parquet(staged, columns=["text"])
    assert len(pdf) == STREAM_DEDUP_N  # originals + re-crawl duplicates
    expect = {hashlib.md5(t.encode()).hexdigest() for t in pdf["text"]}
    got = {r.h for r in qw.q_stream_dedup(spark, SF).collect()}
    assert got == expect
    assert len(got) < STREAM_DEDUP_N  # something was actually deduped
