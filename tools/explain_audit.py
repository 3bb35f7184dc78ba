"""Physical-plan audit: dump .explain('formatted') for the headline queries
and assert the plan properties that matter at 100 TB:

- parquet scans carry PushedFilters / pruned ReadSchema where expected;
- WholeStageCodegen spans exist (JVM-side execution, not interpreted);
- dimension joins are BroadcastHashJoin, not SortMergeJoin;
- AQE is active (AdaptiveSparkPlan root).

Writes PLANS.md at the repo root. Usage: python tools/explain_audit.py
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from ksana_corpus_builder_spark.queries import QUERIES  # noqa: E402
from ksana_corpus_builder_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

# query -> properties we demand of its physical plan. In formatted explain
# output a leading `* ` marks a WholeStageCodegen'd operator; higher-order
# array functions are CodegenFallback by design, so plans dominated by them
# assert a codegen'd scan (`* ColumnarToRow`) instead of a codegen'd
# project.
EXPECT: dict[str, list[str]] = {
    "doc_stats": ["* ColumnarToRow", "ReadSchema: struct<doc_id:bigint,text:string"],
    # AQE roots (AdaptiveSparkPlan) hide codegen `*` markers pre-execution;
    # for those plans assert map-side partial aggregation instead — the
    # property that actually bounds shuffle volume at 100 TB.
    "token_counts": ["Generate", "partial_count"],
    "pricing_summary": ["PushedFilters: [IsNotNull(l_shipdate)",
                        "partial_sum"],
    "top_customers": ["BroadcastHashJoin", "TakeOrderedAndProject"],
    "region_agg": ["BroadcastHashJoin"],
    "ann_topk": ["TakeOrderedAndProject", "BroadcastNestedLoopJoin"],
    "value_buckets": ["BroadcastNestedLoopJoin", "HashAggregate"],
    "first_error": ["PushedFilters: [IsNotNull(event_type), EqualTo(event_type,error)",
                    "Window"],
    "exact_dedup": ["partial_count"],
    # the doc-dim prefix-sum window must be CHUNK-partitioned (partition-
    # local sort on [chunk, doc_id]) — no single-task global window
    "posting_stats": ["HashAggregate", "Arguments: [chunk"],
    "book_tpos_map": ["Arguments: [chunk"],
    "kpos_roundtrip": ["* Project", "Scan parquet"],
    "kpos_roundtrip_col": ["* Project", "Scan parquet"],
    "sessionize": ["Window", "HashAggregate"],
    # map-side partials for the set/distinct aggregation (J5 resolution)
    "reverse_links_resolved": ["partial_collect_set",
                               "partial_count(distinct"],
    "standoff_kfields": ["HashAggregate"],
    "quantized_topk": ["TakeOrderedAndProject"],
    "lineage_metrics": ["partial_count"],
    # round 3: repetition grams must partial-combine map-side (the (doc,
    # gram) agg) and tfidf's dim joins must broadcast, not sort-merge
    "repetition_ngrams": ["partial_count", "partial_max"],
    "tfidf_topk": ["BroadcastHashJoin", "partial_count"],
    "host_stats": ["partial_count", "partial_sum"],
    # round 4: the benchmark gram / DSIR ratio / domain quota side tables
    # must BROADCAST back to the corpus stream (no corpus-sized shuffle
    # for the tag join), and the window aggs must partial-combine map-side
    # where they exist. line_dedup (round 5) tags via a 16-byte md5 hash
    # key with NO broadcast hint — size-aware only (see EXPECT_NOHINT).
    "line_dedup": ["Join type: LeftOuter", "partial_count", "unhex(md5("],
    "decontaminate": ["BroadcastHashJoin", "partial_count"],
    "dsir_weights": ["BroadcastHashJoin", "partial_sum"],
    "domain_mix": ["BroadcastHashJoin", "Window", "partial_count"],
    "url_dedup": ["Window", "partial_count"],
    "dup_spans": ["partial_count"],
    # semdedup: the quadratic stage must be cell-local (ONE exchange, on
    # the cell key, feeding the grouped BLAS stage) and the scan must prune
    # to (vec_id, embedding) — pruning doesn't cross mapInPandas, so it
    # has to happen before the assign stage
    "semdedup": ["hashpartitioning(cell", "FlatMapGroupsInPandas",
                 "ReadSchema: struct<vec_id:bigint,embedding:array<float>>"],
    # round 4 (late): pagerank's per-iteration inbound-mass agg must
    # partial-combine map-side and the scalar N must reach the modulo as a
    # broadcast (never a collect); the scan prunes to doc_id alone.
    "pagerank": ["partial_sum", "BroadcastNestedLoopJoin",
                 "ReadSchema: struct<doc_id:bigint>"],
    # boilerplate extraction is a pure per-row map: the only columns read
    # are (url, html) — assert the pruned scan (no shuffle exists to audit)
    "boilerplate_blocks": ["ReadSchema: struct<url:string,html:binary>"],
    # dump-N-vs-history probe: the old-hash distinct must partial-combine
    # before its exchange (HashAggregate pair), membership via hash join
    "cross_snapshot_dedup": ["HashAggregate", "Join"],
    # perceptron training: the 512-row weight table must BROADCAST onto
    # the feature stream for rescoring (never a corpus-sized shuffle), the
    # update aggs must partial-combine map-side, and the scan prunes to
    # exactly the training columns
    "classifier_train": ["BroadcastHashJoin", "partial_sum",
                         "ReadSchema: struct<doc_id:bigint,text:string,"
                         "n_chars:bigint>"],
    # URL blocklist: the (host, category) dim must BROADCAST (left join),
    # the crawl side reads only the url column, and there is no shuffle —
    # the whole filter is a codegen'd per-row map
    "url_filter": ["BroadcastHashJoin", "LeftOuter",
                   "ReadSchema: struct<url:string>"],
    # intra-doc line dedup: first-occurrence via an algebraic min window
    # on page-bounded (url, line) partitions (no global sort), per-page
    # re-agg partial-combines map-side, scan prunes to (url, text)
    "intra_line_dedup": ["Window", "partial_count",
                         "ReadSchema: struct<url:string,text:string>"],
    # C4 line rules: pure per-row tagging (no shuffle before the per-page
    # re-agg, which partial-combines map-side); scan prunes to (url, text)
    "c4_line_filter": ["partial_count",
                       "ReadSchema: struct<url:string,text:string>"],
    # Gopher gates: exploded lines are tagged and word-folded per-row (no
    # shuffle before the per-page re-agg, which partial-combines map-side
    # incl. the stop-word bitmask bit_or); scan prunes to (url, text)
    "gopher_rules": ["Generate", "partial_sum",
                     "ReadSchema: struct<url:string,text:string>"],
    # Gopher line-repetition gates: two map-side-combined hash aggs
    # ((url, line) then url), no window/sort/broadcast
    "gopher_dup_lines": ["Generate", "partial_count", "partial_sum",
                         "ReadSchema: struct<url:string,text:string>"],
    # normalized near-exact dedup: per-row codegen normalize (no HOF),
    # 16-byte md5 group key, map-side-combined group agg
    "normalized_dedup": ["partial_count", "partial_min",
                         "ReadSchema: struct<url:string,text:string>"],
    # datacard rollup: grouping sets Expand BEFORE the map-side partial
    # combine (the shuffle carries a few rows per set x partition)
    "corpus_datacard": ["Expand", "partial_count", "partial_sum"],
    # sequence packing: the token-offset prefix sum must be CHUNK-bounded
    # (window partitioned on [chunk...], never a single-task global sort)
    "pack_sequences": ["Arguments: [chunk", "partial_count"],
    # BPE round-1: word-dict and pair aggs both partial-combine map-side;
    # the argmax merge reaches each pair row as a 1-row broadcast (no sort)
    "bpe_pair_counts": ["partial_count", "partial_sum",
                        "BroadcastNestedLoopJoin"],
    # round 5: the iterated trainer joins each iteration's (checkpointed,
    # vocab-sized) pair table with its 1-row argmax as a broadcast and
    # unions the per-iteration traces — never a sort
    "bpe_merges": ["BroadcastNestedLoopJoin", "Union"],
    # round 5: the trained encode dict broadcasts onto the corpus token
    # stream; the per-doc agg partial-combines map-side
    "bpe_encode_docs": ["BroadcastHashJoin", "partial_count",
                        "partial_sum"],
    # round 5: materialized packing — same chunk-bounded offsets windows
    # as pack_sequences feeding ONE bin-keyed aggregation
    "pack_tokens": ["Arguments: [chunk", "partial_count"],
    # round 5: bloom filter build partial-combines its bit_or map-side
    # (history folds to a FIXED word table however large), the probe
    # broadcasts that fixed-size table, bool_and partial-combines as min
    "bloom_dedup": ["partial_bit_or", "BroadcastHashJoin", "partial_min"],
    # round 5: trained-LM scoring — count aggs partial-combine map-side;
    # only the one-row V scalar is hint-broadcast (cross join)
    "lm_train_score": ["partial_count", "partial_sum",
                       "BroadcastNestedLoopJoin"],
    # round 5: HLL registers partial-combine their max map-side (fixed
    # m-row state however large the scan)
    "hll_distinct": ["partial_max", "ReadSchema: struct<text:string>"],
    # round 5: CMS counter table partial-combines map-side down to d*w
    # fixed rows; heavy-hitter probes join it broadcast; est is a min agg
    "cms_heavy_hitters": ["partial_count", "partial_min",
                          "BroadcastHashJoin"],
    # round 5: anchor aggregation is two map-side-combined hash aggs
    # ((dst, anchor) counts then per-dst rollup); the only broadcast is
    # the 1-row scalar N; the scan prunes to (doc_id, text)
    "anchor_texts": ["partial_count", "partial_sum",
                     "BroadcastNestedLoopJoin",
                     "ReadSchema: struct<doc_id:bigint,text:string>"],
    # round 5: the dim-sized rule table broadcasts onto the crawl (the
    # crawl itself never shuffles raw rows); the longest-match winner is
    # a map-side-combinable max/max_by agg over matching rules only
    "robots_filter": ["BroadcastHashJoin", "partial_max",
                      "ReadSchema: struct<url:string>"],
    # round 5: span-cut — keeper/island aggs partial-combine map-side,
    # the gaps-and-islands window is URL-partitioned (page-bounded, never
    # global), scan prunes to (url, text)
    "dup_span_cut": ["partial_min", "Window",
                     "ReadSchema: struct<url:string,text:string>"],
    # round 5: fertility is the encode-dict broadcast + a LANGUAGE-
    # cardinality rollup that partial-combines map-side; the corpus scan
    # prunes to (text, lang)
    "bpe_fertility": ["BroadcastHashJoin", "partial_count", "partial_sum",
                      "ReadSchema: struct<text:string,lang:string>"],
    # round 5: the politeness queue is ONE host-partitioned window (the
    # host is the semantically irreducible shuffle key); scan reads url
    # alone
    "crawl_schedule": ["Window", "hashpartitioning(host",
                       "ReadSchema: struct<url:string>"],
    # round 5 (closing): pointer-doubling redirect resolution — log-round
    # self-joins on long keys, scan prunes to doc_id alone; join mode is
    # size-aware (see EXPECT_NOHINT)
    "redirect_resolve": ["Join", "ReadSchema: struct<doc_id:bigint>"],
    # round 5 (closing): token counts partial-combine map-side, the
    # dim-sized per-source quota broadcasts back, admission is one
    # source-partitioned window
    "token_budget_mix": ["BroadcastHashJoin", "Window", "partial_sum"],
    # round 5 (closing): byte offsets from the chunk-bounded weighted
    # prefix sum (no global window), manifest agg partial-combines
    "shard_manifest": ["Arguments: [chunk", "partial_count",
                       "partial_sum"],
    # round 5 (closing): mojibake detection is a pure per-row codegen map
    # (replace + regexp_count) — no shuffle; scan prunes to (url, text)
    "mojibake_flags": ["ReadSchema: struct<url:string,text:string>"],
    # round 5 (post-restart): HITS — per half-step one map-side-combined
    # gather agg keyed by dst/src; the L-inf norm is an O(1)-row max
    # broadcast; scan prunes to doc_id alone
    "hits_scores": ["partial_sum", "partial_max", "BroadcastHashJoin",
                    "ReadSchema: struct<doc_id:bigint>"],
    # round 5 (final): charset sniffing is a pure per-row codegen map over
    # the raw bytes — no shuffle at all; scan prunes to (url, html)
    "charset_sniff": ["ReadSchema: struct<url:string,html:binary>"],
    # round 5 (final): Manku band-join pairing — candidates come from a
    # band-equality JOIN (never a cartesian) over the MATERIALIZED
    # 16-byte/doc fingerprint table (localCheckpoint = the at-rest
    # artifact Manku's sorted tables derive from; the fold itself is
    # plan-audited upstream via simhash_md5's queries); the
    # pair-distinct partial-aggregates map-side
    "simhash_hamming_pairs": ["Join", "HashAggregate",
                              "Scan ExistingRDD"],
    # round 5 (final): label propagation — per-iteration (dst, label)
    # vote counts partial-combine map-side, the argmax is a bounded
    # dst-partitioned window, the scan prunes to doc_id alone
    "label_prop_spam": ["partial_count", "Window",
                        "hashpartitioning(dst",
                        "ReadSchema: struct<doc_id:bigint>"],
    # round 5 (final): CDX manifest — ONE shard-partitioned prefix-sum
    # window (each partition is one writer's append stream), per-row
    # codegen lengths/digests; scan prunes to (url, warc_ts, html)
    "cdx_index": ["Window", "hashpartitioning(shard",
                  "ReadSchema: struct<url:string,warc_ts:timestamp"],
    # round 5 (final): all nine Gopher gram sizes generate in ONE
    # Generate (inline) pass; both the (url,n,gram) counts and the
    # per-url conditional rollup partial-combine map-side
    "gopher_ngram_gates": ["Generate", "partial_count", "partial_max",
                           "partial_sum",
                           "ReadSchema: struct<url:string,text:string>"],
    # round 5 (final): the Z-order manifest is per-row bit arithmetic +
    # ONE map-side-combined hash agg; scan prunes to (url, warc_ts)
    "zorder_layout": ["partial_count", "partial_min", "partial_max",
                      "ReadSchema: struct<url:string,warc_ts:timestamp"],
    # round 5 (final): ablation — the bounded (<= 9 rules) explode feeds a
    # map-side-combined per-rule agg; totals reach rule rows as a 1-row
    # broadcast; the kernel pass stays the fused Arrow map
    "rule_ablation": ["Generate", "partial_count",
                      "BroadcastNestedLoopJoin", "MapInPandas"],
    # round 5 (final): snapshot diff — both snapshots corpus-sized, so the
    # url-keyed join must NOT broadcast (FullOuter SMJ/shuffle join);
    # digests computed map-side, scan prunes to (url, text)
    "dataset_diff": ["Join FullOuter", "SortMergeJoin",
                     "ReadSchema: struct<url:string,text:string>"],
    # round 5 (final): refresh tiers — one host-keyed map-side-combined
    # rollup on top of the diff join; tiering is per-row codegen
    "refresh_priority": ["Join FullOuter", "partial_count",
                         "partial_sum"],
    # round 5 (final): triplet mining — the false-negative guard is a
    # keyed ANTI join against the pair table (nothing corpus-sized
    # broadcasts; the only BNL join is the 1-row scalar N)
    "contrastive_pairs": ["LeftAnti", "BroadcastNestedLoopJoin"],
    # round 5 (final): PQ — the codebook reaches the vector stream as a
    # broadcast cross join, the per-(vec, subspace) argmin partial-
    # combines map-side, the ADC table joins broadcast, and top-k is
    # TakeOrdered (never a global sort)
    "pq_topk": ["BroadcastNestedLoopJoin", "partial_min",
                "BroadcastHashJoin", "TakeOrderedAndProject"],
    # round 5 (final): JSONL ingestion — a line-splittable json scan
    # under the PINNED schema (no inference pre-scan), zero shuffle
    "jsonl_ingest": ["Scan json"],
    # round 5 (final): the language audit runs the fused kernel map and
    # ONE map-side-combined matrix agg
    "lang_confusion": ["MapInPandas", "partial_count"],
    # round 5 (final): stupid backoff — count tables partial-combine
    # map-side; only the 1-row token total is a broadcast cross join;
    # the scoring joins are size-aware (see EXPECT_NOHINT)
    "stupid_backoff": ["partial_count", "partial_sum",
                       "BroadcastNestedLoopJoin"],
}

# Round 5 (VERDICT r4 #1/#3): the doc-dim offsets->tokens join and the
# line_dedup boilerplate tag join must be size-AWARE, never hint-FORCED.
# Observable: re-planned with spark.sql.autoBroadcastJoinThreshold=-1
# (simulating a too-big build side at 100 TB) the join DEMOTES to
# SortMergeJoin — a F.broadcast() hint would keep it BroadcastHashJoin.
# The chunk-dim totals joins inside the hierarchical prefix sum stay
# hinted by design (bounded at n_docs / 2^20 rows), so those plans still
# show BroadcastHashJoin alongside the demoted offsets join.
EXPECT_NOHINT: dict[str, list[str]] = {
    "posting_stats": ["SortMergeJoin", "BroadcastHashJoin"],
    "book_tpos_map": ["SortMergeJoin", "BroadcastHashJoin"],
    "pack_sequences": ["SortMergeJoin", "BroadcastHashJoin"],
    "line_dedup": ["SortMergeJoin"],
    # round 5: the trained-count scoring joins (corpus-derived, GB-scale
    # at 100 TB) carry no hint and must demote; the bloom filter probe
    # (bloom_dedup) is NOT here by design — its broadcast is a fixed-size
    # configuration constant, the one case a hint is the correct plan
    "lm_train_score": ["SortMergeJoin"],
    # round 5 (closing): both corpus-sized sides of every pointer-doubling
    # round carry no hint and must demote
    "redirect_resolve": ["SortMergeJoin"],
    # round 5 (final): the backoff count tables are corpus-derived
    # (Brants's point) — the scoring joins carry no hint and must demote
    "stupid_backoff": ["SortMergeJoin"],
    # round 5 (closing): the byte-offsets->docs join demotes; the
    # chunk-dim totals joins inside the prefix sum stay hinted by design
    "shard_manifest": ["SortMergeJoin", "BroadcastHashJoin"],
}


def plan_of(name: str, spark) -> str:
    df = QUERIES[name](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    spark = get_spark(cpus=8)
    failures: list[str] = []
    sections: list[str] = [
        "# PLANS — physical plan audit (generated by tools/explain_audit.py)",
        "",
        f"Input: `{SF}`. Checked properties per query are listed before each "
        "plan; a property is the literal substring asserted against "
        "`.explain('formatted')` output.",
        "",
    ]
    for name in EXPECT:
        plan = plan_of(name, spark)
        checks = []
        for prop in EXPECT[name]:
            ok = prop in plan
            if not ok:
                failures.append(f"{name}: missing `{prop}`")
            checks.append(f"- {'OK' if ok else 'MISSING'}: `{prop}`")
        sections += [f"## {name}", "", *checks, "", "```", plan.strip(), "```", ""]
    # hint-vs-stats probe: with broadcast planning disabled, size-aware
    # joins demote to SMJ; hint-forced ones would not (VERDICT r4 #1/#3)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name in EXPECT_NOHINT:
            plan = plan_of(name, spark)
            checks = []
            for prop in EXPECT_NOHINT[name]:
                ok = prop in plan
                if not ok:
                    failures.append(f"{name} [noBroadcast]: missing `{prop}`")
                checks.append(f"- {'OK' if ok else 'MISSING'}: `{prop}`")
            sections += [
                f"## {name} (autoBroadcastJoinThreshold=-1 — join-mode "
                "proof: size-aware, not hint-forced)", "", *checks, "",
                "```", plan.strip(), "```", ""]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(sections))
    if failures:
        print("PLAN AUDIT FAILURES:")
        for x in failures:
            print(" -", x)
    else:
        print(f"plan audit OK ({len(EXPECT)} queries) -> PLANS.md")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
