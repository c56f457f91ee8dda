"""Regenerate PLANS.md: formatted physical plans for representative
catalog queries, with the scale property each plan is supposed to show.

Usage: python tools/plan_dump.py [sf_dir]   (writes repo-root PLANS.md)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from finporter_spark.queries.catalog import catalog_queries
from finporter_spark.session import get_session

# query -> the property the plan demonstrates
SHOWCASE = {
    "q1_pricing_summary": (
        "Filter + column pruning pushed into the parquet scan "
        "(PushedFilters / 7-column ReadSchema), map-side partial_sum, "
        "exactly one exchange, whole pipeline in codegen."
    ),
    "q5_local_supplier_volume": (
        "Six-table join: Catalyst picks broadcast for every dimension hop "
        "(zero SortMergeJoin at this SF); the fact table is never "
        "re-shuffled for the dim chain."
    ),
    "j4_broadcast_dim": (
        "Small dims broadcast (BroadcastHashJoin both hops) — no shuffle "
        "of the fact side; survives a 1000x fact-table scale-up as-is."
    ),
    "j6_asof_join": (
        "As-of join as range-join + per-key rank window: no cartesian "
        "product; one shuffle keyed on the join key, rank=1 filter."
    ),
    "o5_dedup_latest": (
        "Keep-latest dedup as a single row_number window over the key "
        "partitioning — one shuffle, no self-join."
    ),
    "l2_minhash_near_dup": (
        "MinHash+LSH banding: signature agg with map-side combine (one "
        "shuffle proportional to docs x hashes), band bucket equi-join — "
        "never a cross join."
    ),
    "l3_knn_cosine": (
        "Brute-force kNN baseline: query side broadcast, candidate scan "
        "stays map-only; the only shuffle is the per-query top-k window."
    ),
    "x2_tumbling_window": (
        "Tumbling window agg is a plain hash aggregation over the window "
        "struct — same plan batch or micro-batch."
    ),
    "p10_surrogate_id": (
        "Surrogate txn IDs via PARTITIONED row_number (per order month): "
        "rows fan out across window tasks instead of funnelling through "
        "one unbounded global sort — no single-partition WindowExec at "
        "any scale. IDs stay unique via the embedded yyyyMMdd segment."
    ),
    "l8_tfidf_top_terms": (
        "TF-IDF with the corpus size as a broadcast 1-row aggregate "
        "crossJoined in (BroadcastNestedLoopJoin over one row) — the "
        "query body is fully lazy, no driver-side count action."
    ),
    "z1_bucketed_join": (
        "Zero-exchange fact join: both sides read as bucketed tables "
        "(Bucketed: true, SelectedBucketsCount). At this tiny SF "
        "Catalyst rightly prefers broadcasting the small side (shown "
        "below); with broadcast off — the fact-x-fact shape at real "
        "scale — the plan is a SortMergeJoin with NO Exchange under it, "
        "asserted in tests/test_scale.py::"
        "test_z1_catalog_join_is_exchange_free."
    ),
    "z2_salted_agg": (
        "Two-phase skew-tolerant aggregation: partial HashAggregate on "
        "(key, salt) with map-side combine, then a tiny merge shuffle of "
        "#keys x buckets pre-reduced rows."
    ),
    "s8_partitioned_prune": (
        "Hive-partitioned layout: the 3-month filter becomes "
        "PartitionFilters — only those directories are listed and read; "
        "the data files never see the predicate."
    ),
    "l12_chunk_documents": (
        "Context-window chunking: sequence+posexplode+substring, map-only "
        "(no Exchange anywhere) — scales as a pure scan."
    ),
    "l13_decontaminate": (
        "Decontamination: distinct benchmark grams broadcast, training "
        "grams probe map-side (BroadcastHashJoin LeftSemi), then one "
        "anti-join on doc ids — corpus is never shuffled by gram."
    ),
    "q2_min_cost_supplier": (
        "Argmin-per-group at scale: WindowGroupLimit prunes each "
        "partition to rank<=1 BEFORE the full window sort; the window "
        "partitions on p_partkey (parallel across parts, never a global "
        "window); every dimension broadcast."
    ),
    "q6_revenue_change": (
        "The canonical predicate-pushdown proof: every filter reaches "
        "PushedFilters on the parquet scan, then a map-side partial sum "
        "into a 1-row final aggregate — zero joins, one exchange of one "
        "row per partition."
    ),
    "q13_customer_distribution": (
        "Left-outer join preserving order-less customers, then two "
        "cascaded aggregations; the second groups a tiny count domain "
        "so its exchange moves ~20 rows."
    ),
    "q18_large_volume": (
        "HAVING-gated IN-subquery as left-semi join: the order filter "
        "aggregates lineitem once (decimal-routed >250 gate), semi-joins "
        "orders, and only the surviving ~1% re-aggregate."
    ),
    "q21_waiting_supplier": (
        "Existence logic over sibling rows via per-order windows "
        "(partitioned by l_orderkey — parallel across orders): "
        "max-ship-date uniqueness without any self-join of lineitem."
    ),
    "l15_bigram_lm_score": (
        "Corpus LM scoring: bigram counts, left-context totals, and the "
        "per-doc average are three grouped passes over one exploded "
        "bigram stream — all JVM-side (no Python), shuffles keyed on "
        "uniform hash-like bigram keys."
    ),
    "u5_udtf_bigrams": (
        "Python UDTF under LATERAL join, Arrow-vectorized "
        "(ArrowEvalPythonUDTF, not row-wise BatchEvalPython)."
    ),
    "x8_foreach_batch_sink": (
        "foreachBatch custom sink output read back: the aggregate over "
        "the sink's parquet proves the multi-batch drain delivered "
        "exactly the full input."
    ),
    "p13_exists_subquery": (
        "Catalyst decorrelation: EXISTS/NOT EXISTS rewritten to left-semi "
        "and left-anti hash joins, no per-row subquery execution."
    ),
    "l17_pack_sequences": (
        "Sequence packing: the running token offset is a window cumsum "
        "PARTITIONED by the md5 shard (64 parallel windows — never one "
        "global serial sort), then the boundary-crossing explode is "
        "map-only. One shuffle total."
    ),
    "l16_repetition_profile": (
        "Repetition profiling: explode -> (doc,gram) count -> per-doc "
        "re-agg; both shuffles keyed on the doc id with map-side "
        "partial aggregation, no UDF."
    ),
    "z3_zorder_scan": (
        "Z-order-clustered scan: both box predicates reach PushedFilters "
        "on the parquet scan, and the Morton-range file layout means the "
        "row-group min/max stats actually bite on each of them."
    ),
    "l19_blocked_allpairs": (
        "Tiled dense similarity: explode-derived (ba, bb) tile ids feed "
        "ONE FlatMapCoGroupsInPandas (the per-tile BLAS matmul); shuffle "
        "is n*(B+1) rows and a task holds exactly two blocks — the "
        "bounded-memory form of an intrinsically quadratic operator."
    ),
    "p16_fuzzy_join": (
        "Blocked fuzzy join: BroadcastHashJoin on the blocking key (no "
        "shuffle of candidates), then length-difference prune and "
        "THRESHOLDED levenshtein both inside WholeStageCodegen — no "
        "Python, no cross join."
    ),
    "o10_cdc_apply": (
        "CDC merge: the window (keep-newest-op) runs on the CHANGELOG "
        "side only; the base table joins once and is never sorted — the "
        "asymmetry that makes log-apply cheap at a 100 TB base."
    ),
    "w6_sessionize": (
        "Batch sessionization: lag-mark and running-sum windows share "
        "ONE (user_id, ts) sort (a single Exchange+Sort feeds both "
        "Window operators), then a partial-agg per session."
    ),
    "a37_ks_test": (
        "Exact two-sample KS: the corpus collapses to the quantized "
        "value DOMAIN with a map-side partial aggregation, pinned by "
        "an eager localCheckpoint — round 11 — so the plan shows ZERO "
        "parquet scans (previously 4: the cum/best/at branches each "
        "re-derived the aggregate); the CDF window and argmax run on "
        "the pinned domain-sized table, never the corpus."
    ),
    "l45c_ivfadc_topk": (
        "True IVFADC: cell assignment and PQ encode are map-only "
        "literal projections over the corpus; the probe table "
        "(queries x n_probe cells, carrying the LUT arrays) BROADCASTS "
        "into one BroadcastHashJoin on cell id, so only probed cells' "
        "codes are scored; per-query top-shortlist windows prune "
        "map-side (WindowGroupLimit); the exact re-rank touches raw "
        "vectors for Q x shortlist rows only."
    ),
    "l45_pq_ann_topk": (
        "PQ ANN: codebooks ride as LITERALS (map-only encode, no join, "
        "no shuffle for assignment); the query LUT side is broadcast; "
        "the only shuffle is the per-query top-k window over "
        "(query, candidate) scores."
    ),
    "w24_stl_decompose": (
        "STL decomposition: ONE corpus pass (partial-agg daily totals), "
        "then centered-MA window + dow seasonal agg + residual join all "
        "run on the #days x #types domain — the broadcast join back is "
        "domain-sized."
    ),
    "o9_scd2_history": (
        "SCD2 build: exactly one Exchange (hashpartitioning on the "
        "dimension key) under one Sort+Window computing version, "
        "valid_to, and is_current together — closure derived from the "
        "log itself, no join against existing state."
    ),
    "a45_attribution": (
        "Multi-touch attribution WITHOUT a self-join: one events scan, "
        "a (user_id) window computing the forward-min purchase key, a "
        "(pk) window for journey position/size, one hash agg — two "
        "keyed exchanges total, no Join node anywhere in the plan."
    ),
    "l42_label_propagation": (
        "Sync LPA round: edges-to-labels hash join keyed on src, "
        "(node, label) partial-count agg, per-node top-1 window, left "
        "join back to the frontier — every exchange keyed by node/edge, "
        "label frontier is the only state, repeated 3 unrolled rounds."
    ),
    "l46_ivfadc_structured": (
        "IVFADC over STAGED index codes (round 12): the ADC side scans "
        "the codes parquet (cand_id + cell + m small ints — the index, "
        "built once at ingest), NOT the raw-vector table; the probe "
        "table broadcasts into one BroadcastHashJoin on cell id; the "
        "raw-vector column never enters the ADC side - it appears in "
        "one corpus-sided scan feeding the exact re-rank join (plus "
        "two workload-sized query-side scans), and the re-rank "
        "output is Q x shortlist rows."
    ),
    "a46_kruskal_wallis": (
        "k-arm Kruskal-Wallis: one corpus scan partial-aggregates to "
        "per-user totals, a second keyed agg to the quantized-value "
        "domain (k+1 conditional sums, map-side combined), one "
        "domain-sized cumulative window, one scalar aggregate - H is "
        "computed in a single projection over the final row."
    ),
    "l48_repeated_span_coverage": (
        "Arbitrary-length repeated-span dedup (Lee et al. shape): one "
        "corpus-token explode to positional 16-byte md5 anchors, ONE "
        "gram-keyed window for first-doc, then the interval-union "
        "merge is two doc-partitioned windows + a groupBy (per-task "
        "state = one document's duplicated anchors) and a doc-keyed "
        "left join back to the token table - linear in corpus tokens, "
        "no driver state, no suffix array."
    ),
    "a48_kw_4arm": (
        "Odd-df Kruskal-Wallis (4 arms): same two keyed aggs + one "
        "domain window + one scalar agg as a46; the erfc-anchored "
        "chi-square(3) survival is a fixed literal expression in the "
        "final one-row projection - zero extra distributed work for "
        "the p-value."
    ),
    "l49_ivfadc_auto": (
        "The auto-typed IVFADC plan (round 14): identical shape to the "
        "l46b residual path - staged residual codes scanned (never raw "
        "vectors on the ADC side), per-(query, probed-cell) LUT table "
        "broadcast into one BroadcastHashJoin on cell id, exact re-rank "
        "touches Q x shortlist raw rows - but every dial and the "
        "residual choice itself came from ivfadc_plan (corpus count + "
        "measured quantizer spacing skew), no caller constants."
    ),
    "x22_stream_cdc_upsert": (
        "Streaming CDC apply (after drain): the keep-latest state with "
        "tombstones is one parquet scan, collapsed by one keyed window "
        "(state-sized, not corpus-sized), then ONE outer join against "
        "the base table - the base is never re-sorted and never joined "
        "per micro-batch; per-batch work during the drain is one window "
        "over (parent snapshot UNION batch)."
    ),
    "l21b_bpe_merges": (
        "Recursive-CTE BPE training: ONE corpus scan partial-aggregates "
        "word frequencies, collapsed (localCheckpoint-pinned) to a "
        "single row carrying the vocabulary; the UnionLoop's per-merge "
        "step is pure expression evaluation over that row (sort + one "
        "linear fold for the argmax) - no corpus re-scan, no shuffle, "
        "no Python worker anywhere in the 60 iterations."
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("plan-dump")
    qs = catalog_queries()
    out = [
        "# PLANS — physical plans of representative catalog queries",
        "",
        f"Generated by `python tools/plan_dump.py {sf_dir}`. Each section",
        "states the scale property the plan demonstrates, then the",
        '`explain("formatted")` output (AQE initial plan).',
        "",
    ]
    for name, note in SHOWCASE.items():
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", note, "", "```", buf.getvalue().rstrip(), "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
