"""Plan-level assertions: the 100 TB design properties SURVEY §4 promises.

These tests read `.explain("formatted")` output: broadcasts actually
broadcast, filters/projections reach the parquet scan, whole-stage codegen
covers the hot path, and as-of join doesn't add redundant shuffles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finporter_spark.queries.catalog import CATALOG, _t


def plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_j4_uses_broadcast_join(spark, sf_dir):
    df = CATALOG["j4_broadcast_dim"][0](spark, sf_dir)
    p = plan(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    df = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_quantity")
    )
    p = plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)" in p
    # column pruning: scan schema should carry only the two referenced cols
    assert "l_extendedprice" not in p


def test_q1_plan_shape(spark, sf_dir):
    """Flagship agg: map-side partial aggregation, exactly one shuffle,
    pushdown into the scan, zero Python. (WholeStageCodegen spans are not
    visible pre-execution under AQE, so assert the structural properties.)
    """
    df = CATALOG["q1_pricing_summary"][0](spark, sf_dir)
    p = plan(df)
    assert "partial_sum" in p  # map-side combine before the exchange
    assert p.count("(5) Exchange") + p.count("Exchange (5)") >= 1
    assert p.count("Exchange") <= 2  # one shuffle (name appears in tree+detail)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_asof_join_single_window_shuffle(spark, sf_dir):
    df = CATALOG["j6_asof_join"][0](spark, sf_dir)
    p = plan(df)
    # rank-filter implementation: exactly one Window operator
    assert p.count("Window") >= 1
    assert "CartesianProduct" not in p


@pytest.mark.slow  # ~6 min: explains all 265 relational catalog plans
def test_catalog_queries_avoid_python_udfs(spark, sf_dir):
    """Every relational catalog query stays JVM-side (UDF-free hot path)."""
    skip = set()  # all current queries must pass
    for name, (fn, _) in CATALOG.items():
        if name in skip:
            continue
        p = plan(fn(spark, sf_dir))
        assert "BatchEvalPython" not in p, f"{name} uses row-wise Python"


def test_q1_wholestage_codegen_covers_hot_path(spark, sf_dir):
    """Post-execution: scan->filter->project->partial agg and final agg
    both run inside WholeStageCodegen spans (AQE hides them pre-run)."""
    df = CATALOG["q1_pricing_summary"][0](spark, sf_dir)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # codegen spans print as "*(n)" stage markers in the executed plan
    assert "*(1)" in executed and "*(2)" in executed
    assert "HashAggregate" in executed
    # the whole pre-shuffle pipeline (filter/project/partial agg) is one span
    assert "*(1) HashAggregate" in executed and "*(1) Filter" in executed


def test_broadcast_self_join_in_knn(spark, sf_dir):
    """Brute-force kNN: the query side must be broadcast (map-only scoring
    pass over candidates, no shuffle of the big side)."""
    df = CATALOG["l3_knn_cosine"][0](spark, sf_dir)
    p = plan(df)
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_minhash_band_join_is_hash_equijoin(spark, sf_dir):
    """LSH banding must turn near-dup search into an equi-join (hash or
    sort-merge), never a cartesian product."""
    df = CATALOG["l2_minhash_near_dup"][0](spark, sf_dir)
    p = plan(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_partitioned_sink_prunes_by_day(spark, sf_dir, tmp_path):
    """Date-partitioned layout must prune at the directory level: the
    filtered scan carries PartitionFilters and reads a subset of
    partitions."""
    from finporter_spark.sources import write_partitioned_by_day

    e = _t(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_day")
    write_partitioned_by_day(e, path, "ts")
    n_days = e.select(F.to_date("ts")).distinct().count()
    assert n_days > 1

    one_day = e.select(F.to_date("ts").alias("d")).first().d
    scan = spark.read.parquet(path).filter(F.col("_day") == F.lit(one_day))
    p = plan(scan)
    assert "PartitionFilters: [isnotnull(_day" in p
    assert scan.count() == e.filter(F.to_date("ts") == F.lit(one_day)).count()


def test_s8_catalog_scan_prunes_partitions(spark, sf_dir):
    """The s8 catalog entry's scan must prune to the three filtered
    month directories (PartitionFilters present, no pushed data filter
    needed — the predicate is satisfied entirely by layout)."""
    df = CATALOG["s8_partitioned_prune"][0](spark, sf_dir)
    p = plan(df)
    assert "PartitionFilters: [" in p
    assert "order_month" in p.split("PartitionFilters: [", 1)[1].split("]")[0]


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """Catalyst injects a runtime bloom filter on the big (application)
    side of a shuffle join when the other side carries a selective
    filter — at 100 TB this prunes most of the fact scan's shuffle
    input before it ever shuffles. The thresholds are sized for real
    clusters (10MB creation side / 10GB scan side), so this forces
    them down to demonstrate the machinery at test SF, and checks the
    filtered result still matches the unfiltered join."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = _t(spark, sf_dir, "orders").filter(
            F.col("o_orderdate") < F.lit("1995-02-01 00:00:00").cast("timestamp")
        )
        l = _t(spark, sf_dir, "lineitem")
        j = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in optimized or "might_contain" in optimized, (
            optimized[:2000]
        )
        with_filter = {(r.o_orderstatus, r.n) for r in j.collect()}
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    plain = {
        (r.o_orderstatus, r.n)
        for r in _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "orders").filter(
                F.col("o_orderdate")
                < F.lit("1995-02-01 00:00:00").cast("timestamp")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert with_filter == plain


def test_w6_single_sort_feeds_both_windows_and_agg(spark, sf_dir):
    """Sessionization's 100 TB property: the lag-mark window, the
    running-sum window, AND the per-session aggregate all reuse ONE
    hash-partitioning on user_id — exactly one Exchange in the plan."""
    df = CATALOG["w6_sessionize"][0](spark, sf_dir)
    p = plan(df)
    assert p.count("+- Exchange") == 1, p.split("\n\n")[0]
    assert p.count("+- Window") == 2
    assert "BatchEvalPython" not in p


def test_o9_scd2_single_shuffle(spark, sf_dir):
    """SCD2 closure (version, valid_to, is_current) comes from one
    window over one Exchange on the dimension key — no join against
    existing state, no second sort."""
    df = CATALOG["o9_scd2_history"][0](spark, sf_dir)
    p = plan(df)
    assert p.count("+- Exchange") == 1, p.split("\n\n")[0]
    assert "Join" not in p


def test_p16_blocked_join_broadcasts_and_stays_jvm(spark, sf_dir):
    """Fuzzy join: candidates via BroadcastHashJoin on the blocking key
    (never a cross product), scoring in codegen (no Python)."""
    df = CATALOG["p16_fuzzy_join"][0](spark, sf_dir)
    p = plan(df)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_l19_tiled_plan_has_no_join(spark, sf_dir):
    """Blocked all-pairs: the quadratic work happens INSIDE the
    cogrouped Arrow stage — the plan itself contains no join operator
    at all (tiles come from explode, pairs from the per-tile matmul)."""
    df = CATALOG["l19_blocked_allpairs"][0](spark, sf_dir)
    p = plan(df)
    assert "FlatMapCoGroupsInPandas" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Generate explode" in p or "Generate" in p


def test_o10_window_on_changelog_side_only(spark, sf_dir):
    """CDC apply: the keep-newest window sorts the CHANGELOG (events),
    never the base table — the base joins once, unsorted."""
    df = CATALOG["o10_cdc_apply"][0](spark, sf_dir)
    p = plan(df)
    # exactly one Window node ("+- Window (" excludes WindowGroupLimit,
    # the map-side rank-1 prune Spark adds BEFORE the exchange — the
    # changelog is pre-filtered to one candidate row per key per mapper)
    assert p.count("+- Window (") == 1
    assert "WindowGroupLimit" in p
    # the window's sort is on the changelog key/ts, not base columns
    assert "c_custkey ASC" not in p and "c_name ASC" not in p


def test_j6c_asof_plan_single_equijoin_plus_window(spark, sf_dir):
    """The high-cardinality as-of (j6c) must plan as ONE equi-join on
    user_id with the time range as a join-time predicate plus ONE
    window — never a nested-loop/cartesian (which an as-of without the
    equi key degenerates to), and no redundant exchanges beyond the
    join + window shuffles."""
    import re

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force
    try:
        df = CATALOG["j6c_asof_highcard"][0](spark, sf_dir)
        p = plan(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # count physical nodes via their "(n) Op" detail headers (the tree
    # section repeats each operator name)
    n_joins = len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", p))
    assert n_joins == 1, f"expected exactly one shuffled equi-join:\n{p}"
    assert len(re.findall(r"\(\d+\) Window\b", p)) == 1
    # shuffles: one per join side + one for the window repartition
    assert len(re.findall(r"\(\d+\) Exchange\b", p)) <= 3


def test_j5_rank_merge_materializes_no_pairs(spark, sf_dir):
    """j5's count-richer-than inequality is the rank/CDF merge
    (operators/joins.count_exceeding): the plan must materialize NO
    row pairs at all — no cartesian, no SortMergeJoin or
    ShuffledHashJoin anywhere (every join is a broadcast of either the
    1-row bounds agg or the constant-size band ladder), and the heavy
    op is the single window partitioned by band."""
    import re

    df = CATALOG["j5_range_join"][0](spark, sf_dir)
    p = plan(df)
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
    assert "ShuffledHashJoin" not in p
    # the residual-pair equi-join is GONE: every remaining join is a
    # broadcast (bounds / ladder), never both-sides corpus-sized
    joins = re.findall(r"\(\d+\) (\w*Join\w*)", p)
    assert joins, p
    assert all(j.startswith("Broadcast") for j in joins), joins
    # any BNLJ node must be the 1-row bounds broadcast, never a pairing
    details = re.findall(
        r"\(\d+\) BroadcastNestedLoopJoin[\s\S]*?(?=\n\(\d+\)|\Z)", p
    )
    for d in details:
        assert "c_acctbal > s_acctbal" not in d, d
    # exactly one corpus-sized window (the per-band merge) + the
    # bands-row ladder window
    assert len(re.findall(r"\(\d+\) Window\b", p)) == 2


def test_o12_epoch_shuffle_no_global_window(spark, sf_dir):
    """The epoch shuffle's total order must NOT be a single-partition
    global window over the corpus (the plan that moves 100 TB to one
    task). hex_order_index's plan: the corpus-sized Window is
    PARTITIONED by the md5-prefix bucket, the only SinglePartition
    exchange feeds the bounded ``buckets``-row offsets ladder, and the
    offsets ride a broadcast join back."""
    import re

    df = CATALOG["o12_epoch_shuffle"][0](spark, sf_dir)
    p = plan(df)
    # exactly one SinglePartition exchange: the B-row offsets ladder
    assert p.count("SinglePartition") == 1, p
    # offsets join back via broadcast, never a shuffle of the big side
    assert "BroadcastHashJoin" in p
    # every Window node that ranks the corpus is keyed on _bkt; the
    # only orderBy-without-partition window is the offsets ladder
    # (operating on the post-aggregate B-row side)
    wins = re.findall(r"\(\d+\) Window\b[\s\S]*?(?=\n\(\d+\)|\Z)", p)
    assert len(wins) == 2, p  # local rank + offsets ladder
    assert any("_bkt" in w and "row_number" in w for w in wins), p


def test_pipe4_topk_never_global_sorts(spark, sf_dir):
    """Hybrid retrieval's per-branch top-K and the final fused top-50
    must plan as TakeOrderedAndProject (per-partition heaps + driver
    merge of K rows) — a LIMIT after ORDER BY must never become a
    full-corpus global sort, and no corpus-sized single-partition
    exchange may appear (the two rank windows operate on the bounded
    K-row candidate lists)."""
    import re

    df = CATALOG["pipe4_hybrid_retrieval"][0](spark, sf_dir)
    p = plan(df)
    assert len(re.findall(r"\(\d+\) TakeOrderedAndProject", p)) == 3, p
    assert "Exchange SinglePartition" not in p, p


def test_l25_span_dedup_two_shuffles_no_join(spark, sf_dir):
    """The span-dedup plan must materialize the gram explode ONCE: the
    first-seen doc is a window over the gram key, so the plan has
    exactly two corpus-sized exchanges (gram key, doc key), one Window,
    and NO join (the groupBy+join-back shape recomputes the explode)."""
    import re

    df = CATALOG["l25_span_dedup"][0](spark, sf_dir)
    p = plan(df)
    assert len(re.findall(r"\(\d+\) Exchange\b", p)) == 2, p
    assert len(re.findall(r"\(\d+\) Window\b", p)) == 1, p
    assert not re.search(r"\(\d+\) \w*Join", p), p
    assert len(re.findall(r"\(\d+\) Generate\b", p)) == 1, p  # one explode


def test_w9_ohlc_single_exchange(spark, sf_dir):
    """OHLC bars: the rank windows and the endpoint aggregation share
    the (instrument, bar) key, so the plan must contain exactly ONE
    corpus-sized exchange — the aggregate reuses the window's
    partitioning instead of re-shuffling."""
    import re

    df = CATALOG["w9_ohlc_downsample"][0](spark, sf_dir)
    p = plan(df)
    assert len(re.findall(r"\(\d+\) Exchange\b", p)) == 1, p
    assert "SinglePartition" not in p, p


def test_lsh_exact_probe_is_pure_jvm_and_broadcasts_probes(spark, sf_dir):
    """Round-9 l3_lsh_knn: probe selection moved from the numpy UDF to
    JVM expressions — the plan must contain NO Python stage at all, and
    the bucket join must broadcast the (tiny) probe side."""
    df = CATALOG["l3_lsh_knn"][0](spark, sf_dir)
    p = plan(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "PythonUDF" not in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_a35_bootstrap_single_scan_with_partial_agg(spark, sf_dir):
    """a35: the 64-resample fan-out must be combined MAP-SIDE before the
    exchange (partial HashAggregate below it, final above), and the
    events parquet is scanned exactly once (the one-pass bootstrap
    claim)."""
    import re

    df = CATALOG["a35_poisson_bootstrap_ci"][0](spark, sf_dir)
    p = plan(df)
    # the formatted plan names each node once in the tree and once in
    # the detail section — count unique "(n) Scan parquet" node headers
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    # partial agg below the first Exchange, final above it
    assert p.index("HashAggregate") < p.index("Exchange")
    assert p.count("HashAggregate") >= 2


def test_a14b_kmv_single_corpus_scan(spark, sf_dir):
    """a14b: raw events are touched once — the sketch table (#days × k)
    is checkpoint-materialized, so the final plan's two references to
    it scan the in-memory sketch, never the parquet a second time."""
    df = CATALOG["a14b_rolling_kmv_rollup"][0](spark, sf_dir)
    p = plan(df)
    assert p.count("Scan parquet") == 0  # corpus scanned at build time
    assert "ExistingRDD" in p or "LogicalRDD" in p or "Scan" in p


def test_s15_orc_pushdown_plan(spark, sf_dir):
    """s15: the filtered/projected read over the staged zlib-ORC table
    must push the predicate into the ORC scan (stripe-statistics
    skipping) and prune the unprojected column from the read schema —
    the s8 parquet contract, certified for the second columnar
    format."""
    df = CATALOG["s15_orc_pushdown"][0](spark, sf_dir)
    p = plan(df)
    assert "Scan orc" in p
    # assert the pushed filters independently of filter ordering and
    # literal rendering (both are Spark-version cosmetics, not pushdown
    # semantics): the predicate and the null guard must each appear
    # inside a PushedFilters list
    assert "PushedFilters:" in p
    pushed = p[p.index("PushedFilters:"):]
    assert "GreaterThan(s_acctbal" in pushed
    assert "IsNotNull(s_acctbal)" in pushed
    # column pruning: s_nationkey was written but is not projected
    assert "s_nationkey" not in p


def test_l46_plan_broadcasts_probes_no_python(spark, sf_dir):
    """l46 (structured IVFADC over staged codes): the probe table must
    BROADCAST into the cell-id join, with no Python stage, no
    cartesian product, and no scan of the raw-embedding parquet on the
    ADC side (the codes table is the index; raw vectors enter only
    through the Q x shortlist rerank join)."""
    df = CATALOG["l46_ivfadc_structured"][0](spark, sf_dir)
    p = plan(df)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_l46b_residual_plan_broadcasts_per_cell_luts(spark, sf_dir):
    """l46b: the per-(query, probed-cell) LUT table — the residual
    refinement's extra state — must still be broadcast-sized (Q x
    n_probe rows), never a shuffled join side."""
    df = CATALOG["l46b_ivfadc_residual"][0](spark, sf_dir)
    p = plan(df)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
