"""Round-6 operators: containment pairs (l28), daily EWMA (w11),
inverted index (l29) — semantic checks beyond the DuckDB hash oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finporter_spark.queries.catalog import CATALOG, _t


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_l28_blocking_is_exhaustive_vs_brute_force(spark, sf_dir):
    """Rare-shingle blocking must not lose pairs: every pair the l9
    brute force finds at jaccard >= 0.5 (which implies containment >=
    jaccard) must be found by the blocked containment formulation with
    the SAME exact score a direct array-intersect computes."""
    from finporter_spark.operators.dedup import shingles

    blocked = {
        (r.id_l, r.id_r): r.containment
        for r in CATALOG["l28_containment_pairs"][0](spark, sf_dir)
        .collect()
    }
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(shingles(F.col("text"), 3)).alias("shs")
    ).cache()
    a, b = d.alias("a"), d.alias("b")
    cont = F.size(
        F.array_intersect(F.col("a.shs"), F.col("b.shs"))
    ).cast("double") / F.least(
        F.size("a.shs"), F.size("b.shs")
    )
    brute = {
        (r.id_l, r.id_r): r.c
        for r in F.broadcast(a)
        .join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_l"),
            F.col("b.doc_id").alias("id_r"),
            F.round(cont, 6).alias("c"),
        )
        .filter(F.col("c") >= 0.6)
        .collect()
    }
    d.unpersist()
    assert brute, "fixture should contain containment near-dups"
    # blocking catches every brute-force pair, with identical scores
    assert blocked == brute


def test_l28_plan_is_equi_join_only(spark, sf_dir):
    """The scale contract: no cartesian/NLJ anywhere — candidate
    generation and set joins are all hash equi-joins."""
    plan = (
        CATALOG["l28_containment_pairs"][0](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_w11_matches_sequential_recursion(spark, sf_dir):
    """The closed-form windowed EWMA must equal the literal recursion
    y_1 = x_1, y_i = a*x_i + (1-a)*y_{i-1} applied sequentially to the
    daily series."""
    rows = CATALOG["w11_ewma_daily"][0](spark, sf_dir).collect()
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias(
                "day"
            ),
        )
        .agg(F.avg("value").alias("v"))
        .collect()
    )
    series: dict = {}
    for r in sorted(daily, key=lambda r: (r.event_type, r.day)):
        series.setdefault(r.event_type, []).append((r.day, r.v))
    expect = {}
    a = 0.2
    for et, pts in series.items():
        y = None
        for day, v in pts:
            y = v if y is None else a * v + (1 - a) * y
            expect[(et, day)] = y
    assert len(rows) == len(expect)
    for r in rows:
        assert r.ewma == pytest.approx(expect[(r.event_type, r.day)], abs=2e-6)


def test_l29_inverted_index_properties(spark, sf_dir):
    """Postings: tf == number of positions, positions strictly
    ascending and 1-based, df == number of docs carrying the term, and
    a term's posting reconstructs the document's token occurrences."""
    out = CATALOG["l29_inverted_index"][0](spark, sf_dir)
    # scale contract: postings aggregate on the SKEW-SPREADING
    # (term, doc_id) key — never a term-only Window (a Zipf-hot term
    # would pin its whole posting list on one task); df is a
    # map-combined re-agg joined back (broadcast at this scale)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_count" in plan, plan  # df agg map-side combined
    assert "BroadcastHashJoin" in plan, plan
    # ONE corpus pass: BOTH branches (postings and df) must read the
    # persisted postings (InMemoryTableScan), not re-scan + re-tokenize
    # the documents ("FileScan parquet" below appears only inside the
    # cached relation's lineage description, which does not execute)
    assert plan.count("InMemoryTableScan") >= 2, plan
    bad_tf = out.filter(
        F.size(F.split("positions", ",")) != F.col("tf")
    ).count()
    assert bad_tf == 0
    df_check = (
        out.groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("n"),
            F.first("df").alias("df"),
            F.countDistinct("df").alias("ndf"),
        )
        .filter((F.col("n") != F.col("df")) | (F.col("ndf") != 1))
        .count()
    )
    assert df_check == 0
    # spot-check one (term, doc) against a direct tokenization
    row = out.filter(F.col("tf") >= 2).first()
    doc = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == row.doc_id)
        .select("text")
        .first()
        .text
    )
    toks = " ".join(doc.lower().split()).split(" ")
    positions = [i + 1 for i, t in enumerate(toks) if t == row.term]
    assert [int(p) for p in row.positions.split(",")] == positions


def test_j8_matches_naive_overlap_and_no_nlj(spark, sf_dir):
    """Grid-binned overlap join == the naive theta-join row set, and
    the plan contains NO nested loop / cartesian."""
    sf = "/root/testdata/sf0.01"
    out = CATALOG["j8_interval_join"][0](spark, sf)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    li = (
        _t(spark, sf, "lineitem")
        .filter(
            F.col("l_shipdate").between("1995-03-01", "1995-03-31 23:59:59")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").cast("date").alias("lt0"),
            F.date_add(
                F.col("l_shipdate").cast("date"),
                (F.col("l_quantity").cast("int") % 7 + 1),
            ).alias("lt1"),
        )
    )
    o = (
        _t(spark, sf, "orders")
        .filter(
            F.col("o_orderdate").between("1995-02-15", "1995-04-15 23:59:59")
        )
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("ot0"),
            F.date_add(F.col("o_orderdate").cast("date"), 2).alias("ot1"),
        )
    )
    naive = (
        li.join(
            o,
            (F.col("lt0") <= F.col("ot1")) & (F.col("ot0") <= F.col("lt1")),
        )
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.count("*").cast("bigint").alias("n_overlaps"))
    )
    assert sorted(map(tuple, naive.collect())) == sorted(
        (r.l_orderkey, r.l_linenumber, r.n_overlaps) for r in out.collect()
    )


def test_u7_iterator_udf_is_map_only_scalar_iter(spark):
    """The scoring plan must be ArrowEvalPython (SCALAR_ITER) with no
    shuffle — pure map-side inference."""
    out = CATALOG["u7_iterator_model_score"][0](
        spark, "/root/testdata/sf0.001"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan
    # deterministic scoring parity with a driver-side recompute
    import math

    import numpy as np

    w = np.sin(np.arange(1, 65, dtype="float64"))
    rows = (
        _t(spark, "/root/testdata/sf0.001", "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .collect()
    )
    expect = {
        r.vec_id: 1.0 / (1.0 + math.exp(-float(np.dot(np.array(r.e), w))))
        for r in rows
    }
    for r in out.collect():
        assert r.score == pytest.approx(expect[r.vec_id], abs=2e-6)


def test_s14_dynamic_overwrite_touches_only_target_partition(spark):
    """Dynamic partition overwrite: re-running the restatement leaves
    every OTHER day's files untouched (same inodes/mtimes) and is
    idempotent (same result rows)."""
    import os

    sf = "/root/testdata/sf0.001"
    q = CATALOG["s14_dynamic_partition_overwrite"][0]
    first = sorted(map(tuple, q(spark, sf).collect()))

    from finporter_spark.queries.staging import io_dir as _io_dir

    path = _io_dir(sf, "s14")
    others = [
        d for d in os.listdir(path)
        if d.startswith("day=") and d != "day=2024-01-15"
    ]
    assert others, "expected multiple day partitions"
    snap = {
        d: sorted(
            (f, os.stat(os.path.join(path, d, f)).st_mtime_ns)
            for f in os.listdir(os.path.join(path, d))
            if not f.startswith(("_", "."))
        )
        for d in others
    }
    second = sorted(map(tuple, q(spark, sf).collect()))
    assert first == second  # idempotent restatement
    # the dynamic mode must NOT leak into the shared session
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode").upper()
        == "STATIC"
    )
    for d in others:
        now = sorted(
            (f, os.stat(os.path.join(path, d, f)).st_mtime_ns)
            for f in os.listdir(os.path.join(path, d))
            if not f.startswith(("_", "."))
        )
        assert now == snap[d], f"partition {d} was rewritten"


def test_ewma_helper_matches_recursion_and_partitions_bound(spark):
    """ewma_closed_form == the sequential recursion on a long series,
    per partition (the numeric contract: caller bounds partition rows
    via a calendar key — here two 400-row partitions)."""
    from finporter_spark.operators.timeseries import ewma_closed_form

    vals = [((i * 37) % 101) / 3.0 for i in range(800)]
    rows = [(("p1" if i < 400 else "p2"), i, vals[i]) for i in range(800)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    out = {
        (r.k, r.t): r.ewma
        for r in ewma_closed_form(df, ["k"], ["t"], "v", 0.2).collect()
    }
    for part, lo in (("p1", 0), ("p2", 400)):
        y = None
        for i in range(lo, lo + 400):
            y = vals[i] if y is None else 0.2 * vals[i] + 0.8 * y
            got = out[(part, i)]
            assert abs(got - y) < 1e-8 and got == got  # no NaN/inf


def test_ewma_unbounded_exact_where_closed_form_overflows(spark):
    """5,000-row single-key series at alpha=0.3: the plain closed form's
    (1/0.7)^i weights overflow doubles (~2,000 rows), while the
    epoch-carry decomposition stays exact to the sequential recursion
    at every row — including across epoch boundaries."""
    import math

    from finporter_spark.operators.timeseries import (
        ewma_closed_form,
        ewma_unbounded,
    )

    n, a = 5000, 0.3
    vals = [((i * 53) % 211) / 7.0 for i in range(n)]
    df = spark.createDataFrame(
        [("k", i, vals[i]) for i in range(n)], "k string, t int, v double"
    ).repartition(8)

    naive_tail = (
        ewma_closed_form(df, ["k"], ["t"], "v", a)
        .filter(F.col("t") >= n - 5)
        .collect()
    )
    assert any(
        r.ewma is None or not math.isfinite(r.ewma) for r in naive_tail
    ), "expected the plain closed form to overflow at this length"

    got = {
        r.t: r.ewma
        for r in ewma_unbounded(
            df, ["k"], ["t"], "v", a, epoch_rows=512
        ).collect()
    }
    assert len(got) == n
    y = None
    for i in range(n):
        y = vals[i] if y is None else a * vals[i] + (1 - a) * y
        assert got[i] == pytest.approx(y, rel=1e-9, abs=1e-9), i


def test_w13_matches_sequential_recursion(spark, sf_dir):
    """The distributed affine scan == the literal per-row recursion
    y_i = a_i*y_{i-1} + b_i applied sequentially per instrument."""
    import math

    rows = CATALOG["w13_compound_balance"][0](spark, sf_dir).collect()
    evs = (
        _t(spark, sf_dir, "events")
        .select("event_type", "event_id", "ts", "value")
        .collect()
    )
    series: dict = {}
    for r in sorted(evs, key=lambda r: (r.event_type, r.ts, r.event_id)):
        series.setdefault(r.event_type, []).append(r)
    expect = {}
    for et, pts in series.items():
        y = 0.0
        for i, r in enumerate(pts, start=1):
            a = 1.0 + (int(math.floor(r.value * 100)) % 5 - 2) / 1000.0
            y = a * y + (r.value - 50.0)
            if i % 97 == 0:
                expect[(et, i)] = y
    assert len(rows) == len(expect) and rows
    for r in rows:
        assert r.balance == pytest.approx(
            expect[(r.event_type, r.i)], abs=5e-2
        )


def test_affine_scan_property_random_coefficients(spark):
    """Property: affine_scan == sequential recursion for arbitrary
    per-row coefficients — including NEGATIVE a (sign-alternating
    recurrences the log-space oracle can't express), multiple keys,
    and an epoch size that forces several carries."""
    import random

    rng = random.Random(1234)
    rows = []
    for k in ("k1", "k2", "k3"):
        for t in range(137):  # prime-ish, not a multiple of epoch_rows
            rows.append(
                (
                    k,
                    t,
                    rng.uniform(-1.1, 1.1),
                    rng.uniform(-10.0, 10.0),
                )
            )
    from finporter_spark.operators.timeseries import affine_scan

    df = spark.createDataFrame(
        rows, "k string, t int, a double, b double"
    ).repartition(7)
    got = {
        (r.k, r.t): r.y
        for r in affine_scan(
            df, ["k"], ["t"], "a", "b", epoch_rows=16
        ).collect()
    }
    assert len(got) == len(rows)
    series: dict = {}
    for k, t, a, b in rows:
        series.setdefault(k, []).append((t, a, b))
    for k, pts in series.items():
        y = 0.0
        for t, a, b in sorted(pts):
            y = a * y + b
            assert got[(k, t)] == pytest.approx(y, rel=1e-9, abs=1e-9)


def test_matrix_affine_scan_matches_numpy_recursion(spark):
    """Property: the vector-state scan == the sequential matrix
    recursion for random per-row 2x2 maps (norm-bounded), two keys,
    epoch size forcing several carries."""
    import random

    import numpy as np

    rng = random.Random(99)
    rows = []
    for k in ("a", "b"):
        for t in range(101):
            rows.append(
                tuple(
                    [k, t]
                    + [rng.uniform(-0.7, 0.7) for _ in range(4)]
                    + [rng.uniform(-5, 5) for _ in range(2)]
                )
            )
    from finporter_spark.operators.timeseries import matrix_affine_scan

    df = spark.createDataFrame(
        rows,
        "k string, t int, m00 double, m01 double, m10 double, "
        "m11 double, c0 double, c1 double",
    ).repartition(5)
    got = {
        (r.k, r.t): (r.y0, r.y1)
        for r in matrix_affine_scan(
            df,
            ["k"],
            ["t"],
            ["m00", "m01", "m10", "m11"],
            ["c0", "c1"],
            ["y0", "y1"],
            epoch_rows=16,
        ).collect()
    }
    series: dict = {}
    for row in rows:
        series.setdefault(row[0], []).append(row[1:])
    for k, pts in series.items():
        y = np.zeros(2)
        for t, m00, m01, m10, m11, c0, c1 in sorted(pts):
            y = np.array([[m00, m01], [m10, m11]]) @ y + np.array(
                [c0, c1]
            )
            assert got[(k, t)][0] == pytest.approx(y[0], rel=1e-9, abs=1e-9)
            assert got[(k, t)][1] == pytest.approx(y[1], rel=1e-9, abs=1e-9)


def test_holt_trend_matches_sequential_recursion(spark, sf_dir):
    """holt_trend == the literal Holt recursion per instrument."""
    from finporter_spark.operators.timeseries import holt_trend

    a, b = 0.3, 0.1
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias(
                "day"
            ),
        )
        .agg(F.avg("value").alias("v"))
    )
    got = {
        (r.event_type, r.day): (r.level, r.trend)
        for r in holt_trend(
            daily, ["event_type"], ["day"], "v", a, b, epoch_rows=8
        ).collect()
    }
    series: dict = {}
    for r in daily.collect():
        series.setdefault(r.event_type, []).append((r.day, r.v))
    for et, pts in series.items():
        l = t = None
        for day, x in sorted(pts):
            if l is None:
                l, t = x, 0.0
            else:
                l_new = a * x + (1 - a) * (l + t)
                t = b * (l_new - l) + (1 - b) * t
                l = l_new
            assert got[(et, day)][0] == pytest.approx(l, abs=1e-8)
            assert got[(et, day)][1] == pytest.approx(t, abs=1e-8)


def test_o18_weighted_sample_properties(spark, sf_dir):
    """WindowGroupLimit in the plan (two-phase top-k), exactly 50 per
    populated stratum (or all docs when a stratum is smaller), and
    higher-weight docs are overrepresented vs a uniform draw."""
    out = CATALOG["o18_weighted_sample"][0](spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    rows = out.collect()
    from collections import Counter

    per = Counter(r.lang for r in rows)
    totals = Counter(
        r.lang
        for r in _t(spark, sf_dir, "documents").select("lang").collect()
    )
    for lang, total in totals.items():
        assert per.get(lang, 0) == min(50, total)
    # weight bias: the sampled docs' mean weight exceeds the corpus mean
    sampled_w = sum(r.w for r in rows) / len(rows)
    corpus = (
        _t(spark, sf_dir, "documents")
        .select((0.1 + (F.col("n_chars") % 97) / 97.0).alias("w"))
        .agg(F.avg("w"))
        .first()[0]
    )
    assert sampled_w > corpus


def test_f2_interval_matching_is_literal_fifo(spark, sf_dir):
    """The cumulative-interval formulation must equal a literal FIFO
    lot-queue simulation: per (account, security), sells pop buy lots
    in order; realized gain per sell = sum over consumed lots of
    qty*(sell price - lot basis)."""
    rows = CATALOG["f2_fifo_realized_gains"][0](spark, sf_dir).collect()
    got = {
        (r.accountID, r.securityID, r.sell_orderkey, r.sell_linenumber): (
            r.matched_qty,
            r.realized_gain,
        )
        for r in rows
    }
    import datetime

    led = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") < 10)
        .select(
            "l_suppkey",
            "l_partkey",
            "l_returnflag",
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
        )
        .collect()
    )
    from collections import defaultdict, deque

    ledger = defaultdict(list)
    for r in led:
        key = (f"acc{r.l_suppkey}", f"SEC{r.l_partkey}")
        import math as _m

        px = (int(_m.floor(r.l_extendedprice)) % 9000) / 10.0 + 5.0
        ledger[key].append(
            ("BUY", r.l_shipdate, r.l_orderkey, r.l_linenumber,
             r.l_quantity, px)
        )
        if r.l_returnflag == "R":
            ledger[key].append(
                ("SELL", r.l_shipdate + datetime.timedelta(days=30),
                 r.l_orderkey, r.l_linenumber, r.l_quantity / 2,
                 px + 1.0)
            )
    expect = {}
    for (acct, sec), txns in ledger.items():
        txns.sort(key=lambda r: (r[1], r[2], r[3]))
        lots: deque = deque()
        for action, _at, ok, ln, qty, price in txns:
            if action == "BUY":
                lots.append([qty, price])
            else:  # SELL: consume FIFO
                need, gain, matched = qty, 0.0, 0.0
                while need > 1e-12 and lots:
                    q, basis = lots[0]
                    take = min(q, need)
                    gain += take * (price - basis)
                    matched += take
                    need -= take
                    if q - take <= 1e-12:
                        lots.popleft()
                    else:
                        lots[0][0] = q - take
                k = (acct, sec, ok, ln)
                pm, pg = expect.get(k, (0.0, 0.0))
                expect[k] = (pm + matched, pg + gain)
    assert len(got) == len(expect)
    for k, (mq, rg) in expect.items():
        assert got[k][0] == pytest.approx(mq, abs=1e-6), k
        assert got[k][1] == pytest.approx(rg, abs=0.02), k


def test_fifo_grid_bounds_hot_instrument_fanout(spark, sf_dir):
    """VERDICT r6: a single hot instrument with 10^4-10^5 lots must not
    create buys x sells candidate pairs in one key's join buffer. The
    quantity-grid decomposition pairs candidates per (key, cell) — work
    ∝ true overlaps — and the whole ledger still equals a literal FIFO
    simulation. The naive per-key formulation at this size would
    enumerate ~8e8 pairs; the grid enumerates ~1e5."""
    from collections import deque

    from finporter_spark.operators.finance import fifo_lot_gains

    N_BUY, N_SELL = 40_000, 20_000
    base = spark.range(N_BUY + N_SELL)
    qty = (F.col("id") % 50 + 1).cast("double")
    price = ((F.col("id") * 7) % 900).cast("double") / 10.0 + 5.0
    txns = base.select(
        F.lit("acc0").alias("accountID"),
        F.lit("HOT").alias("securityID"),
        F.when(F.col("id") < N_BUY, "BUY").otherwise("SELL").alias(
            "action"
        ),
        F.col("id").alias("seq"),
        F.when(F.col("id") < N_BUY, qty)
        .otherwise(((F.col("id") % 50 + 1) / 2).cast("double"))
        .alias("qty"),
        price.alias("price"),
    )
    out = fifo_lot_gains(
        txns,
        keys=["accountID", "securityID"],
        sell_ids=["seq"],
        order_by=["seq"],
        cell=64.0,
    )
    # plan: equi-join (hash/sort-merge on key+cell), never a nested loop
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    rows = {r.seq: (r.matched_qty, r.realized_gain) for r in out.collect()}
    assert len(rows) == N_SELL

    # literal FIFO on the same deterministic ledger
    lots: deque = deque()
    for i in range(N_BUY):
        lots.append([float(i % 50 + 1), (i * 7) % 900 / 10.0 + 5.0])
    for i in range(N_BUY, N_BUY + N_SELL):
        need = (i % 50 + 1) / 2
        price_s = (i * 7) % 900 / 10.0 + 5.0
        gain = matched = 0.0
        while need > 1e-12 and lots:
            q, basis = lots[0]
            take = min(q, need)
            gain += take * (price_s - basis)
            matched += take
            need -= take
            if q - take <= 1e-12:
                lots.popleft()
            else:
                lots[0][0] = q - take
        got_m, got_g = rows[i]
        assert got_m == pytest.approx(matched, abs=1e-6), i
        assert got_g == pytest.approx(gain, abs=1e-4), i


def test_fifo_feasibility_check_flags_oversold_prefix(spark):
    """fifo_feasibility_violations: a key whose ledger sells ahead of
    its buys is flagged with the worst prefix excess; feasible keys
    (including an exactly-balanced one) are silent. ADVICE r7: callers
    get a signal for the contract fifo_lot_gains depends on."""
    from finporter_spark.operators.finance import (
        fifo_feasibility_violations,
    )

    txns = spark.createDataFrame(
        [
            # feasible: buy 10, sell 10 (exact balance is fine)
            ("A", 1, "BUY", 10.0, 5.0),
            ("A", 2, "SELL", 10.0, 6.0),
            # infeasible: sells 7 with only 4 bought at that prefix
            ("B", 1, "BUY", 4.0, 5.0),
            ("B", 2, "SELL", 7.0, 6.0),
            ("B", 3, "BUY", 5.0, 5.5),
        ],
        "acct string, seq int, action string, qty double, price double",
    )
    out = fifo_feasibility_violations(txns, ["acct"], ["seq"]).collect()
    assert len(out) == 1
    assert out[0]["acct"] == "B"
    assert out[0]["max_oversell"] == 3.0
