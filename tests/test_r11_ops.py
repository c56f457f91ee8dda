"""Round-11 operator tests: single-scan KS/MWU pinning + domain guard,
IVFADC (l45c), sliding-window PSI (a42), w17 fused ladders, x19 timers.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finporter_spark.queries.catalog import CATALOG, _t


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_ks_and_mwu_single_corpus_scan(spark, sf_dir):
    """a37/a38: the corpus parquet is read ONCE — the domain-sized
    per-value aggregate is localCheckpoint-pinned before the cum/best/at
    branches, so the final plan contains zero parquet scans (everything
    reads the pinned blocks). Round-10's committed a37 plan showed FOUR
    parquet scans from branch re-derivation."""
    for name in ("a37_ks_test", "a38_mann_whitney_u"):
        p = _plan(CATALOG[name][0](spark, sf_dir))
        assert p.count("Scan parquet") == 0, name
        assert "ExistingRDD" in p or "LogicalRDD" in p or "Scan" in p, name


def test_l45c_plan_and_self_rank1(spark, sf_dir):
    """IVFADC invariants: the whole pipeline is JVM-side (no Python
    eval), the probe table broadcasts (BroadcastHashJoin on cell id),
    and a query's own vector — same cell, ADC minimum, true distance
    0 — comes back rank 1 with dist2 == 0."""
    df = CATALOG["l45c_ivfadc_topk"][0](spark, sf_dir)
    p = _plan(df)
    assert "EvalPython" not in p
    assert "BroadcastHashJoin" in p
    rows = df.collect()
    qids = {r.query_id for r in rows}
    assert qids
    for q in qids:
        mine = [r for r in rows if r.query_id == q and r.cand_id == q]
        assert mine and mine[0].rank == 1 and mine[0].dist2 == 0.0, q


def test_w17_pinned_single_parquet_scan(spark, sf_dir):
    """w17's final plan contains ZERO parquet scans: the 2-column
    corpus projection and the two |groups|-row ladder results are
    localCheckpoint-pinned, so both percentile ladders and the flag
    pass read pinned blocks (the parquet is read once, at pin time).
    Unpinned, the plan re-scanned the corpus ~7x and re-ran ladder-1
    inside every ladder-2 pass."""
    df = CATALOG["w17_mad_anomaly"][0](spark, sf_dir)
    p = _plan(df)
    assert p.count("Scan parquet") == 0
    assert "ExistingRDD" in p or "LogicalRDD" in p or "Scan" in p


def test_x19_timer_evicts_every_open_session(spark, sf_dir):
    """Event-time-timer contract: every real user's FINAL session is
    flushed by handleExpiredTimer (via_timer=1, exactly one per user —
    state evicted by timer, not by more data), gap-closed sessions
    emit inline (via_timer=0), and the sentinel key never reaches the
    catalog output."""
    df = CATALOG["x19_transform_with_state_timers"][0](spark, sf_dir)
    rows = df.collect()
    users = {r.user_id for r in rows}
    assert users and all(u >= 0 for u in users)
    raw = spark.table("x19_mem").where(F.col("user_id") >= 0)
    timer_rows = raw.where(F.col("via_timer") == 1).collect()
    # the LAST session per user can only flush via timer (no later
    # event exists to gap-close it) — every user has one; mid-stream
    # timer flushes are ALSO legitimate (a user idle across a whole
    # batch whose gap exceeds 600 s), so assert coverage, not an
    # exact per-user count
    assert {r.user_id for r in timer_rows} == users
    emitted = {}
    for r in timer_rows:
        emitted[r.user_id] = max(emitted.get(r.user_id, -1), r.e_us)
    final_end = {}
    for r in raw.collect():
        final_end[r.user_id] = max(final_end.get(r.user_id, -1), r.e_us)
    for u in users:
        assert emitted[u] == final_end[u], u  # final session IS a timer flush
    assert raw.where(F.col("via_timer") == 0).count() > 0
    # sessions are internally consistent
    for r in rows:
        assert r.session_start <= r.session_end
        assert r.n_events >= 1


def test_x18b_stream_weekly_psi_equals_batch_a42(spark, sf_dir):
    """The drained weekly streaming monitor equals the batch a42 PSI
    table cell-for-cell, and the memory sink shows multi-batch
    accretion (update mode re-emits growing counts)."""
    a = {
        (r.event_type, r.wk, r.bkt): (r.p_ref, r.p_cur, r.psi_term)
        for r in CATALOG["a42_psi_weekly"][0](spark, sf_dir).collect()
    }
    x = {
        (r.event_type, r.wk, r.bkt): (r.p_ref, r.p_cur, r.psi_term)
        for r in CATALOG["x18b_stream_psi_weekly"][0](
            spark, sf_dir
        ).collect()
    }
    assert a == x
    raw = spark.table("x18b_mem")
    assert (
        raw.count()
        > raw.select("event_type", "wk", "bkt").distinct().count()
    )


def test_ks_grouped_equals_per_key_global(spark, sf_dir):
    """ks_2sample_by(keys=[wk]) must equal running the single-pair
    ks_2sample on each week's slice independently — the grouped
    operator is a partition-parallel generalization, not a different
    statistic. Also: its plan has no partition-less window (the whole
    point of grouping the CDF by key)."""
    from finporter_spark.operators.stats import ks_2sample, ks_2sample_by

    e = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    s = e.select(
        F.date_trunc("week", "ts").alias("wk"),
        F.round(F.col("value") * 100).cast("bigint").alias("iv"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("a"),
    )
    grouped = {
        r.wk: (r.n1, r.n2, r.at_v, r.d_stat, r.p_approx)
        for r in ks_2sample_by(s, "iv", "a", ["wk"]).collect()
    }
    assert len(grouped) >= 3
    for wk in grouped:
        solo = ks_2sample(
            s.where(F.col("wk") == wk).select("iv", "a"), "iv", "a"
        ).collect()[0]
        assert grouped[wk] == (
            solo.n1, solo.n2, solo.at_v, solo.d_stat, solo.p_approx
        ), wk

    from finporter_spark.operators.stats import (
        mann_whitney_u,
        mann_whitney_u_by,
    )

    gm = {
        r.wk: (r.n1, r.n2, r.u1, r.u2, r.z)
        for r in mann_whitney_u_by(s, "iv", "a", ["wk"]).collect()
    }
    assert set(gm) == set(grouped)
    for wk in gm:
        solo = mann_whitney_u(
            s.where(F.col("wk") == wk).select("iv", "a"), "iv", "a"
        ).collect()[0]
        assert gm[wk] == (solo.n1, solo.n2, solo.u1, solo.u2, solo.z), wk


def test_pq_fit_rejects_indivisible_subspaces(spark):
    """ADVICE r10: dim % m != 0 must fail loudly — silently dropping
    the trailing dimensions from codebooks/ADC while pq_rerank scores
    full vectors would give inconsistent distances with no error."""
    from finporter_spark.operators.similarity import pq_fit

    df = spark.range(20).select(
        F.col("id"),
        F.array(*[
            (F.col("id") * (i + 1) % 7).cast("double") for i in range(6)
        ]).alias("v"),
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(df, "id", "v", m=4, k=2, iters=1)
    # divisible dims train fine
    books = pq_fit(df, "id", "v", m=3, k=2, iters=1)
    assert len(books) == 3 and all(len(b) == 2 for b in books)


def test_stats_domain_guard_raises_on_wide_domain(spark):
    """A caller feeding an unquantized/wide value domain must fail
    loudly (the single-partition CDF window would otherwise silently
    sort the whole domain on one task)."""
    from finporter_spark.operators.stats import ks_2sample, mann_whitney_u

    wide = spark.range(0, 500).select(
        F.col("id").alias("iv"), (F.col("id") % 2).cast("int").alias("a")
    )
    for op in (ks_2sample, mann_whitney_u):
        with pytest.raises(ValueError, match="domain has 500 cells"):
            op(wide, "iv", "a", max_domain=100)
        # same data under a sufficient ceiling computes fine
        assert op(wide, "iv", "a", max_domain=1000).count() == 1
