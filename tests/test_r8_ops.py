"""Round-8 operator tests: triangle counting, interval coverage, the
KMV intersection sketch's accuracy contract, and CUPED's variance
claim. Catalog-query VALUE correctness is the DuckDB oracle gate
(tools/oracle_check.py); these tests pin the semantic properties the
oracle can't express."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from finporter_spark.queries.catalog import CATALOG


def test_triangle_count_known_graphs(spark):
    """Degree-ordered triangle counting on graphs with known answers:
    K4 (4 triangles), a 4-cycle (0), and a hub star plus one chord
    (exactly 1 triangle — the hub-adversarial case the orientation
    exists for)."""
    from finporter_spark.queries.catalog_r8 import _count_triangles

    def run(edges):
        df = spark.createDataFrame(edges, "u bigint, v bigint")
        return _count_triangles(df).collect()[0]["n_triangles"]

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert run(k4) == 4
    cycle = [(0, 1), (1, 2), (2, 3), (0, 3)]
    assert run(cycle) == 0
    # star: hub 0 to 1..9; chord (1,2) closes exactly one triangle
    star = [(0, i) for i in range(1, 10)] + [(1, 2)]
    assert run(star) == 1


def test_interval_coverage_merging_and_islands(spark, sf_dir):
    """w15 on a hand-built fixture: overlapping intervals merge,
    touching intervals (end == next start) merge (s > rm breaks, equal
    does not), disjoint ones split islands."""
    rows = [
        # user 1: [0,10], [5,20] overlap; [20,30] touches -> ONE island
        (1, 0.0, 10.0), (1, 5.0, 20.0), (1, 20.0, 30.0),
        # user 2: [0,1] and [5,6] -> two islands, coverage 2
        (2, 0.0, 1.0), (2, 5.0, 6.0),
    ]
    from pyspark.sql import Window

    df = spark.createDataFrame(rows, "user_id int, s double, e double")
    wp = Window.partitionBy("user_id").orderBy("s", "e")
    rm = F.max("e").over(wp.rowsBetween(Window.unboundedPreceding, -1))
    z = df.withColumn(
        "brk",
        F.when(rm.isNull() | (F.col("s") > rm), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn(
        "island",
        F.sum("brk").over(wp.rowsBetween(Window.unboundedPreceding, 0)),
    )
    g = (
        z.groupBy("user_id", "island")
        .agg((F.max("e") - F.min("s")).alias("cov"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("cov").alias("cov"))
    )
    out = {r["user_id"]: (r["n"], r["cov"]) for r in g.collect()}
    assert out == {1: (1, 30.0), 2: (2, 2.0)}


def test_kmv_intersection_accuracy_vs_exact(spark, sf_dir):
    """a19's estimates vs EXACT pairwise intersection counts at sf0.1
    (1500 users: sketches truncate to k=256, so the estimator is
    actually estimating). KMV relative error concentrates around
    1/sqrt(k) ≈ 0.0625; assert every pair within 5/sqrt(k) = 31% and
    the MEAN error within 2/sqrt(k) = 12.5%."""
    sf01 = "/root/testdata/sf0.1"
    est = {
        (r["type_a"], r["type_b"]): r["est_common_users"]
        for r in CATALOG["a19_kmv_intersection"][0](spark, sf01).collect()
    }
    ev = (
        spark.read.parquet(f"{sf01}/events.parquet")
        .select(F.col("event_type").alias("t"), "user_id")
        .distinct()
    )
    a, b = ev.alias("a"), ev.alias("b")
    exact = {
        (r["ta"], r["tb"]): r["n"]
        for r in (
            a.join(
                b,
                (F.col("a.user_id") == F.col("b.user_id"))
                & (F.col("a.t") < F.col("b.t")),
            )
            .groupBy(
                F.col("a.t").alias("ta"), F.col("b.t").alias("tb")
            )
            .agg(F.count("*").alias("n"))
        ).collect()
    }
    assert set(est) == set(exact)
    k = 256
    rels = []
    for pair, e in est.items():
        x = exact[pair]
        rel = abs(e - x) / max(x, 1)
        rels.append(rel)
        assert rel <= 5 / math.sqrt(k), (pair, e, x)
    assert sum(rels) / len(rels) <= 2 / math.sqrt(k), rels


def test_cuped_reduces_variance_and_preserves_mean(spark):
    """CUPED's contract on a synthetic corpus with a strong pre/post
    correlation: the adjusted per-user metric has (1) the same overall
    mean as the raw metric (adjustment is mean-zero) and (2) strictly
    smaller variance — by ~corr² = 64% here."""
    rng = random.Random(7)
    rows = []
    for uid in range(2000):
        base = rng.gauss(100, 30)          # user-level propensity
        x = base + rng.gauss(0, 10)        # pre-period
        y = base + rng.gauss(0, 10) + 5.0  # post-period + lift
        rows.append((uid, float(x), float(y)))
    m = spark.createDataFrame(rows, "user_id long, x double, y double")
    g = m.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).collect()[0]
    n = g["n"]
    xbar, ybar = g["sx"] / n, g["sy"] / n
    theta = (g["sxy"] / n - xbar * ybar) / (g["sxx"] / n - xbar * xbar)
    adj = m.select(
        "y", (F.col("y") - theta * (F.col("x") - xbar)).alias("yc")
    )
    s = adj.agg(
        F.avg("y").alias("my"),
        F.avg("yc").alias("myc"),
        F.var_pop("y").alias("vy"),
        F.var_pop("yc").alias("vyc"),
    ).collect()[0]
    assert s["myc"] == pytest.approx(s["my"], rel=1e-12)
    # corr(x,y) ≈ 900/1000 -> variance shrinks to ~1 - 0.81 = 19%
    assert s["vyc"] < 0.4 * s["vy"], (s["vy"], s["vyc"])


def test_stream_interval_join_rejects_outer(spark):
    """The drain harness refuses outer stream-stream joins instead of
    silently returning inner-equal results (documented contract)."""
    from finporter_spark.streaming.pipeline import stream_interval_join

    with pytest.raises(ValueError, match="unsupported stream join"):
        stream_interval_join(
            spark.range(1), spark.range(1), "id", "a", "b",
            how="left_outer",
        )
