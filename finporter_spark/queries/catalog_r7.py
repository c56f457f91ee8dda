"""Round-7 catalog additions: the distributed exact-percentile
primitive exercised on a second distribution, and log-round connected
components for high-diameter graphs.

Each query follows the catalog contract (`catalog.query` registration,
DuckDB-runnable oracle, aliased output columns shared between engines).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from finporter_spark.queries.catalog import _t, query


# =====================================================================
# A16 — exact percentiles on a skewed distribution (events.value is
# exponential), incl. the edge fractions 0.0 / 1.0 and a deep tail
# =====================================================================


@query(
    "a16_event_value_percentiles",
    """
    SELECT event_type,
           quantile_cont(value, 0.0)  AS p0,
           quantile_cont(value, 0.5)  AS p50,
           quantile_cont(value, 0.9)  AS p90,
           quantile_cont(value, 0.99) AS p99,
           quantile_cont(value, 1.0)  AS p100
    FROM events GROUP BY event_type
    """,
)
def a16_event_value_percentiles(spark, sf_dir):
    """A16: the distributed exact rank-select (operators/scale.
    exact_percentiles, the a7 engine) on an EXPONENTIAL value
    distribution — long-tailed, so the uniform-width bucket ladder is
    deliberately stress-tested off its best case — including the p0 /
    p100 edge fractions (rank 1 / rank n: d = 0, lo == hi) and a deep
    p99 tail. Still exact vs DuckDB quantile_cont; no per-group value
    buffer anywhere in the plan (tests/test_scale.py plan assert)."""
    from finporter_spark.operators.scale import exact_percentiles

    long = exact_percentiles(
        _t(spark, sf_dir, "events"),
        ["event_type"],
        "value",
        [0.0, 0.5, 0.9, 0.99, 1.0],
    )
    pick = lambda q, n: F.max(  # noqa: E731
        F.when(F.col("fraction") == q, F.col("value"))
    ).alias(n)
    return long.groupBy("event_type").agg(
        pick(0.0, "p0"),
        pick(0.5, "p50"),
        pick(0.9, "p90"),
        pick(0.99, "p99"),
        pick(1.0, "p100"),
    )


# =====================================================================
# L30 — connected components on a HIGH-DIAMETER graph (star contraction)
# =====================================================================


@query(
    "l30_chain_components",
    """
    SELECT CAST(event_id AS BIGINT) AS node,
           CAST(MIN(event_id) OVER (PARTITION BY user_id) AS BIGINT)
             AS component
    FROM events
    QUALIFY COUNT(*) OVER (PARTITION BY user_id) >= 2
    """,
)
def l30_chain_components(spark, sf_dir):
    """L30: connected components over each user's event CHAIN (edge =
    consecutive events of one user, so one component per multi-event
    user and component diameter = the user's event count). Chains are
    the adversarial shape for the min-label CC behind l11 (rounds =
    diameter); the large-star/small-star contraction
    (operators/graph.connected_components_star) converges in O(log
    diameter) alternations instead — the 100 TB formulation for
    linked-list-shaped graphs (event timelines, provenance chains).
    Canonical label = min event id per component, so the oracle
    re-derives components directly from the per-user grouping."""
    from pyspark.sql import Window

    from finporter_spark.operators.graph import connected_components_star

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("prev", F.lag("event_id").over(w))
        .where(F.col("prev").isNotNull())
        .select(F.col("prev").alias("src"), F.col("event_id").alias("dst"))
    )
    return connected_components_star(edges).select(
        F.col("node").cast("bigint").alias("node"),
        F.col("component").cast("bigint").alias("component"),
    )
