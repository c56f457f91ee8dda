"""Round-8 catalog additions: the scale-correct entity-resolution
output contract (clusters, not row pairs) and follow-on operators.

Each query follows the catalog contract (`catalog.query` registration,
DuckDB-runnable oracle, aliased output columns shared between engines).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from finporter_spark.queries.catalog import _t, query


# =====================================================================
# P16b — fuzzy entity resolution with the CLUSTER output contract
# =====================================================================


@query(
    "p16b_er_clusters",
    r"""
    WITH RECURSIVE nm AS (
      SELECT DISTINCT p_brand AS brand, p_name AS name FROM part
    ), pr AS (
      SELECT a.brand, a.name AS name_l, b.name AS name_r
      FROM nm a JOIN nm b ON a.brand = b.brand AND a.name < b.name
      WHERE abs(length(a.name) - length(b.name)) <= 2
        AND levenshtein(a.name, b.name) <= 2
    ), e AS (
      SELECT brand, name_l AS src, name_r AS dst FROM pr
      UNION SELECT brand, name_r, name_l FROM pr
    ), reach AS (
      SELECT brand, name AS id, name AS lab FROM nm
      UNION
      SELECT e.brand, e.dst, reach.lab
      FROM reach JOIN e ON e.brand = reach.brand AND e.src = reach.id
    ), comp AS (
      SELECT brand, id AS name, min(lab) AS canon FROM reach
      GROUP BY brand, id
    ), keyed AS (
      SELECT p.p_partkey, c.brand, c.canon
      FROM part p JOIN comp c ON p.p_brand = c.brand AND p.p_name = c.name
    )
    SELECT p_partkey AS key,
           CAST(min(p_partkey) OVER (PARTITION BY brand, canon) AS BIGINT)
             AS canonical_key
    FROM keyed
    """,
)
def p16b_er_clusters(spark, sf_dir):
    """P16b: fuzzy entity resolution with the output contract that
    survives scale — canonical CLUSTERS, not row pairs. p16_fuzzy_join
    returns every matched row pair; its distinct-value scoring stage is
    scale-free, but the all-pairs result SHAPE is itself quadratic in
    per-value row counts (measured 40× at the sf1→sf10 decade —
    round-7 verdict WEAK flag). Real ER emits one canonical id per row:

    1. the same length-pruned, thresholded-levenshtein scoring over
       DISTINCT (brand, name) pairs — comparator cost ∝ vocabulary²
       within a brand block, never row count;
    2. connected components over the scored name graph
       (operators/dedup.connected_components — min-label, right for
       these dense tiny-diameter clusters; nodes are brand-scoped
       strings so components never cross brands). The graph is
       vocabulary-sized, not corpus-sized;
    3. every part row keyed back through two linear equi-joins:
       (brand, name) → component, then component → min p_partkey as
       the canonical survivor id.

    Output is exactly one row per part row — LINEAR in the corpus. A
    10× bigger corpus with the same vocabulary re-scores nothing and
    emits 10× rows, not 100×. p16_fuzzy_join is retained as the
    small-SF all-pairs oracle baseline (SURVEY §2B-ext row updated).
    The oracle recomputes the closure with a recursive CTE; singleton
    names (no fuzzy match) label themselves."""
    from finporter_spark.operators.dedup import connected_components

    SEP = "\t"  # never occurs in p_brand/p_name (word tokens)
    p = _t(spark, sf_dir, "part")
    names = p.select(
        F.col("p_brand").alias("brand"), F.col("p_name").alias("name_l")
    ).distinct()
    cand = (
        names.join(
            names.select("brand", F.col("name_l").alias("name_r")), "brand"
        )
        .filter(F.col("name_l") < F.col("name_r"))
        .filter(F.abs(F.length("name_l") - F.length("name_r")) <= 2)
        .filter(F.levenshtein("name_l", "name_r", 2) >= 0)
        .select(
            F.concat_ws(SEP, "brand", "name_l").alias("id_l"),
            F.concat_ws(SEP, "brand", "name_r").alias("id_r"),
        )
    )
    comp = connected_components(cand, "id_l", "id_r")
    rows = p.select(
        "p_partkey",
        F.concat_ws(SEP, "p_brand", "p_name").alias("node"),
    )
    # singleton names never enter the edge set: label themselves
    labeled = rows.join(comp, rows.node == comp.id, "left").select(
        "p_partkey",
        F.coalesce(F.col("cluster"), F.col("node")).alias("component"),
    )
    canon = labeled.groupBy("component").agg(
        F.min("p_partkey").alias("canonical_key")
    )
    return labeled.join(canon, "component").select(
        F.col("p_partkey").alias("key"),
        F.col("canonical_key").cast("bigint").alias("canonical_key"),
    )


# =====================================================================
# L31 — triangle counting (degree-ordered orientation)
# =====================================================================


@query(
    "l31_triangle_count",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ), t AS (
      SELECT COUNT(*) AS n_triangles
      FROM e e1
      JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
      JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           CAST(n_triangles AS BIGINT) AS n_triangles
    FROM t
    """,
)
def l31_triangle_count(spark, sf_dir):
    """L31: triangle counting over the part co-purchase graph (parts
    co-occurring in an order are linked — the 'bought together' motif
    count that feeds recommendation and community features).

    The naive count joins the edge list to itself twice — wedge
    generation fans out Σ deg(v)², quadratic on hub nodes (a part in
    10⁵ orders → 10¹⁰ wedges). The MapReduce-scale formulation (Suri &
    Vassilvitskii WWW'11; Cohen's degree-ordered orientation): orient
    every edge from the endpoint with the SMALLER (degree, id) pair to
    the larger — a DAG in which each triangle has exactly one source
    node — then wedges are pairs of OUT-edges (out-degree ≤ O(√m) for
    every node, no matter how skewed the raw degrees) and a triangle is
    a wedge whose far endpoints are themselves an oriented edge (one
    equi-join on the pair). Work is O(m^1.5) worst-case, hub-proof.

    All keyed equi-joins + map-combinable aggs; the per-order pair
    expansion is bounded by order size (≤ ~13 parts). The oracle counts
    the same triangles with the id-ordered 3-way self-join — the count
    is orientation-invariant."""
    li = _t(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    e = (
        op.alias("a")
        .join(op.alias("b"), "o")
        .where(F.col("a.p") < F.col("b.p"))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    ek = (
        e.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
        .select(
            "u", "v",
            F.struct(F.col("du").alias("d"), F.col("u").alias("n")).alias("uk"),
            F.struct(F.col("dv").alias("d"), F.col("v").alias("n")).alias("vk"),
        )
    )
    oriented = ek.select(
        F.when(F.col("uk") < F.col("vk"), F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(F.col("uk") < F.col("vk"), F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(F.col("uk") < F.col("vk"), F.col("vk")).otherwise(F.col("uk")).alias("dk"),
    )
    w1 = oriented.select("src", F.col("dst").alias("b"), F.col("dk").alias("bk"))
    w2 = oriented.select("src", F.col("dst").alias("c"), F.col("dk").alias("ck"))
    wedges = w1.join(w2, "src").where(F.col("bk") < F.col("ck")).select("b", "c")
    closing = oriented.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"]).agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )
    n_edges = e.agg(F.count("*").cast("bigint").alias("n_edges"))
    return n_edges.crossJoin(tri)


# =====================================================================
# W15 — per-key union-of-intervals coverage (island detection)
# =====================================================================


@query(
    "w15_interval_coverage",
    """
    WITH iv AS (
      SELECT user_id, epoch(ts) AS s, epoch(ts) + value * 60 AS e
      FROM events
    ), x AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS rm
      FROM iv
    ), y AS (
      SELECT user_id, s, e,
             CASE WHEN rm IS NULL OR s > rm THEN 1 ELSE 0 END AS brk
      FROM x
    ), z AS (
      SELECT user_id, s, e,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM y
    ), g AS (
      SELECT user_id, island,
             CAST(MAX(e) - MIN(s) AS DECIMAL(28,6)) AS cov
      FROM z GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(cov) AS DOUBLE) AS covered_seconds
    FROM g GROUP BY user_id
    """,
)
def w15_interval_coverage(spark, sf_dir):
    """W15: union-of-intervals coverage per key — each event occupies
    [ts, ts + value minutes]; overlapping/adjacent intervals merge into
    islands and the answer is (island count, total covered seconds) per
    user. The interval-union staple (session coverage, uptime, sensor
    dwell) computed without pair joins: ONE window per key (running max
    of interval end over preceding rows detects island breaks), a
    cumulative sum assigns island ids, and two keyed aggs finish — the
    sweep-line algorithm as window algebra, linear in events.

    Cross-engine determinism: epoch seconds are exact doubles (µs
    integers < 2^53), identical IEEE arithmetic on both engines; the
    only order-sensitive reduction (summing island coverages) routes
    through DECIMAL(28,6) like every money sum in the catalog. Interval
    ties (s, e) are order-insensitive by construction: a tied row's
    running max already covers its start, so neither brk nor island
    membership depends on tie order."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").cast("double").alias("us"),
        F.col("value").alias("val"),
    )
    iv = ev.select(
        "user_id",
        (F.col("us") / 1e6).alias("s"),
        (F.col("us") / 1e6 + F.col("val") * 60).alias("e"),
    )
    wp = Window.partitionBy("user_id").orderBy("s", "e")
    rm = F.max("e").over(wp.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(rm.isNull() | (F.col("s") > rm), F.lit(1)).otherwise(
        F.lit(0)
    )
    z = iv.withColumn("brk", brk).withColumn(
        "island",
        F.sum("brk").over(wp.rowsBetween(Window.unboundedPreceding, 0)),
    )
    g = z.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).cast("decimal(28,6)").alias("cov")
    )
    return g.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_islands"),
        F.sum("cov").cast("double").alias("covered_seconds"),
    )


# =====================================================================
# X13 — stream-stream LEFT SEMI interval join
# =====================================================================


@query(
    "x13_stream_semi_join",
    """
    SELECT a.event_id AS view_id, a.user_id, a.ts AS view_ts
    FROM events a
    WHERE a.event_type = 'view'
      AND EXISTS (
        SELECT 1 FROM events b
        WHERE b.user_id = a.user_id
          AND b.event_type = 'purchase'
          AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR
      )
    """,
)
def x13_stream_semi_join(spark, sf_dir):
    """X13: stream-stream LEFT SEMI interval join — views that LED TO a
    purchase by the same user within 6 hours, each view emitted at most
    once (existence, not pair enumeration: x7's inner join fans out per
    matching purchase; attribution pipelines that only gate on
    conversion want the fanout-free shape, and the semi join's state is
    evicted identically). Same staged multi-batch CSV drop and drain
    harness as x7; retention exceeds the data span so the drained
    output is exactly the batch EXISTS the oracle runs. Outer
    stream-stream joins are deliberately not drained this way — see
    stream_interval_join's docstring."""
    from finporter_spark.queries.catalog_ext import _stage_once
    from finporter_spark.streaming.pipeline import (
        run_stream_to_memory,
        stream_interval_join,
    )

    path = _stage_once(
        sf_dir,
        "x7",  # same drop as x7: identical layout, staged once
        lambda p: _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
            "user_id",
            "event_type",
        )
        .repartition(8)
        .write.mode("overwrite")
        .csv(p, header=True),
        "events",
    )

    def side(kind, prefix):
        return (
            spark.readStream.schema(
                "event_id bigint, ts timestamp, user_id bigint, "
                "event_type string"
            )
            .option("header", True)
            .option("maxFilesPerTrigger", 4)  # force multi-batch buffering
            .csv(path)
            .filter(F.col("event_type") == kind)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").alias(f"{prefix}_ts"),
                "user_id",
            )
        )

    joined = stream_interval_join(
        side("view", "view"),
        side("purchase", "purchase"),
        key="user_id",
        ts_left="view_ts",
        ts_right="purchase_ts",
        within="6 hours",
        watermark="365 days",
        how="left_semi",
    )
    out = run_stream_to_memory(joined, "x13_mem", output_mode="append")
    return out.select("view_id", "user_id", F.col("view_ts"))
