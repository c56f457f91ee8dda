"""Round-8 catalog additions: the scale-correct entity-resolution
output contract (clusters, not row pairs) and follow-on operators.

Each query follows the catalog contract (`catalog.query` registration,
DuckDB-runnable oracle, aliased output columns shared between engines).
"""

from __future__ import annotations

from pyspark.sql import functions as F

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
