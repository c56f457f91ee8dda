"""Catalog extension — round-12 additions.

- ``a46_kruskal_wallis``: k-arm (k=3) exact tie-corrected
  Kruskal–Wallis H over md5-split experiment arms — the ≥3-variant
  omnibus test the two-sample family (a28 Welch, a37/a43 KS, a38/a44
  MWU, a41 z) could not answer.
- ``s17_variant_roundtrip``: VARIANT persisted THROUGH parquet
  (write → read → typed path extraction) — the storage half of the
  schema-on-read contract p18 opened at the expression level.
- ``o19_vacuum_versions``: retention/vacuum for the versioned
  idempotent merge sinks (x9/pipe3's layout) — the missing third of
  the lakehouse maintenance triad (o8 compacts, o12 snapshots,
  nothing reclaimed dead versions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from finporter_spark.queries.catalog import _t, query

# =====================================================================
# A46 — Kruskal–Wallis k-arm omnibus test (md5 3-way split)
# =====================================================================

_A46_ORACLE = """
    WITH m AS (
      SELECT user_id,
             SUM(CAST(round(value * 100) AS BIGINT)) AS iv,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 3 AS arm
      FROM events GROUP BY user_id
    ), g AS (
      SELECT iv,
             SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS c0,
             SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN arm = 2 THEN 1 ELSE 0 END) AS c2,
             COUNT(*) AS c
      FROM m GROUP BY iv
    ), cum AS (
      SELECT iv, c0, c1, c2, c,
             COALESCE(SUM(c) OVER (ORDER BY iv
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS f
      FROM g
    ), agg AS (
      SELECT SUM(c0) AS n0, SUM(c1) AS n1, SUM(c2) AS n2,
             SUM(c0 * (2 * f + c + 1)) AS r0,
             SUM(c1 * (2 * f + c + 1)) AS r1,
             SUM(c2 * (2 * f + c + 1)) AS r2,
             SUM(c * c * c - c) AS tie3
      FROM cum
    ), hh AS (
      SELECT n0, n1, n2,
             ((12.0 * (((CAST(r0 AS DOUBLE) * CAST(r0 AS DOUBLE))
                          / (4.0 * CAST(n0 AS DOUBLE))
                        + (CAST(r1 AS DOUBLE) * CAST(r1 AS DOUBLE))
                          / (4.0 * CAST(n1 AS DOUBLE)))
                       + (CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE))
                         / (4.0 * CAST(n2 AS DOUBLE))))
               / (CAST((n0 + n1) + n2 AS DOUBLE)
                  * (CAST((n0 + n1) + n2 AS DOUBLE) + 1.0))
              - 3.0 * (CAST((n0 + n1) + n2 AS DOUBLE) + 1.0))
             / (1.0 - CAST(tie3 AS DOUBLE)
                 / (CAST((n0 + n1) + n2 AS DOUBLE)
                    * CAST((n0 + n1) + n2 AS DOUBLE)
                    * CAST((n0 + n1) + n2 AS DOUBLE)
                    - CAST((n0 + n1) + n2 AS DOUBLE))) AS hx
      FROM agg
    )
    SELECT n0, n1, n2,
           round(hx, 6) AS h,
           round(LEAST(1.0, exp(-(hx / 2.0)) * 1.0), 6) AS p_approx
    FROM hh
    """


@query("a46_kruskal_wallis", _A46_ORACLE)
def a46_kruskal_wallis(spark, sf_dir):
    """A46: Kruskal–Wallis one-way rank test over THREE md5-split
    experiment arms on per-user spend totals — the k-arm omnibus the
    experiment-stats family was missing: a28/a37/a38/a41/a43/a44 all
    compare exactly two arms; a real 3-variant experiment needs the
    joint "are these k distributions the same?" answer BEFORE any
    pairwise drill-down (running the pairwise tests directly is the
    multiple-comparisons trap).

    Built on :func:`finporter_spark.operators.stats.kruskal_wallis` —
    mann_whitney_u's doubled-midrank machinery generalized to k
    conditional bigint sums over the pinned quantized domain (one
    corpus scan, one domain window, one scalar agg; H's fp arithmetic
    is ONE fixed left-associated expression over the 2k+2 bigint
    scalars, never a k-row float aggregation, so both engines evaluate
    the identical tree). Arms: conv(md5(user_id)[:8], 16, 10) % 3 —
    the a28 engine-portable split, widened to 3. k−1 = 2 is even, so
    the chi-square survival is closed-form exp(−H/2) (finite Poisson
    sum) — full value-hash oracle including the p-value.

    Pure-Python midrank cross-check + chi-square identity tests:
    tests/test_r12_ops.py."""
    from finporter_spark.operators.stats import kruskal_wallis

    e = _t(spark, sf_dir, "events")
    m = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("iv")
    ).select(
        "iv",
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 3
        ).alias("arm"),
    )
    return kruskal_wallis(m, "iv", "arm", [0, 1, 2])
