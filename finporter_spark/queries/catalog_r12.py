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


# =====================================================================
# S17 — VARIANT through parquet (the storage half of schema-on-read)
# =====================================================================

_S17_ORACLE = """
    WITH j AS (
      SELECT event_id,
             '{"t":"' || event_type || '","ks":['
               || CAST(event_id % 5 AS VARCHAR) || ','
               || CAST(event_id % 7 AS VARCHAR)
               || '],"nested":{"cents":'
               || CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)
               || CASE WHEN event_id % 3 = 0
                       THEN ',"tag":"hot"' ELSE '' END
               || '}}' AS js
      FROM events
    ), x AS (
      SELECT json_extract_string(js, '$.t') AS t,
             COALESCE(json_extract_string(js, '$.nested.tag'), '') AS tag,
             CAST(json_extract(js, '$.nested.cents') AS BIGINT) AS cents,
             CAST(json_extract(js, '$.ks[1]') AS BIGINT) AS k2
      FROM j
    )
    SELECT t, tag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents_total,
           CAST(SUM(k2) AS BIGINT) AS k2_total
    FROM x GROUP BY t, tag
    """


@query("s17_variant_roundtrip", _S17_ORACLE)
def s17_variant_roundtrip(spark, sf_dir):
    """S17: VARIANT PERSISTED THROUGH PARQUET — the storage half of
    the schema-on-read contract p18 opened at the expression level:
    p18 proves parse_json → variant_get inside one plan; a raw event
    lake needs the parsed binary VARIANT to survive a write→read cycle
    so ingestion parses each document ONCE and every later query reads
    the columnar variant encoding (Spark 4 writes variant as its
    shredded binary parquet representation). The staged table persists
    (event_id, v VARIANT); the query reads it back and runs typed path
    extraction + an aggregate over the extracted values — per
    (t, tag): count, Σcents, Σks[1] — so the value hash certifies
    write-side encoding, read-side decoding, path extraction AFTER the
    roundtrip, and the optional-field NULL (tag coalesced to '' to
    keep the group key engine-portable), not merely row survival.

    Oracle: DuckDB synthesizes the identical document and aggregates
    its own JSON-path extractions — two independent engines, one
    through a binary storage roundtrip, one through string JSON, must
    agree on every typed value (cents/k2 ride as bigints; no float
    enters). Staged once per corpus fingerprint (the _stage_once
    contract); scale shape is a map-only parse at ingest plus an
    ordinary keyed agg at read."""
    from finporter_spark.queries.catalog_ext import _stage_once
    from finporter_spark.queries.catalog_r11 import _p18_json_expr

    def _write(p):
        (
            _t(spark, sf_dir, "events")
            .select(
                "event_id", F.parse_json(_p18_json_expr()).alias("v")
            )
            .write.mode("overwrite")
            .parquet(p)
        )

    path = _stage_once(
        sf_dir, "s17", _write, "events", extra_fingerprint="variant-v1"
    )
    v = spark.read.parquet(path)
    x = v.select(
        F.variant_get("v", "$.t", "string").alias("t"),
        F.coalesce(
            F.variant_get("v", "$.nested.tag", "string"), F.lit("")
        ).alias("tag"),
        F.variant_get("v", "$.nested.cents", "bigint").alias("cents"),
        F.variant_get("v", "$.ks[1]", "bigint").alias("k2"),
    )
    return x.groupBy("t", "tag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("cents_total"),
        F.sum("k2").alias("k2_total"),
    )


# =====================================================================
# O19 — version retention/vacuum for versioned merge sinks
# =====================================================================


@query(
    "o19_vacuum_versions",
    """
    SELECT user_id, ts, event_id, event_type
    FROM (
      SELECT user_id, ts, event_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id)
               AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def o19_vacuum_versions(spark, sf_dir):
    """O19: version RETENTION for the versioned idempotent merge sinks
    — the maintenance op x9/pipe3's layout was missing: every committed
    micro-batch persists a full ``state_v{batch_id}`` snapshot (that is
    what makes replay idempotent), so without vacuum the sink stores
    the whole state once per batch forever. o8 compacts small files
    WITHIN a table; o19 reclaims superseded VERSIONS of it —
    completing the lakehouse maintenance triad.

    The chain here is the production sink's own code path
    (``versioned_keep_first_sink``'s merge fn, driven batch-side over
    four event_id-strided slices — keep-lowest-event_id per user), then
    :func:`finporter_spark.operators.scale.vacuum_versions` removes
    everything but the newest ``keep=2`` versions (2, not 1: a
    crash-replayed final batch must still find its parent — the
    keep-rationale lives on the operator), then the returned result is
    read from the VACUUMED sink. The oracle is the one-shot keep-first
    over the whole corpus: the hash passes only if vacuum removed
    nothing the final state needs — re-read-after-vacuum equality is
    the entry's contract, and the file-count / crash-mid-vacuum /
    replay-after-vacuum assertions live in tests/test_r12_ops.py.

    Scale: vacuum is O(#versions) directory renames + deletes, no data
    movement, no Spark job; each removal is an atomic rename to a
    tombstone so readers never observe a half-deleted version."""
    import shutil

    from finporter_spark.operators.scale import vacuum_versions
    from finporter_spark.queries.catalog_ext import _io_dir
    from finporter_spark.streaming.pipeline import (
        versioned_keep_first_sink,
    )

    root = _io_dir(sf_dir, "o19_state")
    shutil.rmtree(root, ignore_errors=True)
    merge, read_final = versioned_keep_first_sink(
        root, key_col="user_id", order_col="event_id"
    )
    e = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    for i in range(4):
        merge(e.where(F.col("event_id") % 4 == i), i)
    stats = vacuum_versions(root, keep=2)
    assert stats["removed"] == [0, 1] and stats["kept"] == [2, 3], stats
    return read_final(spark).select(
        "user_id", "ts", "event_id", "event_type"
    )
