"""Catalog extension — round-12 additions.

- ``a46_kruskal_wallis`` / ``a46b_kw_weekly`` / ``a47_dunn_posthoc``:
  the k-arm experiment-stats family — exact tie-corrected
  Kruskal–Wallis omnibus (whole-period + weekly cadence) and Dunn's
  joint-rank post-hoc pairwise readout; the ≥3-variant answers the
  two-sample family (a28 Welch, a37/a43 KS, a38/a44 MWU, a41 z)
  could not give.
- ``s17_variant_roundtrip``: VARIANT persisted THROUGH parquet
  (write → read → typed path extraction) — the storage half of the
  schema-on-read contract p18 opened at the expression level.
- ``o19_vacuum_versions``: retention/vacuum for the versioned
  idempotent merge sinks (x9/pipe3's layout) — the missing third of
  the lakehouse maintenance triad (o8 compacts, o12 snapshots,
  nothing reclaimed dead versions).
- ``l46_ivfadc_structured`` / ``l46b_ivfadc_residual`` /
  ``l46c_ivfadc_m8``: the ANN family re-pinned on the PLANTED-CLUSTER
  corpus (the r11 verdict's top ask) — plain IVFADC at √N sizing,
  residual refinement (reversed there: +17 pp at the same budget),
  and the m=8 code-budget dial; index codes staged at ingest.
- ``x20_stream_ann_ingest``: streaming ANN index ingest — new vectors
  encoded map-only per micro-batch against the frozen quantizer;
  drained index == batch build.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from finporter_spark.operators.similarity import ivfadc_params
from finporter_spark.operators.stats import normal_sf_two_sided_sql
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
    from finporter_spark.queries.staging import stage_once as _stage_once
    from finporter_spark.queries.catalog_r11 import (
        p18_json_expr as _p18_json_expr,
    )

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
    from finporter_spark.queries.staging import io_dir as _io_dir
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
    # explicit raise, not assert: the vacuum contract must survive
    # python -O (a stripped assert would defer the failure to an
    # anonymous hash diff)
    if stats["removed"] != [0, 1] or stats["kept"] != [2, 3]:
        raise RuntimeError(f"o19 vacuum contract violated: {stats}")
    return read_final(spark).select(
        "user_id", "ts", "event_id", "event_type"
    )


# =====================================================================
# L46/L46b — ANN on a PLANTED-CLUSTER corpus (structured embeddings)
# =====================================================================
#
# Every ANN recall number before round 12 was measured on the
# testdata's structure-free random embeddings — PQ/IVF's worst case
# (no cluster structure to exploit; the round-11 verdict's #1). The
# structured corpus plants 64 md5-derived cluster centers (uniform
# [-0.15, 0.15] per dim — center sd ≈ 1.2 × the corpus noise sd, so
# clusters OVERLAP rather than trivially separate) and shifts every
# original embedding by its vec_id % 64 cluster's center:
#     struct[d] = round(center[vec_id % 64][d] + emb[d], 6)
# Deterministic, cross-engine (md5 + exact IEEE add + the 6 dp pin),
# derived from the SAME parquet both engines read — so the whole
# IVFADC pipeline on it carries full value-hash oracles.

# The budget dial comes from the SIZING RULE, not hand-picked numbers
# (operators.similarity.ivfadc_params — the round-12 verdict's #1):
# the catalog entries and their import-time oracles are pinned at the
# struct-sf0.1 reference density (N=2000); the SAME rule sizes every
# other density live (tools/ivfadc_decade.py struct rows, the decade
# recall pins in tests/test_recall_sf01.py).
from finporter_spark.queries.ann_fixtures import (  # noqa: F401,E402
    _CL_CTE,
    _L46B_SHORT,
    _L46_CLUSTERS,
    _L46_DIAL,
    _L46_ITERS,
    _L46_K,
    _L46_NPROBE,
    _L46_REF_N,
    _L46_SCALE,
    _L46_SHORT,
    _STRUCT_E,
    _emb_fingerprint,
    _l46_oracle,
    _l46b_oracle,
    _res_pq_sub_ctes,
    _staged_structured_embeddings,
    _struct_centroid_rows,
)


@query("l46_ivfadc_structured", _l46_oracle())
def l46_ivfadc_structured(spark, sf_dir):
    """L46: IVFADC re-pinned on the PLANTED-CLUSTER corpus — the
    round-11 verdict's top ask: every prior ANN recall number
    (l3_lsh 0.87, l45b 0.74, l45c 0.605) was measured on structure-free
    random embeddings, PQ/IVF's worst case, so nothing in the repo
    predicted behavior on real (clustered) embeddings. The structured
    corpus (module header: 64 planted md5-derived centers, overlap by
    construction) is staged dataset state; coarse k=64 (≈√N at sf0.1 —
    the IVF sizing rule, vs l45c's k=16 on the random corpus), PQ
    m=4 × 16 codes, n_probe=6, shortlist=200, exact top-10 rerank.

    MEASURED at sf0.1 (tests/test_recall_sf01.py pins the floor):
    recall 0.855 vs exact top-10 at scanned fraction 0.094 — vs 0.605
    for the SAME machinery on the random corpus (l45c) and 1.000 when
    the planted centers are 2× farther apart (trivial corpus, rejected:
    a benchmark the operator cannot fail measures nothing). Index
    state (quantizer, codebooks, codes) staged once per corpus version
    — query runs touch m+1 small ints per candidate + Q×200 raw rows.

    Full value-hash oracle: the structured-embedding construction, BOTH
    Lloyd trainings (coarse 64×3, PQ 4×(16×2)), probe, ADC and rerank
    all unrolled in DuckDB over the same parquet — bit-identical
    decisions via the 6 dp/lowest-index contract."""
    from finporter_spark.operators.similarity import (
        ivfadc_topk,
        load_or_build_ivfadc_codes,
        load_or_train_centroids_det,
        load_or_train_pq_books,
    )
    from finporter_spark.queries.staging import io_dir as _io_dir
    from finporter_spark.queries.ann_fixtures import (
        _PQ_M,
        _PQ_QMAX,
        _PQ_QMOD,
        _PQ_TOPK,
    )

    se = _staged_structured_embeddings(spark, sf_dir)
    cents = load_or_train_centroids_det(
        se, "vec_id", "embedding", dim=64,
        n_centroids=_L46_K, iters=_L46_ITERS,
        cache_path=_io_dir(sf_dir, f"l46_coarse_k{_L46_K}_i{_L46_ITERS}"),
        fingerprint=_emb_fingerprint(sf_dir),
)
    books = load_or_train_pq_books(
        se, "vec_id", "embedding", m=_PQ_M, k=16, iters=2,
        cache_path=_io_dir(sf_dir, f"l46_books_m{_PQ_M}_k16"),
        fingerprint=_emb_fingerprint(sf_dir),
)
    codes = load_or_build_ivfadc_codes(
        se, "vec_id", "embedding", cents, books,
        cache_path=_io_dir(sf_dir, f"l46_codes_k{_L46_K}_m{_PQ_M}"),
        fingerprint=_emb_fingerprint(sf_dir),
    )
    queries = se.where(
        (F.col("vec_id") % _PQ_QMOD == 0) & (F.col("vec_id") < _PQ_QMAX)
    )
    out = ivfadc_topk(
        se, queries, "vec_id", "embedding", cents, books,
        n_probe=_L46_NPROBE, shortlist=_L46_SHORT, k=_PQ_TOPK,
        codes=codes,
    )
    return out.select(
        "query_id", "cand_id", F.col("rank").cast("int").alias("rank"),
        "dist2",
    )


@query("l46b_ivfadc_residual", _l46b_oracle())
def l46b_ivfadc_residual(spark, sf_dir):
    """L46b: IVFADC with RESIDUAL REFINEMENT (Jégou TPAMI 2011 §III.C
    — the paper's actual construction) on the planted-cluster corpus —
    the decision round 11 deferred, RE-VALIDATED and REVERSED on
    structured data: PQ codes quantize x − centroid[cell] and each
    query ADC-scores against a per-probed-cell LUT built from its own
    residual. On the random corpus this bought +0–5 pp (residuals of
    structure-free points are just shifted copies — round-11
    measurement, correctly rejected THERE); on the structured corpus
    residuals concentrate around 0 and the same 4×16 codebook budget
    yields **recall 0.785 vs plain PQ's 0.615 at the identical
    shortlist=50 / n_probe=6 budget** (+17 pp, tests/test_recall_sf01
    pins the gap), letting a 4× smaller rerank budget match plain
    PQ's shortlist=200 quality class. Cost: LUT work × n_probe per
    query (still broadcast-sized: Q × n_probe rows), the blowup that
    made it a bad trade on data it couldn't help.

    Index state (quantizer, residual codebooks, residual codes) staged
    once; full value-hash oracle unrolls coarse Lloyd, the residual
    table, FOUR residual-PQ Lloyd trainings, per-cell LUTs, ADC and
    rerank — bit-identical cross-engine."""
    from finporter_spark.operators.similarity import (
        ivfadc_residual_topk,
        load_or_build_ivfadc_codes,
        load_or_train_centroids_det,
        load_or_train_pq_books,
        residual_vectors,
    )
    from finporter_spark.queries.staging import io_dir as _io_dir
    from finporter_spark.queries.ann_fixtures import (
        _PQ_M,
        _PQ_QMAX,
        _PQ_QMOD,
        _PQ_TOPK,
    )

    se = _staged_structured_embeddings(spark, sf_dir)
    cents = load_or_train_centroids_det(
        se, "vec_id", "embedding", dim=64,
        n_centroids=_L46_K, iters=_L46_ITERS,
        cache_path=_io_dir(sf_dir, f"l46_coarse_k{_L46_K}_i{_L46_ITERS}"),
        fingerprint=_emb_fingerprint(sf_dir),
)
    rv = residual_vectors(se, "vec_id", "embedding", cents)
    rbooks = load_or_train_pq_books(
        rv, "vec_id", "_rv", m=_PQ_M, k=16, iters=2,
        cache_path=_io_dir(sf_dir, f"l46b_res_books_m{_PQ_M}_k16"),
        fingerprint=_emb_fingerprint(sf_dir),
)
    rcodes = load_or_build_ivfadc_codes(
        se, "vec_id", "embedding", cents, rbooks,
        cache_path=_io_dir(sf_dir, f"l46b_res_codes_k{_L46_K}_m{_PQ_M}"),
        residual=True,
        fingerprint=_emb_fingerprint(sf_dir),
    )
    queries = se.where(
        (F.col("vec_id") % _PQ_QMOD == 0) & (F.col("vec_id") < _PQ_QMAX)
    )
    out = ivfadc_residual_topk(
        se, queries, "vec_id", "embedding", cents, rbooks,
        n_probe=_L46_NPROBE, shortlist=_L46B_SHORT, k=_PQ_TOPK,
        codes=rcodes,
    )
    return out.select(
        "query_id", "cand_id", F.col("rank").cast("int").alias("rank"),
        "dist2",
    )


# =====================================================================
# X20 — streaming ANN index ingest (incremental codes == batch codes)
# =====================================================================


def _x20_oracle() -> str:
    """Batch derivation of the full codes table: coarse Lloyd unroll
    (l3_ivf's k=16 CTEs) for the cell + l45's per-subspace PQ unrolls
    for the codes, joined per vector."""
    from finporter_spark.queries.ann_fixtures import (
        _ivf_dist_cte,
        _ivf_mean_cte,
    )
    from finporter_spark.queries.ann_fixtures import (
        _PQ_M,
        _pq_sub_ctes,
    )

    ivf_rounds = []
    prev = "c0"
    for r in range(1, 4):
        ivf_rounds.append(_ivf_dist_cte(prev, f"d{r}", f"a{r}"))
        ivf_rounds.append(_ivf_mean_cte(f"a{r}", prev, f"m{r}", f"c{r}"))
        prev = f"c{r}"
    ivf = ",".join(ivf_rounds)
    subs = ",".join(_pq_sub_ctes(i) for i in range(_PQ_M))
    code_joins = " ".join(
        f"JOIN a3_{i} USING (vec_id)" if i else "FROM a3_0"
        for i in range(_PQ_M)
    )
    code_cols = ", ".join(f"a3_{i}.cid AS c{i}" for i in range(_PQ_M))
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    c0 AS (SELECT CAST(vec_id AS INT) AS cid,
                  list_transform(emb, x -> ROUND(x, 6)) AS cen
           FROM e WHERE vec_id < 16),
    {ivf},
    {_ivf_dist_cte(prev, 'df', 'af')},
    {subs},
    codes AS (SELECT a3_0.vec_id, {code_cols} {code_joins})
    SELECT codes.vec_id AS cand_id, af.cid AS cell,
           {', '.join(f'codes.c{i}' for i in range(_PQ_M))}
    FROM codes JOIN af ON af.vec_id = codes.vec_id
    """


@query("x20_stream_ann_ingest", _x20_oracle())
def x20_stream_ann_ingest(spark, sf_dir):
    """X20: STREAMING ANN index ingest — the maintenance story that
    makes the staged-codes design (l45c/l46) production-complete: a
    100 TB vector corpus doesn't arrive once, it ACCRUES, and the index
    must stay fresh without re-encoding history. New vectors arrive as
    a JSON-lines file stream (2 forced micro-batches) and each batch is
    encoded MAP-ONLY against the FROZEN quantizer + codebooks (the
    cached l3_ivf/l45 dataset state riding as plan literals — exactly
    how production IVF serves: the quantizer trains on the initial
    corpus and new data is encoded, not re-clustered): cell assignment
    + m PQ codes per vector, zero state store, zero shuffle, append
    mode. The drained index == the one-shot batch build over the whole
    corpus — certified by the FULL value-hash oracle (both Lloyd
    unrolls composed, per-vector cell + 4 codes compared exactly).

    This is the ingest half of the l45c contract: l45c reads the
    staged codes table; x20 is how that table keeps growing at the
    stream's pace (a file-sink deployment appends parquet the query
    side reads; the memory sink here is the test harness). Encoding
    drift (a re-trained quantizer) is a REBUILD, not an append — the
    o19 vacuum reclaims superseded builds.

    Scale: per-batch cost is a map-only projection over the batch's
    rows (embarrassingly parallel, no watermark needed — stateless);
    the plan carries no exchange at all."""
    from finporter_spark.operators.similarity import (
        build_ivfadc_codes,
        load_or_train_centroids_det,
    )
    from finporter_spark.queries.staging import (
        io_dir as _io_dir,
        src_fp as _src_fp,
        stage_once as _stage_once,
    )
    from finporter_spark.queries.ann_fixtures import (
        _PQ_M,
        _pq_books,
    )
    from finporter_spark.streaming.pipeline import run_stream_to_memory

    emb = _t(spark, sf_dir, "embeddings")
    books = _pq_books(spark, sf_dir, emb)
    # fingerprint-guard the shared centroid cache exactly like its
    # other consumers (l3_ivf/l45c): a cold x20 run must stamp the
    # cache, and a testdata regeneration must retrain, not serve the
    # old corpus's quantizer
    cents = load_or_train_centroids_det(
        emb, "vec_id", "embedding", dim=64, n_centroids=16, iters=3,
        cache_path=_io_dir(sf_dir, "l3_ivf_centroids_det_k16_d64_i3"),
        fingerprint=_src_fp(sf_dir, "embeddings"),
    )

    def _write(p):
        (
            emb.select(
                "vec_id",
                F.transform(
                    "embedding", lambda x: x.cast("double")
                ).alias("embedding"),
            )
            .repartition(8)
            .write.mode("overwrite")
            .json(p)
        )

    path = _stage_once(
        sf_dir, "x20", _write, "embeddings", extra_fingerprint="json-v1"
    )
    sdf = (
        spark.readStream.schema("vec_id bigint, embedding array<double>")
        # 8 files -> 2 batches: the encode is stateless map-only, so
        # two batches already prove per-batch ingest == batch build
        # (round-13 drain trim from 4)
        .option("maxFilesPerTrigger", 4)
        .json(path)
    )
    enc = build_ivfadc_codes(sdf, "vec_id", "embedding", cents, books)
    out = run_stream_to_memory(
        enc, "x20_mem", output_mode="append", state_partitions=8
    )
    return out.select(
        "cand_id",
        F.col("_cell").cast("int").alias("cell"),
        *[F.col(f"_c{i}").cast("int").alias(f"c{i}") for i in range(_PQ_M)],
    )


# =====================================================================
# L46c — the PQ code-budget dial (m=8) with a full oracle
# =====================================================================

# the m=8 dial is DERIVED, not hand-picked: it is what the sizing
# rule returns at the struct-sf10 density (N=80k, points-per-cell
# ~312 — the density where the m=4 codes collapse to 0.448 and this
# dial reads 0.798); the oracle below is parametric in _L46C_M, so
# the entry certifies the rule's level-1 output end-to-end
_L46C_REF_N = 80_000
_L46C_M = ivfadc_params(_L46C_REF_N, 64)["m"]
_L46C_SUB = 64 // _L46C_M  # 8-dim subspaces at m=8


def _m8_pq_sub_ctes(i: int) -> str:
    """catalog_r10's ``_pq_sub_ctes`` parameterized to the m=8 split
    (8-dim subspaces): init = slices of the 16 smallest vec_ids, two
    Lloyd rounds, final assignment = the code, per-query LUT."""
    from finporter_spark.queries.ann_fixtures import (
        _PQ_QMAX,
        _PQ_QMOD,
    )

    lo = i * _L46C_SUB

    def dist(src_c: str, d: str, a: str) -> str:
        return f"""
    {d} AS (SELECT s.vec_id, c.cid,
              ROUND(list_sum(list_transform(list_zip(s.s, c.cen),
                    z -> (z[1] - z[2])*(z[1] - z[2]))), 6) AS d
       FROM ms{i} s CROSS JOIN {src_c} c),
    {a} AS (SELECT vec_id, cid, d FROM (
         SELECT vec_id, cid, d,
                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
         FROM {d}) WHERE rk = 1)"""

    def mean(a: str, prev_c: str, mname: str, cname: str) -> str:
        return f"""
    {mname} AS (SELECT {a}.cid, g.i, ROUND(AVG(s.s[g.i]), 6) AS v
       FROM {a} JOIN ms{i} s USING (vec_id)
            CROSS JOIN generate_series(1, {_L46C_SUB}) AS g(i)
       GROUP BY {a}.cid, g.i),
    {cname} AS (SELECT {prev_c}.cid, COALESCE(mm.cen, {prev_c}.cen) AS cen
       FROM {prev_c} LEFT JOIN (SELECT cid, array_agg(v ORDER BY i) AS cen
                          FROM {mname} GROUP BY cid) mm USING (cid))"""

    return f"""
    ms{i} AS (SELECT vec_id, emb[{lo + 1}:{lo + _L46C_SUB}] AS s FROM e),
    mc0_{i} AS (SELECT CAST(vec_id AS INT) AS cid,
                  list_transform(s, x -> ROUND(x, 6)) AS cen
           FROM ms{i} WHERE vec_id < 16),
    {dist(f'mc0_{i}', f'md1_{i}', f'ma1_{i}')},
    {mean(f'ma1_{i}', f'mc0_{i}', f'mm1_{i}', f'mc1_{i}')},
    {dist(f'mc1_{i}', f'md2_{i}', f'ma2_{i}')},
    {mean(f'ma2_{i}', f'mc1_{i}', f'mm2_{i}', f'mc2_{i}')},
    {dist(f'mc2_{i}', f'md3_{i}', f'ma3_{i}')},
    mlut_{i} AS (SELECT q.vec_id AS query_id, c.cid,
              ROUND(list_sum(list_transform(
                    list_zip(q.emb[{lo + 1}:{lo + _L46C_SUB}], c.cen),
                    z -> (z[1] - z[2])*(z[1] - z[2]))), 6) AS d
       FROM e q CROSS JOIN mc2_{i} c
       WHERE q.vec_id % {_PQ_QMOD} = 0 AND q.vec_id < {_PQ_QMAX})"""


def _l46c_oracle() -> str:
    from finporter_spark.queries.ann_fixtures import (
        _ivf_dist_cte,
        _ivf_mean_cte,
    )
    from finporter_spark.queries.ann_fixtures import (
        _PQ_QMAX,
        _PQ_QMOD,
        _PQ_TOPK,
    )

    ivf_rounds = []
    prev = "c0"
    for r in range(1, _L46_ITERS + 1):
        ivf_rounds.append(_ivf_dist_cte(prev, f"d{r}", f"a{r}"))
        ivf_rounds.append(_ivf_mean_cte(f"a{r}", prev, f"m{r}", f"c{r}"))
        prev = f"c{r}"
    ivf = ",".join(ivf_rounds)
    m = _L46C_M
    subs = ",".join(_m8_pq_sub_ctes(i) for i in range(m))
    code_joins = " ".join(
        f"JOIN ma3_{i} USING (vec_id)" if i else "FROM ma3_0"
        for i in range(m)
    )
    code_cols = ", ".join(f"ma3_{i}.cid AS c{i}" for i in range(m))
    lut_joins = " ".join(
        f"JOIN mlut_{i} l{i} ON l{i}.cid = codes.c{i}"
        f" AND l{i}.query_id = qp.query_id"
        for i in range(m)
    )
    ad = " + ".join(f"l{i}.d" for i in range(m))
    return f"""
    WITH {_STRUCT_E},
    c0 AS (SELECT CAST(vec_id AS INT) AS cid,
                  list_transform(emb, x -> ROUND(x, 6)) AS cen
           FROM e WHERE vec_id < {_L46_K}),
    {ivf},
    {_ivf_dist_cte(prev, 'df', 'af')},
    qp AS (SELECT vec_id AS query_id, cid FROM (
         SELECT vec_id, cid,
                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid)
                  AS rk
         FROM df WHERE vec_id % {_PQ_QMOD} = 0 AND vec_id < {_PQ_QMAX})
       WHERE rk <= {_L46_NPROBE}),
    {subs},
    codes AS (SELECT ma3_0.vec_id, {code_cols} {code_joins}),
    score AS (SELECT qp.query_id, codes.vec_id AS cand_id,
                     ROUND({ad}, 6) AS adist
              FROM codes
              JOIN af ON af.vec_id = codes.vec_id
              JOIN qp ON qp.cid = af.cid
              {lut_joins}),
    short AS (SELECT query_id, cand_id FROM (
      SELECT query_id, cand_id,
             row_number() OVER (
               PARTITION BY query_id ORDER BY adist, cand_id) AS rk
      FROM score) WHERE rk <= {_L46B_SHORT}),
    exact AS (SELECT s.query_id, s.cand_id,
                ROUND(list_sum(list_transform(list_zip(eq.emb, ec.emb),
                      z -> (z[1] - z[2])*(z[1] - z[2]))), 6) AS dist2
              FROM short s
              JOIN e eq ON eq.vec_id = s.query_id
              JOIN e ec ON ec.vec_id = s.cand_id)
    SELECT query_id, cand_id, rank, dist2 FROM (
      SELECT query_id, cand_id, dist2,
             CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY dist2, cand_id) AS INT)
               AS rank
      FROM exact) WHERE rank <= {_PQ_TOPK}
    """


@query("l46c_ivfadc_m8", _l46c_oracle())
def l46c_ivfadc_m8(spark, sf_dir):
    """L46c: the PQ CODE-BUDGET dial (m=8, 8-dim subspaces) with a
    full oracle — the dial the struct-sf10 decade row showed is the
    binding one at corpus growth: at 1250 points per planted cluster
    the fixed m=4 codes read recall 0.448 and doubling the code budget
    (m=8, same k=16 per subspace — 8 bytes/vector instead of 4)
    recovers 0.798 at the same probe budget (IVFADC_DECADE sweep +
    SCALING.md one-offs). This entry certifies the m=8 COMPOSITION
    end-to-end (eight per-subspace Lloyd unrolls in the oracle) at the
    TIGHT shortlist=50 budget where code quality, not rerank slack,
    decides the answer — the same budget where l46b's residual codes
    are pinned, so the catalog carries all three points of the design
    space at one budget (sf0.1, measured): plain m=4 **0.615**,
    plain m=8 **0.66** (this entry), residual m=4 **0.785**. The
    ordering is density-dependent and both sides of it are now
    evidence: at sf0.1's ~31 points/cluster the binding error is
    WHICH cells get probed (residual LUTs fix more of it than finer
    codes), while at struct-sf10's ~1250 points/cluster code
    resolution binds and m=8 is the winning dial (0.798 vs m=4's
    0.574 at n_probe=12/shortlist=400 — IVFADC_DECADE + SCALING.md).
    tests/test_recall_sf01.py pins m=8 > m=4 at this budget.

    Same staged-state contract (books/codes keyed by corpus + m);
    same 6 dp/lowest-index determinism; scale shape identical to l46
    with codes twice as wide — still m+1 small ints per candidate."""
    from finporter_spark.operators.similarity import (
        ivfadc_topk,
        load_or_build_ivfadc_codes,
        load_or_train_centroids_det,
        load_or_train_pq_books,
    )
    from finporter_spark.queries.staging import io_dir as _io_dir
    from finporter_spark.queries.ann_fixtures import (
        _PQ_QMAX,
        _PQ_QMOD,
        _PQ_TOPK,
    )

    se = _staged_structured_embeddings(spark, sf_dir)
    cents = load_or_train_centroids_det(
        se, "vec_id", "embedding", dim=64,
        n_centroids=_L46_K, iters=_L46_ITERS,
        cache_path=_io_dir(sf_dir, f"l46_coarse_k{_L46_K}_i{_L46_ITERS}"),
        fingerprint=_emb_fingerprint(sf_dir),
)
    books = load_or_train_pq_books(
        se, "vec_id", "embedding", m=_L46C_M, k=16, iters=2,
        cache_path=_io_dir(sf_dir, f"l46_books_m{_L46C_M}_k16"),
        fingerprint=_emb_fingerprint(sf_dir),
)
    codes = load_or_build_ivfadc_codes(
        se, "vec_id", "embedding", cents, books,
        cache_path=_io_dir(sf_dir, f"l46c_codes_k{_L46_K}_m{_L46C_M}"),
        fingerprint=_emb_fingerprint(sf_dir),
    )
    queries = se.where(
        (F.col("vec_id") % _PQ_QMOD == 0) & (F.col("vec_id") < _PQ_QMAX)
    )
    out = ivfadc_topk(
        se, queries, "vec_id", "embedding", cents, books,
        n_probe=_L46_NPROBE, shortlist=_L46B_SHORT, k=_PQ_TOPK,
        codes=codes,
    )
    return out.select(
        "query_id", "cand_id", F.col("rank").cast("int").alias("rank"),
        "dist2",
    )


# =====================================================================
# A47 — Dunn's post-hoc pairwise readout (after the a46 omnibus)
# =====================================================================

_A47_ALPHA = 0.05  # family-wise error rate, Bonferroni over 3 pairs


def _a47_pair_sql(i: int, j: int) -> str:
    mri = f"(CAST(r{i} AS DOUBLE) / (2.0 * CAST(n{i} AS DOUBLE)))"
    mrj = f"(CAST(r{j} AS DOUBLE) / (2.0 * CAST(n{j} AS DOUBLE)))"
    sig2 = (
        "(nd * (nd + 1.0) / 12.0"
        " - CAST(tie3 AS DOUBLE) / (12.0 * (nd - 1.0)))"
        f" * ((1.0 / CAST(n{i} AS DOUBLE))"
        f" + (1.0 / CAST(n{j} AS DOUBLE)))"
    )
    # NULL-guard mirrors the Spark operator (F.when(sig2 > 0, ...)):
    # on a degenerate all-tied domain sig2 <= 0 must yield NULL on
    # BOTH engines, not DuckDB NaN/inf vs Spark NULL
    z = (
        f"(CASE WHEN {sig2} > 0 THEN"
        f" round(({mri} - {mrj}) / sqrt({sig2}), 6) END)"
    )
    return f"""
      SELECT '{i}' AS arm_i, '{j}' AS arm_j,
             n{i} AS ni, n{j} AS nj,
             {mri} AS mean_rank_i, {mrj} AS mean_rank_j,
             {z} AS z
      FROM dn"""


_A47_ORACLE = f"""
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
    ), dn AS (
      SELECT *, CAST((n0 + n1) + n2 AS DOUBLE) AS nd FROM agg
    )
    SELECT arm_i, arm_j, ni, nj, mean_rank_i, mean_rank_j, z, p_adj,
           p_adj <= {_A47_ALPHA} AS significant
    FROM (
      SELECT arm_i, arm_j, ni, nj, mean_rank_i, mean_rank_j, z,
             CASE WHEN z IS NOT NULL THEN
               round(least(1.0, 3.0 * {normal_sf_two_sided_sql('z')}), 6)
             END AS p_adj
      FROM (
        {" UNION ALL ".join(_a47_pair_sql(i, j) for i in range(3) for j in range(i + 1, 3))}
      )
    )
    """


@query("a47_dunn_posthoc", _A47_ORACLE)
def a47_dunn_posthoc(spark, sf_dir):
    """A47: Dunn's post-hoc pairwise test — the step a46 leaves open:
    the omnibus says SOME arm differs; Dunn says WHICH, comparing
    per-arm mean ranks from the SAME joint midranking (re-running
    pairwise MWU re-ranks each pair in isolation — a different, and
    at k>2 anti-conservative, procedure). Arms/values identical to
    a46 (md5 3-way split over per-user cent totals), so the pair reads
    compose with the omnibus read.

    Built on :func:`finporter_spark.operators.stats.dunn_posthoc`: the
    k(k−1)/2 pair rows explode from ONE scalar aggregate (no second
    corpus pass); mean ranks are bigint-exact doubled rank sums
    divided once; the tie-corrected z is a fixed-association
    expression; ``p_adj`` is the REAL Bonferroni-adjusted two-sided
    p-value — min(1, 3·erfc(|z|/√2)) via the Abramowitz–Stegun 7.1.26
    polynomial (``operators.stats.normal_sf_two_sided``, |err| ≤
    1.5e-7, mirrored literally in the oracle — erf is not an engine
    builtin but IS five multiply-adds and an exp, which both engines
    evaluate bit-identically on the rounded z) — and ``significant``
    decides p_adj ≤ 0.05 on the ROUNDED p, so the hash certifies z,
    the p-value, AND the decision on all three pairs."""
    from finporter_spark.operators.stats import dunn_posthoc

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
    return dunn_posthoc(m, "iv", "arm", [0, 1, 2], alpha=_A47_ALPHA)


# =====================================================================
# A46b — weekly (grouped) Kruskal–Wallis: k-arm drift at the cadence
# =====================================================================

_A46B_ORACLE = """
    WITH s AS (
      SELECT date_trunc('week', ts) AS wk,
             CAST(round(value * 100) AS BIGINT) AS iv,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 3 AS arm
      FROM events
    ), g AS (
      SELECT wk, iv,
             SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS c0,
             SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN arm = 2 THEN 1 ELSE 0 END) AS c2,
             COUNT(*) AS c
      FROM s GROUP BY 1, 2
    ), cum AS (
      SELECT wk, iv, c0, c1, c2, c,
             COALESCE(SUM(c) OVER (PARTITION BY wk ORDER BY iv
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS f
      FROM g
    ), agg AS (
      SELECT wk,
             SUM(c0) AS n0, SUM(c1) AS n1, SUM(c2) AS n2,
             SUM(c0 * (2 * f + c + 1)) AS r0,
             SUM(c1 * (2 * f + c + 1)) AS r1,
             SUM(c2 * (2 * f + c + 1)) AS r2,
             SUM(c * c * c - c) AS tie3
      FROM cum GROUP BY wk
    ), hh AS (
      SELECT wk, n0, n1, n2,
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
    SELECT wk, n0, n1, n2,
           round(hx, 6) AS h,
           round(LEAST(1.0, exp(-(hx / 2.0)) * 1.0), 6) AS p_approx
    FROM hh
    """


@query("a46b_kw_weekly", _A46B_ORACLE)
def a46b_kw_weekly(spark, sf_dir):
    """A46b: per-WEEK exact Kruskal–Wallis across the three md5 arms
    on raw event values — a46 at the production monitoring cadence,
    completing the drift-family symmetry (a37→a43 KS, a38→a44 MWU,
    a46→a46b KW): one H/p row per week, so a k-arm experiment's
    dashboard reads are-the-arms-still-exchangeable OVER TIME and a
    single drifted week can't hide in the whole-period omnibus.

    Built on :func:`finporter_spark.operators.stats.kruskal_wallis_by`
    — the grouped generalization whose cumulative window partitions BY
    week (no single-partition domain sort anywhere; per-task state is
    one week's quantized domain; the a37 localCheckpoint pin keeps it
    one corpus scan). Per-week H is the same fixed-association
    expression over that week's 2k+2 bigint scalars; even-df survival
    stays closed-form. Note the unit here is EVENTS (weekly per-user
    totals would thin to ~1 obs/arm/week); a46 keeps the per-user
    grain for the whole-period read."""
    from finporter_spark.operators.stats import kruskal_wallis_by

    e = _t(spark, sf_dir, "events")
    s = e.select(
        F.date_trunc("week", "ts").alias("wk"),
        F.round(F.col("value") * 100).cast("bigint").alias("iv"),
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 3
        ).alias("arm"),
    )
    return kruskal_wallis_by(s, "iv", "arm", [0, 1, 2], ["wk"])
