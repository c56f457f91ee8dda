"""Catalog extension — round-13 additions.

- ``o20_time_travel_read``: the accessor the o19 retention story left
  implicit — ``read_version`` / ``list_versions`` over the versioned
  merge sinks (layered ``state_v{batch_id}`` snapshots), with the
  vacuum interaction (reading a reclaimed version fails loudly).
- ``l47_ivfadc_zipf``: IVFADC re-measured on a ZIPF-populated
  planted-cluster corpus — the round-12 verdict's #2: the balanced
  ``vec_id % 64`` fixture gave every cell exactly n/64 vectors, but
  real embedding clusters are Zipf-sized; here cluster membership is
  an md5-deterministic draw against Zipf(1) integer thresholds
  (hottest cluster ≈ 21% of the corpus), full value-hash oracle.
  The hot-cell mitigation (``operators.similarity.split_hot_cells``)
  is measured in tests/test_r13_ops.py and the ``zipf_*`` rows of
  IVFADC_DECADE.json.
- ``l48_repeated_span_coverage``: ARBITRARY-length repeated-span
  dedup (the Lee et al. 2022 exact-substring shape) — 8-gram anchors
  as the detector, per-document interval union recovering each
  maximal repeated span's true token length.
- ``a48_kw_4arm``: Kruskal–Wallis over four arms — the odd-df
  chi-square survival (erfc-anchored upward recurrence) the k-arm
  family documented as NULL until the round-13 erfc polynomial.
- ``x21_stream_minhash_dedup``: streaming near-dup dedup at ingest —
  per-batch md5 MinHash banding merged into the versioned keep-first
  sink keyed by band bucket; drained first-seen state == the one-shot
  batch banding (full hash oracle).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from finporter_spark.queries.catalog import _t, _TOKS, query
from finporter_spark.queries.ann_fixtures import (
    _CL_CTE,
    _L46_CLUSTERS,
    _L46_SCALE,
    _l46_oracle,
    _struct_centroid_rows,
)

# =====================================================================
# The Zipf-populated planted-cluster corpus (shared fixture)
# =====================================================================

from finporter_spark.queries.ann_fixtures import (  # noqa: F401,E402
    _ZIPF_E,
    _ZIPF_RES,
    _ZIPF_U_SQL,
    _staged_zipf_embeddings,
    _zipf_bounds,
    _zipf_fingerprint,
)


@query("l47_ivfadc_zipf", _l46_oracle(corpus_cte=_ZIPF_E))
def l47_ivfadc_zipf(spark, sf_dir):
    """L47: IVFADC on the ZIPF-POPULATED planted-cluster corpus — the
    skew case the balanced l46 fixture could not stress (round-12
    verdict #2): cluster membership is an md5-deterministic draw
    against Zipf(1) integer thresholds, so the hottest planted cluster
    holds ≈21% of the corpus (vs exactly 1/64 in l46). Identical
    machinery and rule-sized dial as l46 (k=64 at the reference
    density, m=4, n_probe=6, shortlist=200; every cache keyed by the
    zipf recipe fingerprint).

    What the skew does, MEASURED at sf0.1/1/10 (IVFADC_DECADE
    ``zipf_*`` rows + tests/test_r13_ops.py) — two distinct regimes:

    - Quantizer TRAINED on the skewed corpus (this entry): Lloyd
      allocates centroids ∝ density, so cell populations stay under
      ~10% (split_hot_cells at cap 0.1 is a measured NO-OP) and the
      scanned fraction matches the balanced corpus (0.100 vs 0.094).
      The cost is RECALL at the fixed budget — 0.81 vs 0.855 at
      sf0.1, 0.76 vs 0.858 at sf1, 0.656 vs 0.798 at struct-sf10
      (rare-cluster starvation: the tail clusters get fewer centroids
      and coarser effective codes). Measured mitigation: RESIDUAL
      codes at the identical dial read 0.842 at zipf-sf10
      (IVFADC_DECADE zipf_10_res; pinned in tests) — residuals
      concentrate around 0 regardless of cluster population.
    - Quantizer FROZEN from a different distribution (the x20
      train-once-then-drift deployment): the hot planted cluster
      lands in ONE cell holding 20% of the corpus (measured 0.202) —
      a straggler partition in the ADC join at 100 TB.
      ``operators.similarity.split_hot_cells`` (cells above a
      declared population cap replaced by sub-centroids trained on
      their own members — the FAISS-style imbalance fix) restores
      balance: max cell 0.066, k 64→68, recall unchanged (0.84),
      mean/tail scanned fraction not worse. Pinned in
      tests/test_r13_ops.py, not in this entry, because the split
      count is data-dependent (a conditional oracle unroll would pin
      the fixture, not the operator).

    Full value-hash oracle: the Zipf draw (integer thresholds inlined
    as literals in BOTH engines — no cross-engine float arithmetic in
    the draw), the center shift, both Lloyd trainings, probe, ADC and
    rerank, all unrolled in DuckDB over the same parquet."""
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
    from finporter_spark.queries.ann_fixtures import (
        _L46_ITERS,
        _L46_K,
        _L46_NPROBE,
        _L46_SHORT,
    )

    ze = _staged_zipf_embeddings(spark, sf_dir)
    fp = _zipf_fingerprint(sf_dir)
    cents = load_or_train_centroids_det(
        ze, "vec_id", "embedding", dim=64,
        n_centroids=_L46_K, iters=_L46_ITERS,
        cache_path=_io_dir(sf_dir, f"l47_coarse_k{_L46_K}_i{_L46_ITERS}"),
        fingerprint=fp,
    )
    books = load_or_train_pq_books(
        ze, "vec_id", "embedding", m=_PQ_M, k=16, iters=2,
        cache_path=_io_dir(sf_dir, f"l47_books_m{_PQ_M}_k16"),
        fingerprint=fp,
    )
    codes = load_or_build_ivfadc_codes(
        ze, "vec_id", "embedding", cents, books,
        cache_path=_io_dir(sf_dir, f"l47_codes_k{_L46_K}_m{_PQ_M}"),
        fingerprint=fp,
    )
    queries = ze.where(
        (F.col("vec_id") % _PQ_QMOD == 0) & (F.col("vec_id") < _PQ_QMAX)
    )
    out = ivfadc_topk(
        ze, queries, "vec_id", "embedding", cents, books,
        n_probe=_L46_NPROBE, shortlist=_L46_SHORT, k=_PQ_TOPK,
        codes=codes,
    )
    return out.select(
        "query_id", "cand_id", F.col("rank").cast("int").alias("rank"),
        "dist2",
    )

# =====================================================================
# O20 — time-travel read over the versioned merge sinks
# =====================================================================


@query(
    "o20_time_travel_read",
    """
    SELECT user_id, ts, event_id, event_type
    FROM (
      SELECT user_id, ts, event_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id)
               AS rn
      FROM events WHERE event_id % 4 <= 2
    ) WHERE rn = 1
    """,
)
def o20_time_travel_read(spark, sf_dir):
    """O20: TIME-TRAVEL over the versioned merge sinks — the accessor
    o19 left missing: every committed micro-batch already persists a
    full ``state_v{batch_id}`` keep-first snapshot (that is what makes
    replay idempotent), but nothing exposed the layered history.
    ``streaming.pipeline.list_versions`` enumerates the committed
    versions; ``read_version(spark, root, k)`` returns the merged
    state AS OF batch k — equal, by the snapshot construction, to
    recomputing the keep-first merge over batches 0..k, which is
    EXACTLY what this entry's oracle does (the one-shot keep-first
    over the first three of four event_id-strided batch slices).

    Interaction with retention, exercised inline: after
    ``vacuum_versions(keep=3)`` removes version 0, reading version 2
    still succeeds (it is inside the retention window) while reading
    version 0 raises loudly naming the surviving range — vacuum is
    irreversible, and silently serving the nearest surviving version
    would hand the caller the wrong point in time (checked here with
    an explicit raise-on-no-raise so a regression cannot hide behind
    the hash).

    Scale: a time-travel read is ONE parquet scan of the chosen
    snapshot — no replay, no log reconstruction; list/guard cost is a
    directory listing."""
    import shutil

    from finporter_spark.operators.scale import vacuum_versions
    from finporter_spark.queries.staging import io_dir as _io_dir
    from finporter_spark.streaming.pipeline import (
        list_versions,
        read_version,
        versioned_keep_first_sink,
    )

    root = _io_dir(sf_dir, "o20_state")
    shutil.rmtree(root, ignore_errors=True)
    merge, _read_final = versioned_keep_first_sink(
        root, key_col="user_id", order_col="event_id"
    )
    e = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    for i in range(4):
        merge(e.where(F.col("event_id") % 4 == i), i)
    stats = vacuum_versions(root, keep=3)
    if stats["removed"] != [0] or list_versions(root) != [1, 2, 3]:
        raise RuntimeError(f"o20 retention contract violated: {stats}")
    # the vacuumed version must fail LOUDLY, never fall back
    try:
        read_version(spark, root, 0)
    except FileNotFoundError:
        pass
    else:
        raise RuntimeError(
            "o20: read_version(0) served a vacuumed version"
        )
    return read_version(spark, root, 2).select(
        "user_id", "ts", "event_id", "event_type"
    )


# =====================================================================
# L48 — arbitrary-length repeated-span coverage (Lee et al. 2022 shape)
# =====================================================================


_L48_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), tl AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
      FROM toks WHERE len(toks) >= 8
    ), grams AS (
      SELECT doc_id, i - 1 AS i,
             md5(array_to_string(toks[i:i+7], ' ')) AS gkey
      FROM (
        SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 7)) AS i
        FROM toks WHERE len(toks) >= 8
      )
    ), first_seen AS (
      SELECT gkey, MIN(doc_id) AS fd FROM grams GROUP BY gkey
    ), dup AS (
      SELECT g.doc_id, g.i
      FROM grams g JOIN first_seen f USING (gkey)
      WHERE f.fd < g.doc_id
    ), flag AS (
      SELECT doc_id, i,
             CASE WHEN i > COALESCE(lag(i) OVER (
                    PARTITION BY doc_id ORDER BY i), -9) + 8
                  THEN 1 ELSE 0 END AS newg
      FROM dup
    ), grp AS (
      SELECT doc_id, i,
             SUM(newg) OVER (PARTITION BY doc_id ORDER BY i) AS g
      FROM flag
    ), spans AS (
      SELECT doc_id, g, MAX(i) - MIN(i) + 8 AS slen
      FROM grp GROUP BY doc_id, g
    ), agg AS (
      SELECT doc_id,
             SUM(slen) AS covered_tokens,
             COUNT(*) AS n_spans,
             MAX(slen) AS max_span
      FROM spans GROUP BY doc_id
    )
    SELECT tl.doc_id, tl.n_tokens,
           CAST(COALESCE(a.covered_tokens, 0) AS BIGINT)
             AS covered_tokens,
           CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(a.max_span, 0) AS BIGINT) AS max_span,
           CAST(COALESCE(a.covered_tokens, 0) AS DOUBLE) / tl.n_tokens
             AS coverage,
           (CAST(COALESCE(a.covered_tokens, 0) AS DOUBLE)
              / tl.n_tokens) < 0.5 AS keep
    FROM tl LEFT JOIN agg a USING (doc_id)
    """


@query("l48_repeated_span_coverage", _L48_ORACLE)
def l48_repeated_span_coverage(spark, sf_dir):
    """L48: ARBITRARY-LENGTH repeated-span dedup — the exact-substring
    standard (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better") the fixed-width l25 gate approximates:
    drop a document when ≥50% of its TOKENS are covered by some
    repeated span of ≥8 tokens first seen in a lower-id document, for
    spans of ANY length. 8-gram anchors are only the detector; the
    per-document interval union of duplicated anchor windows (the w15
    sweep-line algebra — equal-width intervals merge when the next
    start ≤ previous start + 8) recovers every maximal repeated
    span's true token length, with no distributed suffix array. The
    measurable difference is pinned in tests/test_r13_ops.py: a
    20-token document with an 11-token plagiarized span is 55% copied
    (dropped here) while l25 sees 4/13 anchors (0.31, kept) — the
    fixed-width fraction mis-measures exactly the variable-length
    spans this operator exists for; plus an independent pure-Python
    position-marking reference equality at sf0.001.

    Built on :func:`finporter_spark.operators.prep
    .repeated_span_coverage`. Scale: the l25 linear shape (positional
    16-byte md5 anchors, one gram-keyed first-doc window) plus two
    doc-partitioned windows and one doc-keyed left join — per-task
    state is one document's duplicated anchors. Full value-hash
    oracle (exact integers; one exact int/int→double division)."""
    from finporter_spark.operators.prep import repeated_span_coverage

    return repeated_span_coverage(
        _t(spark, sf_dir, "documents"), ngram_n=8
    )


# =====================================================================
# A48 — 4-arm Kruskal–Wallis (odd df: the erfc-anchored p-value)
# =====================================================================


def _a48_oracle() -> str:
    """4-arm KW oracle: the a46 construction widened to md5 % 4, with
    the ODD-df (df=3) chi-square survival mirrored literally —
    Q(x;3) = erfc(√(x/2)) + e^{−x/2}·√(x/2)/Γ(3/2) — the branch
    operators.stats._kw_h_and_p filled in round 13 (previously a
    documented NULL: "neither engine has erf")."""
    import math as _math

    from finporter_spark.operators.stats import erfc_poly_sql

    nd = "CAST((((n0 + n1) + n2) + n3) AS DOUBLE)"
    terms = [
        f"(CAST(r{i} AS DOUBLE) * CAST(r{i} AS DOUBLE))"
        f" / (4.0 * CAST(n{i} AS DOUBLE))"
        for i in range(4)
    ]
    ssum = f"((({terms[0]} + {terms[1]}) + {terms[2]}) + {terms[3]})"
    hx = (
        f"((12.0 * {ssum}) / ({nd} * ({nd} + 1.0))"
        f" - 3.0 * ({nd} + 1.0))"
        f" / (1.0 - CAST(tie3 AS DOUBLE)"
        f" / ({nd} * {nd} * {nd} - {nd}))"
    )
    c1 = 1.0 / _math.gamma(1.5)
    y = "sqrt((hx / 2.0))"
    p = (
        f"round(LEAST(1.0, {erfc_poly_sql(y)}"
        f" + exp(-(hx / 2.0)) * ({y} * {c1!r})), 6)"
    )
    arm_cols = ",\n             ".join(
        f"SUM(CASE WHEN arm = {i} THEN 1 ELSE 0 END) AS c{i}"
        for i in range(4)
    )
    agg_cols = ",\n             ".join(
        [f"SUM(c{i}) AS n{i}" for i in range(4)]
        + [f"SUM(c{i} * (2 * f + c + 1)) AS r{i}" for i in range(4)]
    )
    return f"""
    WITH m AS (
      SELECT user_id,
             SUM(CAST(round(value * 100) AS BIGINT)) AS iv,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 4 AS arm
      FROM events GROUP BY user_id
    ), g AS (
      SELECT iv,
             {arm_cols},
             COUNT(*) AS c
      FROM m GROUP BY iv
    ), cum AS (
      SELECT iv, c0, c1, c2, c3, c,
             COALESCE(SUM(c) OVER (ORDER BY iv
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS f
      FROM g
    ), agg AS (
      SELECT {agg_cols},
             SUM(c * c * c - c) AS tie3
      FROM cum
    ), hh AS (
      SELECT n0, n1, n2, n3, {hx} AS hx FROM agg
    )
    SELECT n0, n1, n2, n3,
           round(hx, 6) AS h,
           {p} AS p_approx
    FROM hh
    """


@query("a48_kw_4arm", _a48_oracle())
def a48_kw_4arm(spark, sf_dir):
    """A48: Kruskal–Wallis over FOUR declared arms (md5 % 4 over
    per-user cent totals) — the odd-degrees-of-freedom case (df = 3)
    the k-arm family could not price until round 13: a46/a46b ship
    k = 3 (df = 2, even) where the chi-square survival is a finite
    Poisson sum, and ``_kw_h_and_p`` documented odd df as NULL
    ("neither engine has erf as a builtin"). The erfc polynomial that
    gave the z-family real p-values closes it: Q(x; 3) = erfc(√(x/2))
    + e^{−x/2}·√(x/2)/Γ(3/2), anchored at Q(x;1) = erfc(√(x/2)) by
    the upward recurrence — fixed literals, fixed association,
    mirrored LITERALLY in the DuckDB oracle, so the full value hash
    covers n0..n3, the tie-corrected H, AND the odd-df p-value.

    Same machinery and scale shape as a46 (one corpus scan to the
    pinned quantized domain, one domain-sized window, one scalar
    aggregate; exact-decimal rank sums); 4-way md5 split is the a28
    engine-portable arm draw widened once more. The df=1 identity
    (KW at k=2 == squared MWU z, so p_approx == the MWU two-sided
    normal p) is pinned in tests/test_r13_ops.py, plus a
    4-arm pure-Python reference under hypothesis."""
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
            % 4
        ).alias("arm"),
    )
    return kruskal_wallis(m, "iv", "arm", [0, 1, 2, 3])


# =====================================================================
# X21 — streaming MinHash-LSH dedup at ingest (band-bucket first-seen)
# =====================================================================


def _x21_oracle() -> str:
    """Batch mirror: the l2 md5 signature/banding CTEs, then per
    bucket the FIRST (lowest) doc_id, then per doc the count of its 8
    band buckets first claimed by an earlier doc."""
    from finporter_spark.queries.catalog import (
        _l2_band_union,
        _l2_sig_ctes,
    )

    return f"""
    WITH {_l2_sig_ctes(32, 3)}, band AS (
      {_l2_band_union(32, 8)}
    ), fs AS (
      SELECT band_id, bh, MIN(doc_id) AS first_doc
      FROM band GROUP BY band_id, bh
    )
    SELECT b.doc_id,
           CAST(SUM(CASE WHEN fs.first_doc < b.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_bands,
           SUM(CASE WHEN fs.first_doc < b.doc_id THEN 1 ELSE 0 END) > 0
             AS is_dup
    FROM band b
    JOIN fs ON fs.band_id = b.band_id AND fs.bh = b.bh
    GROUP BY b.doc_id
    """


@query("x21_stream_minhash_dedup", _x21_oracle())
def x21_stream_minhash_dedup(spark, sf_dir):
    """X21: STREAMING near-dup dedup at ingest — the LLM-pipeline op
    the batch dedup family (l2) and the streaming maintenance family
    (x9/o19/o20) jointly imply: a 100 TB corpus ACCRUES, and each
    arriving document must be flagged against everything already
    ingested without re-signaturing history. Documents arrive as a
    JSON-lines file stream (2 forced micro-batches); each batch
    computes the l2 deterministic md5 MinHash signatures (32 hashes,
    batch-local keyed agg) and its 8 band buckets, and merges
    (bucket → lowest doc_id) into a ``versioned_keep_first_sink`` —
    the SAME idempotent snapshot sink o19 vacuums and o20 time-travels,
    keyed by band bucket instead of user: crash-replayed batches
    re-merge onto the right parent, and the drained state is the
    GLOBAL first-seen bucket owner regardless of how files batched.
    After the drain, each document's verdict is one equi-join of its
    buckets against the final state: ``is_dup`` iff ANY of its bands
    was first claimed by a lower doc_id (the LSH candidate criterion —
    the same banding l2 then verifies pairwise; at the ingest gate the
    band collision IS the flag, the precision/recall dials being bands
    × rows, the published banding trade).

    Full value-hash oracle: signatures, banding, bucket first-seen and
    the per-doc flag all unrolled in DuckDB over the same corpus (the
    md5 signature family is bit-identical cross-engine — the l2
    contract), certifying drained streaming state == the one-shot
    batch computation.

    Scale: per batch — one keyed signature agg over the BATCH's docs
    (map-combinable mins, ~docs × 32 longs), a map-only band explode,
    and the keep-first merge whose state is one row per DISTINCT
    bucket (≪ corpus text; the snapshot-per-batch layout is what o19's
    vacuum reclaims). No driver state, no all-pairs anything. COST
    CLASS: the md5 signature work (32 hashes × shingles) is paid per
    arriving document exactly once — the same total work as l2's
    one-time signature STAGING, amortized over the stream instead of
    one batch job; the verdict side reads l2's staged signature table
    (shared dataset state), never re-signaturing the corpus. Decade
    row is ingest-class (linear in arriving tokens), not query-class.

    Consumers that need the FLAGS, not the drain (pipe9/pipe9b),
    read :func:`_x21_flags_staged` — the drained verdict staged once
    per corpus version under its own state dirs, so the funnel
    entries neither re-run the ingest nor clobber this entry's
    directories (round-13 ADVICE)."""
    return _x21_dedup_flags(spark, sf_dir, "x21")


def _x21_dedup_flags(spark, sf_dir, tag):
    """The full x21 computation (stage JSON corpus -> streaming drain
    through the band-bucket keep-first sink -> per-doc dup flags) with
    state/checkpoint dirs keyed by ``tag`` so independent consumers
    never clobber each other's drains."""
    import shutil

    from finporter_spark.operators.dedup import (
        band_hash,
        minhash_signatures_fn,
    )
    from finporter_spark.queries.staging import (
        io_dir as _io_dir,
        stage_once as _stage_once,
    )
    from finporter_spark.streaming.pipeline import (
        run_stream_foreach_batch,
        versioned_keep_first_sink,
    )

    # expressions built ONCE and reused per micro-batch: Column objects
    # are unbound trees, and rebuilding the 32 signature members + 8
    # band structs per batch cost ~0.85 s/batch of pure driver py4j
    # time (measured — more than the batch's actual Spark work)
    _sig_fn = minhash_signatures_fn(hash_family="md5")
    _band_expr = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_id"),
                    band_hash(b, 4, "md5").alias("bh"),
                )
                for b in range(8)
            ]
        )
    ).alias("s")
    _band_cols = (
        F.concat_ws(
            ":", F.col("s.band_id").cast("string"), F.col("s.bh")
        ).alias("bkey"),
        F.col("s.band_id").alias("band_id"),
        F.col("s.bh").alias("bh"),
    )

    def _bands(sig):
        return sig.select("doc_id", _band_expr).select(
            *_band_cols, "doc_id"
        )

    def _write(p):
        # 32 files so each of the 2 micro-batches (maxFilesPerTrigger=16)
        # scans with 16 tasks: the per-batch md5 signature work (33
        # md5s/shingle, the oracle-pinned l2 family) is the drain's
        # dominant cost and file-source batches parallelize exactly by
        # file count — at 8 files/4-per-trigger the scan+explode+partial
        # agg ran in 4 tasks on 32 cores (guide §2.6 stragglers/idle
        # capacity). Same docs, same signatures, same merge result:
        # flags are batching/arrival-order independent by construction.
        (
            _t(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .repartition(32)
            .write.mode("overwrite")
            .json(p)
        )

    path = _stage_once(
        sf_dir, "x21", _write, "documents", extra_fingerprint="json-v2"
    )
    root = _io_dir(sf_dir, f"{tag}_state")
    ckpt = _io_dir(sf_dir, f"{tag}_ckpt")
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    merge, read_final = versioned_keep_first_sink(
        root, key_col="bkey", order_col="doc_id"
    )
    sdf = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 16)
        .json(path)
    )

    def sink(bdf, batch_id):
        sig = _sig_fn(bdf)
        merge(_bands(sig).select("bkey", "doc_id"), batch_id)

    run_stream_foreach_batch(sdf, sink, checkpoint=ckpt)
    first = read_final(spark).select(
        "bkey", F.col("doc_id").alias("first_doc")
    )
    # verdict side: the full-corpus signatures are the SAME dataset
    # state l2 stages (identical md5 family/params/cache key) — read
    # the staged table instead of re-signaturing the corpus (at sf10
    # the recompute was ~1/3 of the row's wall)
    import os as _os

    from finporter_spark.operators.dedup import load_or_build_signatures
    from finporter_spark.operators.scale import source_fingerprint

    sigs = load_or_build_signatures(
        _t(spark, sf_dir, "documents"),
        cache_path=_io_dir(sf_dir, "l2_sigs_md5_n3_k32"),
        fingerprint=source_fingerprint(
            _os.path.join(sf_dir, "documents.parquet")
        ),
        text_col="text", id_col="doc_id", shingle_n=3, num_hashes=32,
        hash_family="md5",
    )
    all_bands = _bands(sigs)
    n_dup = F.sum(
        F.when(F.col("first_doc") < F.col("doc_id"), 1).otherwise(0)
    )
    return (
        all_bands.join(first, "bkey")
        .groupBy("doc_id")
        .agg(n_dup.cast("bigint").alias("n_dup_bands"))
        .select(
            "doc_id",
            "n_dup_bands",
            (F.col("n_dup_bands") > 0).alias("is_dup"),
        )
    )


def _x21_flags_staged(spark, sf_dir):
    """The drained x21 verdict (doc_id, n_dup_bands, is_dup) as STAGED
    dataset state, once per corpus version — what funnel consumers
    (pipe9/pipe9b) read instead of re-running the whole streaming
    ingest per call (round-13 ADVICE: pipe9 calling x21 directly
    re-drained the stream inside pipe9's own timing and the two
    entries clobbered each other's state dirs). The stager performs
    the identical drain under private ``x21p_*`` dirs; the flags are
    batching/arrival-order independent by x21's construction, so the
    staged table equals what any fresh drain would produce (certified
    by pipe9's own stage-chained oracle)."""
    from finporter_spark.queries.staging import stage_once as _stage_once

    def _write(p):
        (
            _x21_dedup_flags(spark, sf_dir, "x21p")
            .repartition(4)
            .write.mode("overwrite")
            .parquet(p)
        )

    path = _stage_once(
        sf_dir, "x21_flags", _write, "documents", extra_fingerprint="v1"
    )
    return spark.read.parquet(path)


# =====================================================================
# PIPE9 — streaming-ingest curation funnel (x21 gate -> length floor)
# =====================================================================


def _pipe9_oracle() -> str:
    """The x21 banding/first-seen chain as a CTE, left-joined onto the
    corpus (docs too short to shingle carry no flag -> not dup), then
    the per-source funnel with a 30-token length floor."""
    from finporter_spark.queries.catalog import (
        _l2_band_union,
        _l2_sig_ctes,
        _TOKS,
    )

    return f"""
    WITH {_l2_sig_ctes(32, 3)}, band AS (
      {_l2_band_union(32, 8)}
    ), fs AS (
      SELECT band_id, bh, MIN(doc_id) AS first_doc
      FROM band GROUP BY band_id, bh
    ), flags AS (
      SELECT b.doc_id,
             SUM(CASE WHEN fs.first_doc < b.doc_id THEN 1 ELSE 0 END) > 0
               AS is_dup
      FROM band b
      JOIN fs ON fs.band_id = b.band_id AND fs.bh = b.bh
      GROUP BY b.doc_id
    ), d AS (
      SELECT doc_id, source, len({_TOKS}) AS n_tokens FROM documents
    ), j AS (
      SELECT d.source, d.n_tokens,
             COALESCE(f.is_dup, FALSE) AS dup
      FROM d LEFT JOIN flags f USING (doc_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup,
           CAST(SUM(CASE WHEN NOT dup AND n_tokens < 30
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
           CAST(SUM(CASE WHEN NOT dup AND n_tokens >= 30
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN NOT dup AND n_tokens >= 30
                         THEN n_tokens ELSE 0 END) AS BIGINT)
             AS kept_tokens
    FROM j GROUP BY source
    """


@query("pipe9_stream_ingest_curation", _pipe9_oracle())
def pipe9_stream_ingest_curation(spark, sf_dir):
    """PIPE9: the streaming-ingest CURATION funnel — what a training
    corpus actually runs at the door: documents arrive as a stream,
    the x21 ingest gate flags near-dups against everything already
    ingested (per-batch md5 MinHash banding merged into the versioned
    first-seen store — the drained flags are batching/arrival-order
    independent), survivors pass a 30-token length floor, and the
    dashboard readout is the per-source funnel (arrived → dropped-dup
    → dropped-short → kept, plus KEPT TOKENS, the number the training
    run actually consumes). Composes three certified families in one
    hash-gated pipeline: streaming ingest (x21's drain), dedup (l2's
    signature machinery), and corpus prep gates (l33's length-floor
    discipline) — the PIPE contract: stage-chained CTE oracles certify
    COMPOSITION, not just parts.

    Documents too short to shingle (<3 tokens) carry no flag and pass
    the dedup gate by definition on BOTH engines (left join +
    coalesce(false)). Scale: the STAGED x21 verdict
    (:func:`_x21_flags_staged` — the drain runs once per corpus
    version under private dirs; this entry's timing measures the
    funnel, not a re-ingest) + one corpus scan for token counts + one
    source-keyed agg."""
    from finporter_spark.operators.text import tokens

    flags = _x21_flags_staged(spark, sf_dir).select(
        "doc_id", "is_dup"
    )
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    j = d.join(flags, "doc_id", "left").select(
        "source",
        "n_tokens",
        F.coalesce(F.col("is_dup"), F.lit(False)).alias("dup"),
    )
    kept = (~F.col("dup")) & (F.col("n_tokens") >= 30)
    return j.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("dup"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup"),
        F.sum(
            F.when((~F.col("dup")) & (F.col("n_tokens") < 30), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_short"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("kept_tokens"),
    )


# public fixture surface (round-14)
x21_flags_staged = _x21_flags_staged
