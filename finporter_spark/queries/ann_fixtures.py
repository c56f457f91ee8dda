"""Shared ANN fixture layer — planted-cluster and Zipf corpora, dial
constants, and the DuckDB Lloyd/PQ oracle builders (round-14 verdict
#8: this layer used to live spread across catalog_ext/catalog_r10/
catalog_r12/catalog_r13 and every later catalog file reached into the
earlier ones' underscore privates; it now lives HERE and catalog files
depend on this module instead of on each other).

Names keep their historical leading underscores to avoid a 60-site
rename — within this module they ARE the public fixture surface; the
original catalog modules re-export them for external compatibility
(tests, tools).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from finporter_spark.queries.catalog import _t
from finporter_spark.queries.staging import (
    io_dir as _io_dir,
    stage_once as _stage_once,
    src_fp as _src_fp,
)

def _ivf_dist_cte(src_c: str, d_name: str, a_name: str) -> str:
    """One unrolled Lloyd assignment round (the l22 oracle pattern):
    6 dp-rounded squared distances + lowest-index-tie argmin, mirroring
    operators.similarity.kmeans_assign."""
    return f"""
    {d_name} AS (SELECT e.vec_id, c.cid,
              ROUND(list_sum(list_transform(list_zip(e.emb, c.cen),
                    z -> (z[1] - z[2])*(z[1] - z[2]))), 6) AS d
       FROM e CROSS JOIN {src_c} c),
    {a_name} AS (SELECT vec_id, cid FROM (
         SELECT vec_id, cid,
                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid)
                  AS rk
         FROM {d_name}) WHERE rk = 1)"""


def _ivf_mean_cte(a_name: str, prev_c: str, m_name: str, c_name: str) -> str:
    """One centroid-update round: per-(cluster, dim) mean rounded to
    6 dp (matching kmeans_fit); empty clusters keep their previous
    centroid."""
    return f"""
    {m_name} AS (SELECT {a_name}.cid, g.i, ROUND(AVG(e.emb[g.i]), 6) AS v
       FROM {a_name} JOIN e USING (vec_id)
            CROSS JOIN generate_series(1, 64) AS g(i)
       GROUP BY {a_name}.cid, g.i),
    {c_name} AS (SELECT {prev_c}.cid, COALESCE(mm.cen, {prev_c}.cen) AS cen
       FROM {prev_c} LEFT JOIN (SELECT cid, array_agg(v ORDER BY i) AS cen
                          FROM {m_name} GROUP BY cid) mm USING (cid))"""




_PQ_M = 4       # subspaces
_PQ_K = 16      # centroids per subspace
_PQ_SUB = 16    # dims per subspace (4 x 16 = the 64-dim space)
_PQ_TOPK = 10
_PQ_QMOD = 101
# The query WORKLOAD is fixed-size by contract (the ANN-benchmark
# shape): vec_id % 101 == 0 AND vec_id < 101*50 — at most 50 queries at
# ANY corpus size. Round-10 decade sweep caught the unbounded form
# (every 101st vector) going 21x super-linear at sf10: Q scaled with N
# and the ADC scan became QxN quadratic (2.5e9 pairs, 220 s). A
# corpus-scaled query set is a batch self-join workload, not ANN.
_PQ_QMAX = _PQ_QMOD * 50


def _pq_sub_ctes(i: int) -> str:
    """Unrolled deterministic k-means for subspace ``i`` (the l22 CTE
    pattern, applied to the slice): init = slices of the k smallest
    vec_ids, two assign/update rounds, final assignment = the code."""
    lo = i * _PQ_SUB

    def dist(src_c: str, d: str, a: str) -> str:
        return f"""
    {d} AS (SELECT s.vec_id, c.cid,
              ROUND(list_sum(list_transform(list_zip(s.s, c.cen),
                    z -> (z[1] - z[2])*(z[1] - z[2]))), 6) AS d
       FROM s{i} s CROSS JOIN {src_c} c),
    {a} AS (SELECT vec_id, cid, d FROM (
         SELECT vec_id, cid, d,
                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
         FROM {d}) WHERE rk = 1)"""

    def mean(a: str, prev_c: str, mname: str, cname: str) -> str:
        return f"""
    {mname} AS (SELECT {a}.cid, g.i, ROUND(AVG(s.s[g.i]), 6) AS v
       FROM {a} JOIN s{i} s USING (vec_id)
            CROSS JOIN generate_series(1, {_PQ_SUB}) AS g(i)
       GROUP BY {a}.cid, g.i),
    {cname} AS (SELECT {prev_c}.cid, COALESCE(mm.cen, {prev_c}.cen) AS cen
       FROM {prev_c} LEFT JOIN (SELECT cid, array_agg(v ORDER BY i) AS cen
                          FROM {mname} GROUP BY cid) mm USING (cid))"""

    return f"""
    s{i} AS (SELECT vec_id, emb[{lo + 1}:{lo + _PQ_SUB}] AS s FROM e),
    c0_{i} AS (SELECT CAST(vec_id AS INT) AS cid,
                  list_transform(s, x -> ROUND(x, 6)) AS cen
           FROM s{i} WHERE vec_id < {_PQ_K}),
    {dist(f'c0_{i}', f'd1_{i}', f'a1_{i}')},
    {mean(f'a1_{i}', f'c0_{i}', f'm1_{i}', f'c1_{i}')},
    {dist(f'c1_{i}', f'd2_{i}', f'a2_{i}')},
    {mean(f'a2_{i}', f'c1_{i}', f'm2_{i}', f'c2_{i}')},
    {dist(f'c2_{i}', f'd3_{i}', f'a3_{i}')},
    lut_{i} AS (SELECT q.vec_id AS query_id, c.cid,
              ROUND(list_sum(list_transform(
                    list_zip(q.emb[{lo + 1}:{lo + _PQ_SUB}], c.cen),
                    z -> (z[1] - z[2])*(z[1] - z[2]))), 6) AS d
       FROM e q CROSS JOIN c2_{i} c
       WHERE q.vec_id % {_PQ_QMOD} = 0 AND q.vec_id < {_PQ_QMAX})"""




def _pq_books(spark, sf_dir, emb):
    """Codebooks as cached dataset state (ingest-time cost, the IVF
    centroid contract) — trained once per corpus, shared by l45/l45b."""
    from finporter_spark.operators.similarity import load_or_train_pq_books
    from finporter_spark.queries.staging import (
        io_dir as _io_dir,
        src_fp as _src_fp,
    )

    return load_or_train_pq_books(
        emb, "vec_id", "embedding", m=_PQ_M, k=_PQ_K, iters=2,
        cache_path=_io_dir(
            sf_dir, f"l45_pq_books_m{_PQ_M}_k{_PQ_K}_i2"
        ),
        fingerprint=_src_fp(sf_dir, "embeddings"),
    )




from finporter_spark.operators.similarity import ivfadc_params

_L46_REF_N = 2000    # struct-sf0.1 corpus rows (the pinned density)
_L46_DIAL = ivfadc_params(_L46_REF_N, 64)
_L46_K = _L46_DIAL["k_coarse"]       # 64 (== planted-cluster count)
_L46_ITERS = 3
_L46_NPROBE = _L46_DIAL["n_probe"]   # 6
_L46_SHORT = _L46_DIAL["shortlist"]  # 200 (recall 0.855 at sf0.1)
_L46B_SHORT = 50     # residual-PQ budget (recall 0.785 vs plain 0.615)
_L46_CLUSTERS = 64
_L46_SCALE = 150     # center amplitude, per-mille
# the l46/l46b oracles unroll catalog_r10's _PQ_M (=4) subspace
# trainings — fail LOUDLY at import if the rule ever disagrees with
# the oracle construction instead of hash-diffing later
if _L46_DIAL["m"] != 4:
    raise RuntimeError(
        f"l46 oracle unrolls m=4 subspaces but ivfadc_params sizes "
        f"m={_L46_DIAL['m']} at the reference density — regenerate "
        "the oracle CTEs to match the rule"
    )

# the planted-center table CTE, shared by the struct AND zipf corpus
# oracles (catalog_r13 reuses it with a skewed cluster draw)
_CL_CTE = f"""
    cl AS (SELECT c.c AS cid,
                  list((CAST('0x' || substr(md5('cl' || CAST(c.c AS VARCHAR)
                         || '_' || CAST(d.d AS VARCHAR)), 1, 8) AS BIGINT)
                        % {2 * _L46_SCALE + 1} - {_L46_SCALE}) / 1000.0
                       ORDER BY d.d) AS cen
           FROM generate_series(0, {_L46_CLUSTERS - 1}) c(c)
           CROSS JOIN generate_series(0, 63) d(d)
           GROUP BY c.c)"""

# center table + structured-embedding CTEs, shared by both l46 oracles
# (DuckDB mirror of _staged_structured_embeddings)
_STRUCT_E = f"""{_CL_CTE},
    e AS MATERIALIZED (SELECT r.vec_id,
                 list_transform(list_zip(CAST(r.embedding AS DOUBLE[]),
                                         cl.cen),
                                z -> ROUND(z[1] + z[2], 6)) AS emb
          FROM embeddings r
          JOIN cl ON cl.cid = CAST(r.vec_id % {_L46_CLUSTERS} AS INT))"""


def _struct_centroid_rows():
    """Driver-side mirror of the oracle's ``cl`` CTE: hashlib md5 ==
    SQL md5, so both engines derive the identical center table."""
    import hashlib

    return [
        (
            c,
            [
                (
                    int(
                        hashlib.md5(f"cl{c}_{d}".encode()).hexdigest()[:8],
                        16,
                    )
                    % (2 * _L46_SCALE + 1)
                    - _L46_SCALE
                )
                / 1000.0
                for d in range(64)
            ],
        )
        for c in range(_L46_CLUSTERS)
    ]


def _emb_fingerprint(sf_dir):
    """Source stamp for the l46 quantizer/codebook/codes caches. Those
    caches are derived from the STAGED structured corpus, whose
    identity is (embeddings parquet) × (planted-cluster recipe) — so
    the stamp folds the recipe tag in: a testdata regeneration AND a
    recipe bump (_L46_CLUSTERS/_L46_SCALE/version) each invalidate the
    derived caches, not just the staged parquet they feed from."""
    import os

    from finporter_spark.operators.scale import source_fingerprint

    return (
        source_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
        + f"|planted{_L46_CLUSTERS}-s{_L46_SCALE}-v1"
    )


def _staged_structured_embeddings(spark, sf_dir):
    """The planted-cluster corpus as staged dataset state (vec_id,
    embedding array<double>), once per testdata version."""
    from finporter_spark.queries.staging import stage_once as _stage_once

    def _write(p):
        cdf = spark.createDataFrame(
            _struct_centroid_rows(), "cid int, cen array<double>"
        )
        emb = _t(spark, sf_dir, "embeddings").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "_e"
            ),
            (F.col("vec_id") % _L46_CLUSTERS).cast("int").alias("cid"),
        )
        (
            emb.join(F.broadcast(cdf), "cid")
            .select(
                "vec_id",
                F.zip_with(
                    "_e", "cen", lambda x, c: F.round(x + c, 6)
                ).alias("embedding"),
            )
            .repartition(8)
            .write.mode("overwrite")
            .parquet(p)
        )

    path = _stage_once(
        sf_dir, "struct_emb", _write, "embeddings",
        extra_fingerprint=f"planted{_L46_CLUSTERS}-s{_L46_SCALE}-v1",
    )
    return spark.read.parquet(path)


def _l46_oracle(corpus_cte: str | None = None) -> str:
    """Plain IVFADC on a planted-cluster corpus: the l45c composition
    (coarse Lloyd unroll + per-subspace PQ unrolls + probe/ADC/rerank)
    with the given corpus CTE as ``e`` (default: the balanced
    structured corpus; catalog_r13's l47 passes the Zipf-skewed one)
    and k_coarse=64."""

    if corpus_cte is None:
        corpus_cte = _STRUCT_E
    ivf_rounds = []
    prev = "c0"
    for r in range(1, _L46_ITERS + 1):
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
    lut_joins = " ".join(
        f"JOIN lut_{i} l{i} ON l{i}.cid = codes.c{i}"
        f" AND l{i}.query_id = qp.query_id"
        for i in range(_PQ_M)
    )
    ad = " + ".join(f"l{i}.d" for i in range(_PQ_M))
    return f"""
    WITH {corpus_cte},
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
    codes AS (SELECT a3_0.vec_id, {code_cols} {code_joins}),
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
      FROM score) WHERE rk <= {_L46_SHORT}),
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




def _res_pq_sub_ctes(i: int) -> str:
    """Per-subspace PQ Lloyd unroll over the RESIDUAL table ``r``
    (catalog_r10's ``_pq_sub_ctes`` with r as the training corpus and
    NO per-query lut — residual LUTs are per-(query, cell), generated
    separately)."""
    sub = 16
    lo = i * sub

    def dist(src_c: str, d: str, a: str) -> str:
        return f"""
    {d} AS (SELECT s.vec_id, c.cid,
              ROUND(list_sum(list_transform(list_zip(s.s, c.cen),
                    z -> (z[1] - z[2])*(z[1] - z[2]))), 6) AS d
       FROM rs{i} s CROSS JOIN {src_c} c),
    {a} AS (SELECT vec_id, cid, d FROM (
         SELECT vec_id, cid, d,
                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
         FROM {d}) WHERE rk = 1)"""

    def mean(a: str, prev_c: str, mname: str, cname: str) -> str:
        return f"""
    {mname} AS (SELECT {a}.cid, g.i, ROUND(AVG(s.s[g.i]), 6) AS v
       FROM {a} JOIN rs{i} s USING (vec_id)
            CROSS JOIN generate_series(1, {sub}) AS g(i)
       GROUP BY {a}.cid, g.i),
    {cname} AS (SELECT {prev_c}.cid, COALESCE(mm.cen, {prev_c}.cen) AS cen
       FROM {prev_c} LEFT JOIN (SELECT cid, array_agg(v ORDER BY i) AS cen
                          FROM {mname} GROUP BY cid) mm USING (cid))"""

    return f"""
    rs{i} AS (SELECT vec_id, emb[{lo + 1}:{lo + sub}] AS s FROM r),
    rc0_{i} AS (SELECT CAST(vec_id AS INT) AS cid,
                  list_transform(s, x -> ROUND(x, 6)) AS cen
           FROM rs{i} WHERE vec_id < 16),
    {dist(f'rc0_{i}', f'rd1_{i}', f'ra1_{i}')},
    {mean(f'ra1_{i}', f'rc0_{i}', f'rm1_{i}', f'rc1_{i}')},
    {dist(f'rc1_{i}', f'rd2_{i}', f'ra2_{i}')},
    {mean(f'ra2_{i}', f'rc1_{i}', f'rm2_{i}', f'rc2_{i}')},
    {dist(f'rc2_{i}', f'rd3_{i}', f'ra3_{i}')}"""


def _l46b_oracle(
    corpus_cte: str | None = None,
    k_sql: str | None = None,
    shortlist: int | None = None,
) -> str:
    """Residual IVFADC: coarse Lloyd (k=64), residual table
    r = e − centroid[cell], per-subspace PQ Lloyd unrolls ON r,
    per-(query, probed cell) residual LUTs, ADC over residual codes,
    exact rerank on the structured vectors.

    Parameterized for reuse (the _l46_oracle contract): ``corpus_cte``
    swaps the corpus (catalog_r14's l49 passes the Zipf CTE + a
    corpus-sized ``kk`` dial CTE), ``k_sql`` the coarse seeding bound
    (a literal or a scalar subquery over ``kk``), ``shortlist`` the
    re-rank budget. Defaults reproduce the l46b text exactly."""

    if corpus_cte is None:
        corpus_cte = _STRUCT_E
    if k_sql is None:
        k_sql = str(_L46_K)
    if shortlist is None:
        shortlist = _L46B_SHORT
    ivf_rounds = []
    prev = "c0"
    for rr in range(1, _L46_ITERS + 1):
        ivf_rounds.append(_ivf_dist_cte(prev, f"d{rr}", f"a{rr}"))
        ivf_rounds.append(_ivf_mean_cte(f"a{rr}", prev, f"m{rr}", f"c{rr}"))
        prev = f"c{rr}"
    ivf = ",".join(ivf_rounds)
    subs = ",".join(_res_pq_sub_ctes(i) for i in range(_PQ_M))
    sub = 16
    rluts = ",".join(
        f"""
    rlut_{i} AS (SELECT qp.query_id, qp.cid AS cell, b.cid AS code,
              ROUND(list_sum(list_transform(list_zip(
                    list_transform(list_zip(
                        q.emb[{i * sub + 1}:{i * sub + sub}],
                        cc.cen[{i * sub + 1}:{i * sub + sub}]),
                      z -> z[1] - z[2]),
                    b.cen),
                    z -> (z[1] - z[2])*(z[1] - z[2]))), 6) AS d
       FROM qp
       JOIN e q ON q.vec_id = qp.query_id
       JOIN cfm cc ON cc.cid = qp.cid
       CROSS JOIN rc2_{i} b)"""
        for i in range(_PQ_M)
    )
    code_joins = " ".join(
        f"JOIN ra3_{i} USING (vec_id)" if i else "FROM ra3_0"
        for i in range(_PQ_M)
    )
    code_cols = ", ".join(f"ra3_{i}.cid AS c{i}" for i in range(_PQ_M))
    lut_joins = " ".join(
        f"JOIN rlut_{i} l{i} ON l{i}.code = codes.c{i}"
        f" AND l{i}.query_id = qp.query_id AND l{i}.cell = qp.cid"
        for i in range(_PQ_M)
    )
    ad = " + ".join(f"l{i}.d" for i in range(_PQ_M))
    return f"""
    WITH {corpus_cte},
    c0 AS (SELECT CAST(vec_id AS INT) AS cid,
                  list_transform(emb, x -> ROUND(x, 6)) AS cen
           FROM e WHERE vec_id < {k_sql}),
    {ivf},
    {_ivf_dist_cte(prev, 'df', 'af')},
    afm AS MATERIALIZED (SELECT * FROM af),
    cfm AS MATERIALIZED (SELECT * FROM {prev}),
    r AS MATERIALIZED (SELECT e.vec_id,
                 list_transform(list_zip(e.emb, cc.cen),
                                z -> z[1] - z[2]) AS emb
          FROM e JOIN afm ON afm.vec_id = e.vec_id
          JOIN cfm cc ON cc.cid = afm.cid),
    qp AS MATERIALIZED (SELECT vec_id AS query_id, cid FROM (
         SELECT vec_id, cid,
                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid)
                  AS rk
         FROM df WHERE vec_id % {_PQ_QMOD} = 0 AND vec_id < {_PQ_QMAX})
       WHERE rk <= {_L46_NPROBE}),
    {subs},
    {rluts},
    codes AS (SELECT ra3_0.vec_id, {code_cols} {code_joins}),
    score AS (SELECT qp.query_id, codes.vec_id AS cand_id,
                     ROUND({ad}, 6) AS adist
              FROM codes
              JOIN afm ON afm.vec_id = codes.vec_id
              JOIN qp ON qp.cid = afm.cid
              {lut_joins}),
    short AS (SELECT query_id, cand_id FROM (
      SELECT query_id, cand_id,
             row_number() OVER (
               PARTITION BY query_id ORDER BY adist, cand_id) AS rk
      FROM score) WHERE rk <= {shortlist}),
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




_ZIPF_RES = 1_000_000  # draw resolution (md5 % RES against int bounds)


def _zipf_bounds() -> list[tuple[int, int, int]]:
    """Integer threshold table [(cid, lo, hi)): cluster c owns the
    draws u ∈ [lo, hi) with width ∝ 1/(c+1) (Zipf s=1 — hottest
    cluster ≈ 21% of the corpus at 64 clusters, a real hot cell).
    Computed ONCE here in Python and inlined as integer LITERALS into
    both engines' assignment, so no cross-engine float arithmetic
    exists anywhere in the draw."""
    w = [1.0 / (c + 1) for c in range(_L46_CLUSTERS)]
    tot = sum(w)
    bounds, acc, lo = [], 0.0, 0
    for c in range(_L46_CLUSTERS):
        acc += w[c]
        hi = (
            _ZIPF_RES
            if c == _L46_CLUSTERS - 1
            else int(math.floor(_ZIPF_RES * acc / tot))
        )
        bounds.append((c, lo, hi))
        lo = hi
    return bounds


# md5-deterministic draw, identical text both engines mirror:
# u = int(md5('zc' || vec_id)[:8], 16) % RES, cluster = the bounds row
_ZIPF_U_SQL = (
    "(CAST('0x' || substr(md5('zc' || CAST(r.vec_id AS VARCHAR)), 1, 8)"
    f" AS BIGINT) % {_ZIPF_RES})"
)

_ZIPF_E = f"""{_CL_CTE},
    zt(zcid, lo, hi) AS (VALUES {", ".join(f"({c}, {lo}, {hi})" for c, lo, hi in _zipf_bounds())}),
    e AS MATERIALIZED (SELECT r.vec_id,
                 list_transform(list_zip(CAST(r.embedding AS DOUBLE[]),
                                         cl.cen),
                                z -> ROUND(z[1] + z[2], 6)) AS emb
          FROM embeddings r
          JOIN zt ON {_ZIPF_U_SQL} >= zt.lo AND {_ZIPF_U_SQL} < zt.hi
          JOIN cl ON cl.cid = zt.zcid)"""


def _zipf_fingerprint(sf_dir):
    """Source stamp for the l47 caches: embeddings parquet identity ×
    the Zipf recipe (clusters, amplitude, thresholds version)."""
    import os

    from finporter_spark.operators.scale import source_fingerprint

    return (
        source_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
        + f"|zipf{_L46_CLUSTERS}-s{_L46_SCALE}-r{_ZIPF_RES}-v1"
    )


def _staged_zipf_embeddings(spark, sf_dir):
    """The Zipf-populated planted-cluster corpus as staged dataset
    state (vec_id, embedding array<double>) — same centers as the
    balanced struct fixture, cluster membership drawn against the
    Zipf(1) thresholds."""
    from finporter_spark.queries.staging import stage_once as _stage_once

    def _write(p):
        cdf = spark.createDataFrame(
            _struct_centroid_rows(), "cid int, cen array<double>"
        )
        bdf = spark.createDataFrame(
            _zipf_bounds(), "zcid int, lo bigint, hi bigint"
        )
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("zc"), F.col("vec_id").cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _ZIPF_RES
        )
        emb = _t(spark, sf_dir, "embeddings").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "_e"
            ),
            u.alias("_u"),
        )
        (
            emb.join(
                F.broadcast(bdf),
                (F.col("_u") >= F.col("lo")) & (F.col("_u") < F.col("hi")),
            )
            .join(F.broadcast(cdf), F.col("cid") == F.col("zcid"))
            .select(
                "vec_id",
                F.zip_with(
                    "_e", "cen", lambda x, c: F.round(x + c, 6)
                ).alias("embedding"),
            )
            .repartition(8)
            .write.mode("overwrite")
            .parquet(p)
        )

    path = _stage_once(
        sf_dir, "zipf_emb", _write, "embeddings",
        extra_fingerprint=(
            f"zipf{_L46_CLUSTERS}-s{_L46_SCALE}-r{_ZIPF_RES}-v1"
        ),
    )
    return spark.read.parquet(path)



