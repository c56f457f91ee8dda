"""Round-12 operator tests.

- kruskal_wallis must equal a pure-Python midrank reference (exact
  formula, tie-corrected) on adversarial small samples, reduce to the
  Mann–Whitney z² identity at k = 2, and surface degenerate inputs as
  NULLs, never errors.
"""

from __future__ import annotations

import math

import pytest

from finporter_spark.queries.catalog import CATALOG


def kw_ref(arms: list[list[int]]) -> float | None:
    """Textbook tie-corrected Kruskal–Wallis H (midranks, exact)."""
    k = len(arms)
    allv = sorted(v for arm in arms for v in arm)
    n_tot = len(allv)
    if any(len(a) == 0 for a in arms) or n_tot < 2:
        return None
    ranks: dict[int, float] = {}
    tie3 = 0
    i = 0
    while i < n_tot:
        j = i
        while j < n_tot and allv[j] == allv[i]:
            j += 1
        t = j - i
        ranks[allv[i]] = (i + 1 + j) / 2.0
        tie3 += t * t * t - t
        i = j
    rsum = [sum(ranks[v] for v in arm) for arm in arms]
    n = [len(arm) for arm in arms]
    h = (
        12.0 / (n_tot * (n_tot + 1))
        * sum(rsum[g] ** 2 / n[g] for g in range(k))
        - 3.0 * (n_tot + 1)
    )
    corr = 1.0 - tie3 / float(n_tot**3 - n_tot)
    if corr == 0.0:
        return None
    return h / corr


def _run_kw(spark, arms: list[list[int]]):
    from finporter_spark.operators.stats import kruskal_wallis

    rows = [
        (int(v), g) for g, arm in enumerate(arms) for v in arm
    ]
    df = spark.createDataFrame(rows, "iv bigint, arm int")
    return kruskal_wallis(
        df, "iv", "arm", list(range(len(arms)))
    ).collect()[0]


CASES = [
    # heavy ties, unbalanced arms
    [[1, 1, 2, 3], [1, 2, 2], [3, 3, 3, 3, 1]],
    # disjoint ranges (max separation)
    [[1, 2, 3], [10, 11, 12], [100, 101]],
    # singleton arm
    [[5], [1, 2, 3, 4], [6, 7]],
    # identical arms (H = 0)
    [[1, 2, 3], [1, 2, 3], [1, 2, 3]],
    # negative values
    [[-5, -1, 0], [-3, 2, 2], [7, -5]],
]


@pytest.mark.parametrize("arms", CASES)
def test_kruskal_wallis_matches_reference(spark, arms):
    row = _run_kw(spark, arms)
    ref = kw_ref(arms)
    assert row.h == pytest.approx(round(ref, 6), abs=2e-6)
    # df = 2: survival is exactly exp(-H/2)
    assert row.p_approx == pytest.approx(
        round(min(1.0, math.exp(-ref / 2.0)), 6), abs=2e-6
    )
    for g, arm in enumerate(arms):
        assert row[f"n{g}"] == len(arm)


def test_kruskal_wallis_k2_equals_mwu_z_squared(spark):
    """With k = 2 the tie-corrected H is EXACTLY the Mann–Whitney
    normal z squared (Lehmann) — the algebraic bridge to a38/a44."""
    from finporter_spark.operators.stats import (
        kruskal_wallis,
        mann_whitney_u,
    )

    vals = [(1, 1), (2, 1), (2, 0), (3, 0), (3, 1), (7, 0), (9, 1)]
    df = spark.createDataFrame(vals, "iv bigint, a int")
    h = kruskal_wallis(df, "iv", "a", [1, 0]).collect()[0].h
    z = mann_whitney_u(df, "iv", "a").collect()[0].z
    assert h == pytest.approx(z * z, abs=2e-6)


def test_kruskal_wallis_degenerate_null_not_error(spark):
    from finporter_spark.operators.stats import kruskal_wallis

    # all-tied: zero tie-correction denominator -> NULL h and p
    df = spark.createDataFrame(
        [(5, 0), (5, 1), (5, 2)], "iv bigint, arm int"
    )
    row = kruskal_wallis(df, "iv", "arm", [0, 1, 2]).collect()[0]
    assert row.h is None and row.p_approx is None
    # empty arm (label 2 never appears) -> NULL, counts still exact
    df2 = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "iv bigint, arm int"
    )
    row2 = kruskal_wallis(df2, "iv", "arm", [0, 1, 2]).collect()[0]
    assert row2.h is None
    assert (row2.n0, row2.n1, row2.n2) == (2, 1, 0)


def test_kruskal_wallis_domain_guard(spark):
    from finporter_spark.operators.stats import kruskal_wallis

    df = spark.range(0, 500).selectExpr(
        "id AS iv", "CAST(id % 3 AS INT) AS arm"
    )
    with pytest.raises(ValueError, match="kruskal_wallis"):
        kruskal_wallis(df, "iv", "arm", [0, 1, 2], max_domain=100)


def test_a46_catalog_entry_runs(spark, sf_dir):
    row = CATALOG["a46_kruskal_wallis"][0](spark, sf_dir).collect()[0]
    assert row.n0 > 0 and row.n1 > 0 and row.n2 > 0
    assert row.h is not None and 0.0 <= row.p_approx <= 1.0
