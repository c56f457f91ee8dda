"""Time-series smoothing primitives (engine extension; the reference's
finance domain implies these but its row-at-a-time engine cannot
express them — SURVEY §2B-ext W11/PIPE5)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def ewma_closed_form(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str | Column],
    value_col: str,
    alpha: float,
    out_name: str = "ewma",
) -> DataFrame:
    """Exact EWMA (seed y_1 = x_1; y_i = αx_i + (1-α)y_{i-1}) as pure
    window primitives — JVM-side, no sequential UDF.

    Derivation: with S_i = Σ_{j≤i} x_j (1-α)^{-j} (one ordered running
    sum), y_i = (1-α)^{i-1} x_1 + α (1-α)^i (S_i - x_1/(1-α)).

    NUMERIC CONTRACT: the (1-α)^{-i} weights grow with the partition's
    row count, so the CALLER must bound rows per partition far below
    log(DBL_MAX)/log(1/(1-α)) (α=0.2 → ~3500 rows; α=0.3 → ~2000).
    Bound it with a calendar key in ``partition_cols`` (a year for
    daily series, a day for intra-day bars); terms older than the
    partition carry < 1e-15 relative weight at those lengths, so the
    reset is numerically invisible beyond a short warm-up. Exponent
    underflow of very old in-partition terms is harmless (they vanish
    from S_i exactly as they vanish from y_i).
    """
    r = 1.0 - alpha
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged = df.withColumn("_ewma_i", F.row_number().over(w)).withColumn(
        "_ewma_c1", F.first(value_col).over(wf)
    )
    staged = staged.withColumn(
        "_ewma_s",
        F.sum(
            F.col(value_col) * F.pow(F.lit(1.0 / r), F.col("_ewma_i"))
        ).over(wf),
    )
    y = (
        F.pow(F.lit(r), F.col("_ewma_i") - 1) * F.col("_ewma_c1")
        + F.lit(alpha)
        * F.pow(F.lit(r), F.col("_ewma_i"))
        * (F.col("_ewma_s") - F.col("_ewma_c1") / F.lit(r))
    )
    return staged.withColumn(out_name, y).drop(
        "_ewma_i", "_ewma_c1", "_ewma_s"
    )
