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


def ewma_unbounded(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str | Column],
    value_col: str,
    alpha: float,
    epoch_rows: int = 512,
    out_name: str = "ewma",
) -> DataFrame:
    """Exact EWMA over UNBOUNDED per-key history — the scale path when
    no calendar key can bound the series (``ewma_closed_form``'s
    (1-α)^{-i} weights overflow past ~log(DBL_MAX)/log(1/(1-α)) rows).

    Decomposition: split each key's ordered series into fixed
    ``epoch_rows`` epochs. Within an epoch the closed form applies with
    exponents ≤ epoch_rows (never overflows); across epochs the exact
    recursion y_end(e) = (1-α)^{n_e}·y_end(e-1) + B_e runs over the
    EPOCH SUMMARIES — a table with rows/key = history/epoch_rows, tiny
    relative to the data — inside one ``applyInPandas`` per key. The
    carry joins back on (key, epoch) and each row finishes with
    y = (1-α)^k·carry + α(1-α)^k·S_k (one local window). So: two keyed
    window shuffles + one vanishing-size grouped pass + one keyed join;
    state per task = one epoch, exact to the sequential recursion at
    any length (test: 5,000-row series where the plain closed form is
    inf/NaN).
    """
    import pandas as pd

    r = 1.0 - alpha
    pcols = list(partition_cols)
    w = Window.partitionBy(*pcols).orderBy(*order_cols)
    staged = df.withColumn("_g", F.row_number().over(w))
    staged = staged.withColumn(
        "_epoch", ((F.col("_g") - 1) / epoch_rows).cast("long")
    ).withColumn("_k", (F.col("_g") - 1) % epoch_rows + 1)
    wl = Window.partitionBy(*pcols, "_epoch").orderBy(*order_cols)
    wlf = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # S_k = Σ_{j≤k} x_j (1-α)^{-j} with j the LOCAL index (≤ epoch_rows)
    staged = staged.withColumn(
        "_s",
        F.sum(
            F.col(value_col) * F.pow(F.lit(1.0 / r), F.col("_k"))
        ).over(wlf),
    ).withColumn("_c1", F.first(value_col).over(wlf))

    # per-epoch summary: row count n_e and the end-of-epoch local term
    summaries = staged.groupBy(*pcols, "_epoch").agg(
        F.count("*").alias("_n"),
        F.max(F.struct("_k", "_s")).getField("_s").alias("_t"),
        F.min("_c1").alias("_c1e"),
    )

    # carry table schema: partition cols keep their input types
    ftypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    carry_schema = ", ".join(
        f"`{c}` {ftypes[c]}" for c in pcols
    ) + ", _epoch long, _carry double"

    def _carries(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_epoch")
        out, y = [], 0.0
        for e, n, t, c1 in zip(
            pdf["_epoch"], pdf["_n"], pdf["_t"], pdf["_c1e"]
        ):
            out.append(y)  # carry INTO epoch e
            n = int(n)
            if e == 0:
                # seed epoch: y_1 = x_1
                y = r ** (n - 1) * c1 + alpha * r**n * (t - c1 / r)
            else:
                y = (r**n) * y + alpha * (r**n) * t
        res = pdf[pcols + ["_epoch"]].copy()
        res["_carry"] = out
        return res

    carries = summaries.groupBy(*pcols).applyInPandas(
        _carries,
        schema=carry_schema,
    )
    joined = staged.join(carries, pcols + ["_epoch"])
    k, s, c1 = F.col("_k"), F.col("_s"), F.col("_c1")
    y_seed = (
        F.pow(F.lit(r), k - 1) * c1
        + F.lit(alpha) * F.pow(F.lit(r), k) * (s - c1 / F.lit(r))
    )
    y_carry = F.pow(F.lit(r), k) * F.col("_carry") + F.lit(
        alpha
    ) * F.pow(F.lit(r), k) * s
    return joined.withColumn(
        out_name, F.when(F.col("_epoch") == 0, y_seed).otherwise(y_carry)
    ).drop("_g", "_epoch", "_k", "_s", "_c1", "_carry")
