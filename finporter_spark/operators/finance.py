"""Set-based FIFO lot relief on the cumulative-quantity axis.

The reference's transaction entity carries realized-gain fields
(MTransaction.realizedGainShort/Long) that its row-at-a-time ecosystem
fills lot by lot. The set-based reformulation: per (account, security),
buy lot j covers the half-open interval [CB_{j-1}, CB_j) of the
cumulative BOUGHT-quantity axis and sell s consumes [CS_{s-1}, CS_s) of
the cumulative SOLD-quantity axis; when the ledger is FEASIBLE
(cumulative sells never exceed cumulative buys at any prefix), FIFO
matching IS interval intersection on that shared axis, and each
(sell, lot) match contributes overlap × (sell price − lot basis).

The naive execution is an equi-join on the instrument key with a range
residual — candidate pairs per key = buys × sells per key, quadratic on
a hot instrument (10⁵ lots → 10¹⁰ candidates in one key's sort-merge
buffer). :func:`fifo_lot_gains` instead applies the fixed-width grid
decomposition (the j8 interval-join trick) to the QUANTITY axis: each
interval replicates to the ``cell``-width cells it spans (fan-out
= interval length / cell + 1, ~2 when ``cell`` ≈ the max lot size),
candidates pair only within (key, cell), the exact overlap predicate
filters residually, and each true pair is counted once — in the first
cell both intervals occupy. Work scales with TRUE overlaps (each sell
overlaps ~qty/avg-lot lots), never buys × sells; a 10⁵-lot single
instrument runs in cell-local tasks (property-tested).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def fifo_lot_gains(
    txns: DataFrame,
    keys: Sequence[str],
    sell_ids: Sequence[str],
    order_by: Sequence[str],
    cell: float = 64.0,
) -> DataFrame:
    """FIFO realized gains per sell, set-based and fan-out-bounded.

    ``txns`` columns: ``*keys`` (instrument identity), ``action``
    ('BUY'/'SELL'), ``qty`` (positive), ``price``, ``*order_by`` (the
    ledger order within a key — must be a total order for determinism;
    full duplicates are interchangeable), ``*sell_ids`` (the sell's
    output identity). Returns one row per SELL transaction:
    ``*keys, *sell_ids, matched_qty, realized_gain`` (unrounded doubles;
    a sell nothing covers — infeasible ledger — reports 0.0/0.0, the
    same left-join convention as the naive formulation).

    ``cell`` is the quantity-grid width: pick ≈ the max single-lot
    quantity so each interval spans ≤ 2 cells.

    Correctness assumes a FEASIBLE ledger (cumulative sells never
    exceed cumulative buys at any prefix in ``order_by`` order); on an
    infeasible prefix a sell can match a LATER buy with no signal.
    Callers that cannot assume feasibility run
    :func:`fifo_feasibility_violations` first (same window shape,
    linear) and quarantine or assert on the violating keys.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("qty").over(w)

    def ranged(df):
        return df.withColumn("hi", cum).withColumn(
            "lo", F.col("hi") - F.col("qty")
        )

    def gridded(df):
        first = F.floor(F.col("lo") / cell).cast("long")
        last = F.floor(F.col("hi") / cell).cast("long")
        return df.withColumn("_first", first).withColumn(
            "_cell", F.explode(F.sequence(first, last))
        )

    keys = list(keys)
    sell_ids = list(sell_ids)
    buys = ranged(txns.filter(F.col("action") == "BUY")).select(
        *keys, "price", "lo", "hi"
    )
    sells = ranged(txns.filter(F.col("action") == "SELL")).select(
        *keys, *sell_ids, "price", "lo", "hi"
    )
    bg, sg = gridded(buys).alias("b"), gridded(sells).alias("s")
    overlap = (F.col("b.lo") < F.col("s.hi")) & (
        F.col("s.lo") < F.col("b.hi")
    )
    first_shared = F.col("_cell") == F.greatest(
        F.col("b._first"), F.col("s._first")
    )
    matched = F.least(F.col("b.hi"), F.col("s.hi")) - F.greatest(
        F.col("b.lo"), F.col("s.lo")
    )
    gain = matched * (F.col("s.price") - F.col("b.price"))
    per_sell = (
        sg.join(bg, keys + ["_cell"])
        .filter(overlap & first_shared)
        .groupBy(*keys, *[F.col(f"s.{c}").alias(c) for c in sell_ids])
        .agg(
            F.sum(matched).alias("_mq"),
            F.sum(gain).alias("_rg"),
        )
    )
    # left join back onto the full sell set: a sell with no covering lot
    # still reports a row (0.0 / 0.0), matching the naive left join.
    # distinct(): full-duplicate sells (same key + sell_ids) merge into
    # one output row, the same assignment-invariant convention as the
    # naive groupBy formulation
    return (
        sells.select(*keys, *sell_ids)
        .distinct()
        .join(per_sell, keys + sell_ids, "left")
        .select(
            *keys,
            *sell_ids,
            F.coalesce(F.col("_mq"), F.lit(0.0)).alias("matched_qty"),
            F.coalesce(F.col("_rg"), F.lit(0.0)).alias("realized_gain"),
        )
    )


def fifo_feasibility_violations(
    txns: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Keys whose ledger violates the FEASIBILITY contract
    :func:`fifo_lot_gains` depends on (documented there): at some
    prefix of the ledger order, cumulative sold quantity exceeds
    cumulative bought. On such a prefix a sell interval can match a buy
    that occurs LATER in ledger time, producing nonzero gains instead
    of the 0.0 convention — silently, since the matcher has no ordering
    guard. Callers that cannot assume feasibility (e.g. ingesting
    third-party ledgers) run this check first and quarantine or assert.

    One window per key over the ledger order (same shuffle shape as the
    matcher's cumulative sums — linear, no pairs). Returns one row per
    violating key: ``*keys, max_oversell`` (the worst prefix excess,
    > 0) — empty means feasible.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    signed = F.when(F.col("action") == "SELL", F.col("qty")).otherwise(
        -F.col("qty")
    )
    return (
        txns.withColumn("_net_sold", F.sum(signed).over(w))
        .groupBy(*keys)
        .agg(F.max("_net_sold").alias("max_oversell"))
        .filter(F.col("max_oversell") > 0)
    )
