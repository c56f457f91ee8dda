"""Custom join compositions Spark lacks as single operators (SURVEY §2B J5/J6).

Both are pure DataFrame compositions — Catalyst plans them with standard
join strategies; no UDFs, no collect.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    how: str = "inner",
) -> DataFrame:
    """Theta/range join (J5): join on an arbitrary boolean expression.

    Scale note: a pure inequality join is a broadcast-nested-loop when one
    side is small (Catalyst picks this automatically under the broadcast
    threshold). For two LARGE sides, pre-bucket the range key into coarse
    bins on both sides and add an equi-condition on the bin to convert the
    BNLJ into a hash join with a residual filter — the standard interval
    banding trick.
    """
    return left.join(right, on=condition, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    tolerance: Column | None = None,
    direction: str = "backward",
    tiebreakers: Sequence[str] = (),
    left_id: Sequence[str] | None = None,
) -> DataFrame:
    """As-of join (J6): for each left row, the single latest right row with
    ``right_ts <= left_ts`` (direction='backward'; 'forward' mirrors).

    Classic use: latest security price ≤ transaction date
    (FIXTURES.md security.updatedAt is the reference-shaped fixture).

    Implementation: equi-join on the keys + range predicate, then keep
    rank-1 per left row via a window ordered by ``right_ts`` desc (plus
    explicit ``tiebreakers`` so the pick is deterministic when timestamps
    collide). Left rows with no match survive with nulls (left join).

    Scale notes: the equi-keys shuffle both sides once; the window
    repartitions by the left row id. For 100 TB with a small right side,
    Catalyst broadcast-converts the join and only one shuffle (the window)
    remains. With a known time horizon, pass ``tolerance`` (e.g.
    ``F.expr("INTERVAL 7 DAYS")``) to bound the match fan-out before the
    rank filter — this is what keeps the intermediate bounded on dense
    right-hand timelines.
    """
    lid = list(left_id) if left_id else None
    if lid is None:
        left = left.withColumn("_asof_lid", F.monotonically_increasing_id())
        lid = ["_asof_lid"]

    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    if direction == "backward":
        cond = rts <= lts
        order = [rts.desc()]
        if tolerance is not None:
            cond = cond & (rts >= lts - tolerance)
    elif direction == "forward":
        cond = rts >= lts
        order = [rts.asc()]
        if tolerance is not None:
            cond = cond & (rts <= lts + tolerance)
    else:
        raise ValueError(f"bad direction: {direction}")

    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))

    rsel = right_cols if right_cols is not None else [
        c for c in right.columns if c not in on
    ]
    joined = left.alias("l").join(right.alias("r"), on=cond, how="left")
    w = Window.partitionBy(*[F.col(f"l.{c}") for c in lid]).orderBy(
        *order, *[F.col(f"r.{t}").desc_nulls_last() for t in tiebreakers]
    )
    out = (
        joined.withColumn("_asof_rn", F.row_number().over(w))
        .filter(F.col("_asof_rn") == 1)
        .select(
            *[F.col(f"l.{c}") for c in left.columns if c != "_asof_lid"],
            *[F.col(f"r.{c}").alias(c) for c in rsel],
        )
    )
    return out
