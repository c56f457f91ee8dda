"""Catalog extension — round-13 additions.

- ``o20_time_travel_read``: the accessor the o19 retention story left
  implicit — ``read_version`` / ``list_versions`` over the versioned
  merge sinks (layered ``state_v{batch_id}`` snapshots), with the
  vacuum interaction (reading a reclaimed version fails loudly).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from finporter_spark.queries.catalog import _t, query

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
    from finporter_spark.queries.catalog_ext import _io_dir
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
