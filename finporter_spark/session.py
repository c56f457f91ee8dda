"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]`` single-JVM, but every conf below is chosen to
also be the right default on a 1000-executor cluster reading 100 TB:

- AQE on (runtime coalescing, broadcast-conversion, skew-join splitting) so
  static shuffle-partition counts need not be perfect per stage.
- Arrow on for any pandas-UDF exchange (vectorized Python↔JVM).
- Session timezone pinned to UTC: the reference serializes timestamps as
  ISO8601 UTC (DelimitedEncoder.swift:30,130-131) and the DuckDB oracle
  compares naive UTC timestamps.
- ``spark.sql.shuffle.partitions`` defaults to cores locally; on a real
  cluster AQE coalesces from a high initial count, so we set an initial
  partition number instead of trusting one magic value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "finporter-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(cpus))
    )

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # 10 MB default broadcast threshold is fine; dims here are tiny.
        # Parquet vectorized reader + pushdown are on by default; keep them.
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanos type — read as long and convert (see read_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # managed tables (bucketed ingest) live outside the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE", "/tmp/finporter_spark_warehouse"
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def load_testdata(spark: SparkSession, sf_dir: str, register_views: bool = True):
    """Load the driver's parquet tables; optionally register temp views.

    Returns dict name -> DataFrame. Schemas come from the parquet footers
    (FIXTURES.md §4) — column pruning + predicate pushdown reach the scan.
    """
    from finporter_spark.model import TESTDATA_TABLES

    dfs = {}
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        if register_views:
            df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
