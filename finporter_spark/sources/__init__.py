"""Sources & sinks (SURVEY §2B S1-S7): permissive scans with a
corrupt-record channel, prefix reads for detect, and quarantine splitting.

Scale notes: all readers return lazy scans; schema is supplied or inferred
once; ``read_prefix`` reads only the head of one file on the driver (the
detect path never launches a job). Quarantine split is two filters over one
cached scan — no shuffle.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from finporter_spark.model import AllocFormat

CORRUPT_COL = "_corrupt_record"


def read_prefix(path: str, n_bytes: int = 4096) -> bytes:
    """Driver-side prefix read for detect (DetectHandler.swift:25-26 reads
    the whole file; we read only the sniffing prefix — same contract as
    ``detect(dataPrefix:)``, FINporter.swift:33-35). A directory (file-drop
    folder) sniffs its first visible file."""
    if os.path.isdir(path):
        names = sorted(
            n
            for n in os.listdir(path)
            if not n.startswith(("_", "."))
            and os.path.isfile(os.path.join(path, n))
        )
        if not names:
            raise FileNotFoundError(f"no files to sniff in {path}")
        path = os.path.join(path, names[0])
    with open(path, "rb") as f:
        return f.read(n_bytes)


def read_delimited(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header: bool = True,
    schema: StructType | None = None,
    all_string: bool = False,
) -> DataFrame:
    """Permissive CSV/TSV scan with corrupt-record side channel (S1/S2).

    Files with non-tabular preambles (brokerage banners, FIXTURES.md §2) go
    through importer-specific preamble filters over ``spark.read.text`` +
    ``from_csv`` instead (see importers.tabular) — that path stays lazy and
    distributed without a per-file skip count.
    """
    reader = (
        spark.read.option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if schema is not None:
        schema = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
        )
        reader = reader.schema(schema)
    elif all_string:
        # header-derived all-string schema: one tiny driver read for names
        head = (
            spark.read.option("header", True).option("sep", delimiter).csv(path)
        )
        names = head.columns
        schema = StructType(
            [StructField(n, StringType(), True) for n in names]
            + [StructField(CORRUPT_COL, StringType(), True)]
        )
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_csv(spark: SparkSession, path: str, **kw) -> DataFrame:
    return read_delimited(spark, path, ",", **kw)


def read_tsv(spark: SparkSession, path: str, **kw) -> DataFrame:
    return read_delimited(spark, path, "\t", **kw)


def read_json(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_binary(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Multimodal/binary file scan (L5): path, modificationTime, length,
    content columns; pushdown-friendly `pathGlobFilter`."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def quarantine_split(
    df: DataFrame, required_keys: Sequence[str] = ()
) -> tuple[DataFrame, DataFrame]:
    """Split good rows from rejects (S7; decode's ``rejectedRows`` channel,
    FINporter.swift:41).

    A row is rejected when the parser flagged it corrupt OR any required
    key column is null (the ``T(from: row)`` validation step,
    TransformHandler.swift:125). Two filters over the same scan.

    When the corrupt-record channel is present the parse is cached first:
    Spark refuses queries that reference only the corrupt column of a raw
    scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the rejected side is
    exactly such a query after column pruning. At ingest scale the cache
    is per-file-decode sized; persist via ``write_quarantine`` for audit.

    Both returned frames are tagged with the cache (caching.owns_cache);
    call ``caching.release_caches(good, bad)`` once materialized —
    handle_transform does, so CLI-shaped use never accumulates caches.
    """
    from finporter_spark.caching import owns_cache

    cond = F.lit(False)
    cached = None
    if CORRUPT_COL in df.columns:
        df = cached = df.cache()
        cond = cond | F.col(CORRUPT_COL).isNotNull()
    for k in required_keys:
        cond = cond | F.col(k).isNull()
    good = df.filter(~cond)
    bad = df.filter(cond)
    if CORRUPT_COL in df.columns:
        good = good.drop(CORRUPT_COL)
    if cached is not None:
        owns_cache(good, cached)
        owns_cache(bad, cached)
    return good, bad


def write_quarantine(bad: DataFrame, path: str) -> None:
    """Quarantine sink: rejected rows persisted for audit (S7)."""
    bad.write.mode("overwrite").parquet(path)


def write_partitioned_by_day(
    df: DataFrame, path: str, ts_col: str, fmt: str = "parquet"
) -> None:
    """Date-partitioned sink: the ingest layout that makes time-ranged
    scans prune at the directory level (PartitionFilters in the scan, no
    footer reads outside the range) — the default layout for any
    append-only 100 TB event/transaction table."""
    (
        df.withColumn("_day", F.to_date(F.col(ts_col)))
        .write.mode("overwrite")
        .partitionBy("_day")
        .format(fmt)
        .save(path)
    )
