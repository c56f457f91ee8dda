"""7-entity transform pipeline benchmark (BASELINE.md engine target:
CSV scan -> typed decode -> golden CSV export, all 7 entities, ≤60 s at
sf0.1).

Prep (untimed): synthesize AllocData-shaped CSV exports for every entity
from the driver testdata — volumes scale with the SF (holdings /
transactions ride lineitem, accounts ride customer, ...). Timed: for each
entity, the full FINporter pipeline as the engine runs it distributed —
permissive all-string scan (S1) -> typed decode + quarantine split (R5/S7)
-> golden-quoting delimited export (R7/S6, text sink, no driver collect).

Usage: python tools/pipeline_bench.py [sf_dir]
Prints one JSON line {"metric": "pipeline_7entity_wall_seconds", ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from finporter_spark.encoder import write_delimited
from finporter_spark.importers.allocdata import AllocDataImporter
from finporter_spark.model import AllocSchema, ENTITY_SCHEMAS
from finporter_spark.queries.catalog import _t
from finporter_spark.session import get_session

IO = "/tmp/finporter_spark_io/pipeline"


def synth_entities(spark, sf_dir):
    """Entity DataFrames derived deterministically from testdata tables."""
    l = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    p = _t(spark, sf_dir, "part")
    n = _t(spark, sf_dir, "nation")

    holdings = l.select(
        F.concat(F.lit("acc"), F.col("l_suppkey")).alias("accountID"),
        F.concat(F.lit("SEC"), F.col("l_partkey")).alias("securityID"),
        F.col("l_linenumber").cast("string").alias("lotID"),
        F.col("l_quantity").alias("shareCount"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("shareBasis"),
        F.col("l_shipdate").cast("timestamp").alias("acquiredAt"),
    )
    transactions = l.select(
        F.when(F.col("l_returnflag") == "R", F.lit("SELL"))
        .otherwise(F.lit("BUY"))
        .alias("action"),
        F.col("l_shipdate").cast("timestamp").alias("transactedAt"),
        F.concat(F.lit("acc"), F.col("l_suppkey")).alias("accountID"),
        F.concat(F.lit("SEC"), F.col("l_partkey")).alias("securityID"),
        F.col("l_linenumber").cast("string").alias("lotID"),
        F.col("l_quantity").alias("shareCount"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("sharePrice"),
        F.lit(None).cast("double").alias("realizedGainShort"),
        F.lit(None).cast("double").alias("realizedGainLong"),
        F.concat(
            F.lit("T"),
            F.date_format("l_shipdate", "yyyyMMdd"),
            F.lpad(F.col("l_linenumber").cast("string"), 5, "0"),
        ).alias("txnID"),
    )
    accounts = c.select(
        F.concat(F.lit("acc"), F.col("c_custkey")).alias("accountID"),
        F.col("c_name").alias("title"),
        (F.col("c_custkey") % 2 == 0).alias("isActive"),
        (F.col("c_custkey") % 3 == 0).alias("isTaxable"),
        F.lit(True).alias("canTrade"),
        F.concat(F.lit("strat"), F.col("c_nationkey")).alias("strategyID"),
    )
    securities = p.select(
        F.concat(F.lit("SEC"), F.col("p_partkey")).alias("securityID"),
        F.col("p_brand").alias("assetID"),
        F.col("p_retailprice").alias("sharePrice"),
        F.lit("2021-03-01 00:00:00").cast("timestamp").alias("updatedAt"),
        F.col("p_type").alias("trackerID"),
    )
    strategies = n.select(
        F.concat(F.lit("strat"), F.col("n_nationkey")).alias("strategyID"),
        F.col("n_name").alias("title"),
    )
    assets = p.select(F.col("p_brand").alias("assetID")).distinct().select(
        "assetID",
        F.upper("assetID").alias("title"),
        F.pmod(F.crc32("assetID"), F.lit(1 << 24)).cast("int").alias("colorCode"),
        F.lit("Total").alias("parentAssetID"),
    )
    allocations = (
        n.crossJoin(assets.select("assetID").limit(4))
        .select(
            F.concat(F.lit("strat"), F.col("n_nationkey")).alias("strategyID"),
            "assetID",
            F.lit(0.25).alias("targetPct"),
            F.lit(False).alias("isLocked"),
        )
    )
    return {
        AllocSchema.ACCOUNT: accounts,
        AllocSchema.ALLOCATION: allocations,
        AllocSchema.ASSET: assets,
        AllocSchema.HOLDING: holdings,
        AllocSchema.SECURITY: securities,
        AllocSchema.STRATEGY: strategies,
        AllocSchema.TRANSACTION: transactions,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_session("pipeline-bench")
    imp = AllocDataImporter()
    shutil.rmtree(IO, ignore_errors=True)

    # ---- prep (untimed): standardized CSV exports per entity on disk.
    # Standard writer with header=True: every part file self-describes,
    # which is what a broker file-drop looks like. ISO-Z timestamps match
    # the AllocData decode format.
    inputs: dict[AllocSchema, str] = {}
    for schema, df in synth_entities(spark, sf_dir).items():
        path = os.path.join(IO, "in", schema.value)
        (
            df.select(ENTITY_SCHEMAS[schema].names)
            .write.mode("overwrite")
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ssXXX")
            .csv(path, header=True)
        )
        inputs[schema] = path

    # ---- timed: scan -> decode -> quarantine -> golden export, per entity
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    total = 0.0
    for schema, path in inputs.items():
        t0 = time.time()
        good, bad = imp.decode(spark, path, output_schema=schema)
        out = os.path.join(IO, "out", schema.value)
        write_delimited(good, out, ",", ENTITY_SCHEMAS[schema].names)
        n_bad = bad.count()
        dt = time.time() - t0
        timings[schema.value] = round(dt, 3)
        rows[schema.value] = spark.read.text(out).count()
        total += dt
        assert n_bad == 0, f"{schema}: unexpected rejects {n_bad}"

    print(
        json.dumps(
            {
                "metric": "pipeline_7entity_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "per_entity_sec": timings,
                "rows_out": rows,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
