"""A concrete importer: brokerage "Positions" CSV -> MHolding.

The reference framework ships only the abstract plugin surface (its concrete
brokerage importers live in sibling repos — SURVEY.md preamble); this
importer is modeled on the reference's own inline fixtures: the
``"Positions"`` banner + account line sniff (FINporterUtilsTests.swift:23-28)
and the account-ID capture regex pattern shape
(StringCaptureGroupTests.swift:60-66), over the messy-CSV fixture of
FIXTURES.md §2.

Decode is one lazy distributed plan:
``spark.read.text`` -> preamble filter -> ``from_csv`` -> typed projection
(try_cast / timestamp parse with default time-of-day + tz) -> quarantine
split. No driver materialization; scales to any number of position files
(each file's banner/header rows are dropped by pattern, not by offset, so
splitting is order-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from finporter_spark.functions import (
    capture_groups_str,
    normalize_decode,
    parse_timestamp,
)
from finporter_spark.importers.base import DetectResult, Importer
from finporter_spark.model import AllocFormat, AllocSchema, ENTITY_SCHEMAS
from finporter_spark.sources import quarantine_split

# Case-insensitive account banner, e.g. `"Individual Something   abcd-1234"`
# (same capture shape as StringCaptureGroupTests.swift:60-66).
ACCOUNT_RE = r'"?(.+?)\s+([A-Za-z0-9-_]+)"?\s*$'
HEADER_PREFIX = "Symbol,Description,Qty,Price"

RAW_FIELDS = [
    "symbol", "description", "qty", "price", "mkt_val", "cost_basis",
    "date_acquired",
]


class PositionsImporter(Importer):
    name = "Positions"
    id_ = "positions"
    description = "Standalone positions export (CSV) -> holding"
    source_formats = (AllocFormat.CSV,)
    output_schemas = (AllocSchema.HOLDING,)

    def detect(self, data_prefix: bytes) -> DetectResult:
        text = normalize_decode(data_prefix)
        if text is None:
            return {}
        lines = text.split("\n")
        if not lines or '"Positions"' not in lines[0]:
            return {}
        return {AllocSchema.HOLDING: [AllocFormat.CSV]}

    def account_id(self, data_prefix: bytes) -> str | None:
        """Driver-side banner capture (prefix only, no Spark job)."""
        text = normalize_decode(data_prefix) or ""
        for line in text.split("\n")[1:6]:
            if not line.strip() or line.startswith('"Positions"'):
                continue
            groups = capture_groups_str(line, ACCOUNT_RE, case_insensitive=True)
            if groups and len(groups) == 2:
                return groups[1]
        return None

    def decode(
        self,
        spark: SparkSession,
        path: str,
        input_format: AllocFormat | None = None,
        output_schema: AllocSchema | None = None,
        def_time_of_day: str | None = None,
        time_zone: str | None = None,
        timestamp=None,
        account_id: str | None = None,
    ) -> tuple[DataFrame, DataFrame]:
        if output_schema not in (None, AllocSchema.HOLDING):
            from finporter_spark.errors import TargetSchemaNotSupported

            raise TargetSchemaNotSupported(self.output_schemas)

        raw_schema = ", ".join(f"{f} string" for f in RAW_FIELDS)

        lines = spark.read.text(path).select(
            F.regexp_replace("value", "\r", "").alias("line")
        )
        data = lines.filter(
            (F.length(F.trim("line")) > 0)
            & ~F.col("line").startswith('"')  # banner lines are fully quoted
            & ~F.col("line").startswith(HEADER_PREFIX.split(",")[0] + ",")
        )
        parsed = data.select(
            F.from_csv(
                "line", raw_schema, {"mode": "PERMISSIVE"}
            ).alias("r")
        ).select("r.*")

        acct = account_id if account_id is not None else ""
        typed = parsed.select(
            F.lit(acct).alias("accountID"),
            F.col("symbol").alias("securityID"),
            F.lit("").alias("lotID"),  # broker doesn't track lots -> ""
            F.col("qty").try_cast("double").alias("shareCount"),
            (
                F.col("cost_basis").try_cast("double")
                / F.nullif(F.col("qty").try_cast("double"), F.lit(0.0))
            ).alias("shareBasis"),
            parse_timestamp(
                F.col("date_acquired"), "MM/dd/yyyy", def_time_of_day, time_zone
            ).alias("acquiredAt"),
            # validation channel: a present-but-unparsable qty rejects the row
            F.when(
                F.col("qty").isNotNull()
                & F.col("qty").try_cast("double").isNull(),
                F.lit("bad qty"),
            ).alias("_reject_reason"),
        )
        good, bad = quarantine_split(typed.withColumn(
            "_corrupt_record", F.col("_reject_reason")
        ).drop("_reject_reason"), required_keys=["securityID"])
        return good.select(ENTITY_SCHEMAS[AllocSchema.HOLDING].names), bad
