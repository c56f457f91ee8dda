"""Data model: formats, schema tags, and the 7 standardized entity schemas.

Reference mapping (SURVEY.md §1):
- ``AllocFormat`` — CSV/TSV/JSON enum, exhaustive switch at
  /root/reference/Sources/Core/FINporter.swift:52-68.
- ``AllocSchema`` — schema tags dispatched at
  /root/reference/Sources/Handlers/TransformHandler.swift:38-51.
- Entity field lists per FIXTURES.md §1 (from the public openalloc/AllocData
  dependency, Package.swift:27). Money/share quantities are DOUBLE, not
  DECIMAL (DelimitedEncoder.swift:90-96; SURVEY §1.2).
- Key columns (ENTITY_KEYS) drive dedup/upsert and join partitioning
  (SURVEY §1.2): at 100 TB these are the shuffle keys.
- Standard asset-class vocabulary: MAsset+StandardID.swift:23-59 (36 values).
"""

from __future__ import annotations

import enum

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


class AllocFormat(str, enum.Enum):
    """Source/sink format (FINporter.swift:52-68)."""

    CSV = "csv"
    TSV = "tsv"
    JSON = "json"
    # Engine extension: columnar interchange for the testdata / 100 TB path.
    PARQUET = "parquet"

    @property
    def delimiter(self) -> str | None:
        if self is AllocFormat.CSV:
            return ","
        if self is AllocFormat.TSV:
            return "\t"
        return None

    @classmethod
    def from_extension(cls, ext: str) -> "AllocFormat | None":
        ext = ext.lower().lstrip(".")
        return {
            "csv": cls.CSV,
            "tsv": cls.TSV,
            "txt": cls.TSV,
            "json": cls.JSON,
            "parquet": cls.PARQUET,
        }.get(ext)


class AllocSchema(str, enum.Enum):
    """Target standardized schema tag (TransformHandler.swift:38-51)."""

    ACCOUNT = "allocAccount"
    ALLOCATION = "allocAllocation"
    ASSET = "allocAsset"
    HOLDING = "allocHolding"
    SECURITY = "allocSecurity"
    STRATEGY = "allocStrategy"
    TRANSACTION = "allocTransaction"


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# Fixed, declared schemas — header order on export comes from this declared
# attribute order, not from the data (FINporter.swift:62,66).
ENTITY_SCHEMAS: dict[AllocSchema, StructType] = {
    AllocSchema.ACCOUNT: StructType(
        [
            _f("accountID", StringType(), False),
            _f("title", StringType()),
            _f("isActive", BooleanType()),
            _f("isTaxable", BooleanType()),
            _f("canTrade", BooleanType()),
            _f("strategyID", StringType()),
        ]
    ),
    AllocSchema.ALLOCATION: StructType(
        [
            _f("strategyID", StringType(), False),
            _f("assetID", StringType(), False),
            _f("targetPct", DoubleType()),
            _f("isLocked", BooleanType()),
        ]
    ),
    AllocSchema.ASSET: StructType(
        [
            _f("assetID", StringType(), False),
            _f("title", StringType()),
            _f("colorCode", IntegerType()),
            _f("parentAssetID", StringType()),
        ]
    ),
    AllocSchema.HOLDING: StructType(
        [
            _f("accountID", StringType(), False),
            _f("securityID", StringType(), False),
            _f("lotID", StringType(), False),
            _f("shareCount", DoubleType()),
            _f("shareBasis", DoubleType()),
            _f("acquiredAt", TimestampType()),
        ]
    ),
    AllocSchema.SECURITY: StructType(
        [
            _f("securityID", StringType(), False),
            _f("assetID", StringType()),
            _f("sharePrice", DoubleType()),
            _f("updatedAt", TimestampType()),
            _f("trackerID", StringType()),
        ]
    ),
    AllocSchema.STRATEGY: StructType(
        [
            _f("strategyID", StringType(), False),
            _f("title", StringType()),
        ]
    ),
    AllocSchema.TRANSACTION: StructType(
        [
            _f("action", StringType(), False),
            _f("transactedAt", TimestampType(), False),
            _f("accountID", StringType(), False),
            _f("securityID", StringType(), False),
            _f("lotID", StringType()),
            _f("shareCount", DoubleType()),
            _f("sharePrice", DoubleType()),
            _f("realizedGainShort", DoubleType()),
            _f("realizedGainLong", DoubleType()),
            _f("txnID", StringType()),
        ]
    ),
}

# Primary/natural keys per entity (SURVEY §1.2) — the partitioning / dedup /
# upsert keys. At cluster scale, repartition-by-key before stateful ops so
# co-grouped work avoids extra shuffles.
ENTITY_KEYS: dict[AllocSchema, list[str]] = {
    AllocSchema.ACCOUNT: ["accountID"],
    AllocSchema.ALLOCATION: ["strategyID", "assetID"],
    AllocSchema.ASSET: ["assetID"],
    AllocSchema.HOLDING: ["accountID", "securityID", "lotID"],
    AllocSchema.SECURITY: ["securityID"],
    AllocSchema.STRATEGY: ["strategyID"],
    AllocSchema.TRANSACTION: [
        "action",
        "transactedAt",
        "accountID",
        "securityID",
        "lotID",
        "shareCount",
    ],
}

# 36-value closed vocabulary for standard asset classes
# (MAsset+StandardID.swift:23-59). Used as a broadcast dim / isin validation.
STANDARD_ASSET_IDS: tuple[str, ...] = (
    "Bond", "Cash", "Cmdty", "CorpBond", "EM", "EMBond", "Europe", "GlobRE",
    "Gold", "HYBond", "Intl", "IntlBond", "IntlGov", "IntlRE", "IntlSC",
    "IntlVal", "ITGov", "Japan", "LC", "LCGrow", "LCVal", "LTGov", "MC",
    "MCGrow", "MCVal", "Momentum", "Pacific", "RE", "REMort", "SC", "SCGrow",
    "SCVal", "STGov", "Tech", "TIPS", "Total",
)

# TPC-H-ish driver testdata tables (TESTDATA.md) — read schemas from parquet,
# never redeclare (FIXTURES.md §4). Listed here for registration loops.
TESTDATA_TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)
