"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator catalog from
``finporter_spark.queries.catalog`` (one entry per SURVEY.md §2B operator;
oracle omitted only for the ≈-marked approximate operators, which get
rows-only checks here and threshold checks in tests/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from finporter_spark.queries.catalog import catalog_oracles, catalog_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = catalog_queries()
    return qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    return catalog_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for ≈ ops)."""
    return catalog_oracles()
