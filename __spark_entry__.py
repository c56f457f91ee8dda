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

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from finporter_spark.queries.catalog import catalog_oracles, catalog_queries

_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``finporter_spark`` importable on executor Python workers.

    The catalog's pandas/mapInPandas stages pickle module-level
    functions BY REFERENCE, so workers must import the package. When the
    driver process launched with the repo on PYTHONPATH (how the tests
    and bench run) this is a no-op; when a driver-supplied session has a
    different cwd/env, ship the package once as a zip via addPyFile —
    runtime-safe and distributed to every worker.
    """
    sc = spark.sparkContext
    if id(sc) in _SHIPPED:
        return
    _SHIPPED.add(id(sc))
    try:
        import finporter_spark  # noqa: F401  (driver side import check)

        import zipfile

        zpath = os.path.join("/tmp", "finporter_spark_pkg.zip")
        with zipfile.ZipFile(zpath, "w") as zf:
            pkg = os.path.join(_REPO, "finporter_spark")
            for root, _dirs, files in os.walk(pkg):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        zf.write(full, os.path.relpath(full, _REPO))
        sc.addPyFile(zpath)
    except Exception:
        pass  # best effort; normal PYTHONPATH setups never need this


def _wrap(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship_package(spark)
    qs = catalog_queries()
    return qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    return {name: _wrap(fn) for name, fn in catalog_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for ≈ ops)."""
    return catalog_oracles()


def baselines() -> dict[str, str]:
    """Declared small-SF baseline queries -> their scale-path twins.

    Entries listed here (e.g. p16_fuzzy_join, x6_stateful_running_totals,
    l9/l10 brute-force pair scans) are deliberately NOT 100 TB operators:
    they validate or demo the twin named as the value. Production use
    should pick the twin."""
    from finporter_spark.queries.catalog import catalog_baselines

    return catalog_baselines()
