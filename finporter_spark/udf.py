"""UDF surface (SURVEY §2B U1-U4) — the generalization of the importer
plugin protocol: user logic plugs into the engine as Arrow-vectorized
pandas functions, never row-at-a-time Python.

U1 scalar pandas_udf · U2 grouped-map applyInPandas ·
U3 grouped-agg pandas_udf · U4 UDTF-style flatten via mapInPandas.
"""

from __future__ import annotations

from typing import Callable, Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DataType, StructType


def vectorized(return_type: DataType | str):
    """U1: decorator for an Arrow-batched scalar UDF over pd.Series.

    ~10-100x over row-at-a-time Python UDFs; still use built-ins when one
    exists — this is the escape hatch, not the default.
    """

    def deco(fn: Callable[..., pd.Series]):
        return pandas_udf(return_type)(fn)

    return deco


def grouped_transform(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: StructType | str,
) -> DataFrame:
    """U2: per-group pandas transform (one group per call, Arrow both
    ways). Shuffles once on ``keys`` — co-partition upstream when chaining
    several grouped ops on the same keys."""
    return df.groupBy(*keys).applyInPandas(fn, schema)


def grouped_agg(return_type: DataType | str):
    """U3: decorator for a grouped-agg pandas UDAF (Series -> scalar)."""

    def deco(fn: Callable[..., object]):
        return pandas_udf(return_type)(fn)

    return deco


def flatten_map(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: StructType | str,
) -> DataFrame:
    """U4: UDTF-style 1-row -> n-rows expansion over Arrow batches."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(_map, schema)
