"""finporter_spark — a PySpark-native analytics engine with the capability
surface of openalloc/FINporter (schema-mapping ETL: detect / decode / export)
plus a declared relational + streaming + LLM-data-pipeline operator surface
(SURVEY.md §2B), designed for 100 TB scale.

Everything is expressed Spark-first: lazy DataFrame plans, Catalyst
optimization, built-in ``pyspark.sql.functions`` in the hot path, Arrow-backed
pandas UDFs only where built-ins cannot express the semantics.
"""

from finporter_spark.errors import FINporterError
from finporter_spark.model import AllocFormat, AllocSchema, ENTITY_SCHEMAS, ENTITY_KEYS

__all__ = [
    "FINporterError",
    "AllocFormat",
    "AllocSchema",
    "ENTITY_SCHEMAS",
    "ENTITY_KEYS",
]

__version__ = "0.1.0"
