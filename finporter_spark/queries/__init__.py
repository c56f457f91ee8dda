from finporter_spark.queries.catalog import (
    CATALOG,
    catalog_oracles,
    catalog_queries,
)

__all__ = ["CATALOG", "catalog_queries", "catalog_oracles"]
