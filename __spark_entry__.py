"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over roblox_vector_search_datagen_spark.plans.registry — the
single source of truth for the implemented operator inventory
(SURVEY.md §2) and their DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from roblox_vector_search_datagen_spark.plans import registry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: semantic vector search at sf0.001."""
    from roblox_vector_search_datagen_spark.operators.search import vector_search

    return vector_search(spark, "/root/testdata/sf0.001")

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()

def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
