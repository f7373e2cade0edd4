"""Central query registry: one entry per implemented operator from
SURVEY.md §2, each with a DataFrame builder and (where SQL-expressible)
a DuckDB oracle string over the same parquet fixtures.

`__spark_entry__.py` re-exports this; tests/test_oracle.py replays the
driver's compare (row count + schema + order-insensitive values) at
sf0.001 so mismatches surface before the sf0.01 gate.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..operators import search

@dataclass
class Query:
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)

def _registry() -> dict[str, Query]:
    r: dict[str, Query] = {}

    # --- query surface (reference endpoints/CLI) ---
    r["vector_search"] = Query(
        lambda spark, sf: search.vector_search(spark, sf),
        search.vector_search_oracle(),
        ("search", "vector", "bench"),
    )
    r["similar_search"] = Query(
        lambda spark, sf: search.similar_search(spark, sf),
        search.similar_search_oracle(),
        ("search", "vector", "bench"),
    )
    r["text_search"] = Query(
        lambda spark, sf: search.text_search(spark, sf),
        search.text_search_oracle(),
        ("search", "text", "bench"),
    )
    r["list_games"] = Query(
        lambda spark, sf: search.list_games(spark, sf),
        search.list_games_oracle(),
        ("listing",),
    )
    r["count_games"] = Query(
        lambda spark, sf: search.count_games(spark, sf),
        search.count_games_oracle(),
        ("agg",),
    )
    r["stats"] = Query(
        lambda spark, sf: search.stats(spark, sf),
        search.stats_oracle(),
        ("agg", "bench"),
    )
    return r

QUERIES: dict[str, Query] = _registry()

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in QUERIES.items()}

def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
