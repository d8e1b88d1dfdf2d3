"""Named-query registry backing the driver contract (__spark_entry__.py).

Every implemented operator from SURVEY.md §2 (plus the training-data
extensions) is declared here as a ``QueryDef``: a Spark plan builder
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, the equivalent
ANSI SQL the DuckDB oracle runs on the same parquet tables. Column names and
types are aligned on both sides — the driver's compare sorts columns by name
and hashes values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark: SparkQuery
    oracle: str | None  # None ⇒ not SQL-expressible; driver does rows-only
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a Spark query builder under ``name``."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return wrap
