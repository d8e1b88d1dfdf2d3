"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query at sf0.001; ``queries``/``oracle_sql``
expose every implemented operator from SURVEY.md §2 plus the training-data
extensions, declared in ``global_market_index_etl_spark.plans``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from global_market_index_etl_spark.plans import REGISTRY, ordered_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (regional discounted revenue) on /root/testdata/sf0.001."""
    return REGISTRY["flagship_regional_revenue"].spark(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions).

    Ordered for the driver's 50-query correctness window: newest /
    least-validated queries first, long-green redundant parity rows last
    (see plans.ordered_registry).
    """
    return {name: qd.spark for name, qd in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for every SQL-expressible query."""
    return {
        name: qd.oracle
        for name, qd in ordered_registry().items()
        if qd.oracle is not None
    }
