"""Deterministic (engine-portable) float aggregation helpers.

Floating-point SUM is order-dependent; a distributed Spark sum and a DuckDB
oracle sum of the same doubles can differ in low bits, which breaks exact
value-hash comparison (SURVEY.md §7 risk 4) — and on a real cluster the same
query can return different low bits run-to-run, which breaks reproducible
pipelines.

Fixed-point money columns (2-decimal doubles) have an exact representation:
scale to integer units, sum as integers (associative, order-independent,
exact up to 2^53 — and Spark longs/DuckDB HUGEINT overflow far later), then
divide once. ``sum(round(x*100)::long)/100.0`` is bit-identical on any
engine, any partitioning, any row order.

Per-row arithmetic (a*b, a-b) needs no such treatment: identical IEEE inputs
give identical IEEE outputs everywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def cents(col: Column | str, scale: int = 100) -> Column:
    """Exact integer representation of a fixed-point double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(scale)).cast("long")


def exact_money_sum(col: Column | str, scale: int = 100) -> Column:
    """Order-independent SUM of a fixed-point double column (as double)."""
    return F.sum(cents(col, scale)) / F.lit(float(scale))


def sql_exact_money_sum(expr: str, scale: int = 100) -> str:
    """DuckDB oracle twin of :func:`exact_money_sum`.

    The inner CAST keeps DuckDB's integer sum comparable (its SUM(BIGINT)
    widens to HUGEINT, which pandas renders differently from int64).
    """
    return (
        f"CAST(SUM(CAST(round(({expr}) * {scale}) AS BIGINT)) AS BIGINT)"
        f" / {float(scale)}"
    )
