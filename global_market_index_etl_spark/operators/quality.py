"""Data-quality aggregates (SURVEY.md §2.9 A1-A4, §2.5 F6).

The reference logs per-column null counts, stage row counts, time ranges and
unique metadata values (standardizer.py:253-258, currency_converter.py:170-174,
main.py:76-93, notebook probes). Each becomes one Spark aggregation —
partial (map-side) aggregation makes all of these single-shuffle-of-scalars
jobs regardless of input size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def null_counts(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """A1 — one row, one column per input column with its NULL count
    (standardizer.py:253-258). All counters computed in a single pass."""
    cols = columns or df.columns
    return df.agg(
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls")
            for c in cols
        ]
    )


def key_ranges(
    df: DataFrame, key: str, ts_column: str = "timestamp_utc"
) -> DataFrame:
    """A3 — per-key min/max of the time column + row count (the notebook's
    data-range probe, 01_data_exploration.ipynb)."""
    return df.groupBy(key).agg(
        F.min(ts_column).alias("min_ts"),
        F.max(ts_column).alias("max_ts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def distinct_values(df: DataFrame, column: str) -> DataFrame:
    """A4 — unique-value scan of one column (standardizer.py:304-312)."""
    return df.select(column).distinct()


def missing_rate_report(df: DataFrame, rate_column: str = "exchange_rate") -> DataFrame:
    """F6/A1 — rows lacking an FX rate, per currency
    (currency_converter.py:170-174) — the accounting the reference logs."""
    return (
        df.filter(F.col(rate_column).isNull())
        .groupBy("original_currency")
        .agg(F.count(F.lit(1)).alias("missing_rows"))
    )
