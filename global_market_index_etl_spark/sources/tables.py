"""Loaders for the driver's deterministic parquet tables (TESTDATA.md).

The fixture parquet stores some timestamps as INT64 TIMESTAMP(NANOS), a
physical type Spark has no native logical type for. With
``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.py) those
columns arrive as LongType nanoseconds; this module converts them to
``timestamp_ntz`` at microsecond precision — the same truncation DuckDB
applies (its TIMESTAMP is micros), so the oracle and the engine agree.

At 100 TB these readers are still just ``spark.read.parquet`` — schema comes
from footers, filters/column pruning push down to the scan, and partition
discovery parallelizes. The nanos conversion is a zero-shuffle projection.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Columns stored as TIMESTAMP(NANOS) in the fixture parquet — read as long
# nanos and rebuilt as timestamp_ntz micros.
_NANOS_TS_COLUMNS: dict[str, list[str]] = {
    "events": ["ts"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing nano-timestamps to timestamp_ntz."""
    from ..session import ensure_session_invariants

    ensure_session_invariants(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLUMNS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            # integer `div`, not `/`: epoch-nanos ≈ 1.7e18 exceeds double's
            # 53-bit mantissa, so float division would corrupt low microseconds
            df = df.withColumn(
                col,
                F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast(
                    "timestamp_ntz"
                ),
            )
    return df


def load_events_ts_range(
    spark: SparkSession, sf_dir: str, lo_iso: str, hi_iso: str
) -> DataFrame:
    """Events with ``lo <= ts < hi``, filtered in the RAW nanos domain.

    The ts column is rebuilt from INT64 nanos by a projection, so a
    predicate on the converted timestamp cannot reach the parquet reader
    (only IsNotNull pushes). Translating the bounds to epoch-nanos and
    filtering the long column BEFORE conversion turns the day slice into a
    scan-level range predicate — parquet row-group min/max stats prune
    whole row groups, and on a date-partitioned table, whole partitions.
    Identical results to filtering the converted column; only the physical
    plan differs.
    """
    import datetime as dt

    from ..session import ensure_session_invariants

    ensure_session_invariants(spark)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")

    def _nanos(iso: str) -> int:
        d = dt.datetime.fromisoformat(iso).replace(tzinfo=dt.timezone.utc)
        return int(d.timestamp()) * 1_000_000_000

    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.filter(
            (F.col("ts") >= F.lit(_nanos(lo_iso)))
            & (F.col("ts") < F.lit(_nanos(hi_iso)))
        ).withColumn(
            "ts",
            F.timestamp_micros(F.expr("`ts` div 1000")).cast("timestamp_ntz"),
        )
    else:
        raw = raw.filter(
            (F.col("ts") >= F.lit(lo_iso).cast("timestamp_ntz"))
            & (F.col("ts") < F.lit(hi_iso).cast("timestamp_ntz"))
        )
    return raw


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
