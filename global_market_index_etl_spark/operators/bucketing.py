"""Bucketed (co-located) storage and shuffle-free joins.

The 100 TB answer to "lineitem ⨝ orders shuffles both sides on every
query": write both tables bucketed (and sorted) by the join key ONCE, and
every subsequent equi-join on that key is exchange-free — each task
sort-merge-joins bucket i of the left with bucket i of the right straight
off the scan. The one-time bucketing shuffle is amortized over every
downstream join/aggregate keyed the same way; aggregations on the bucket
key also skip their exchange.

Rules for the speedup to apply (asserted in tests):
- both sides bucketed into the SAME number of buckets on the join key;
- ``spark.sql.sources.bucketing.enabled`` (default true);
- join key = bucket key (prefix).

This is the parquet-native equivalent of the co-partitioning the reference
gets implicitly from Postgres PK indexes (postgres_writer.py:86).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist ``df`` as an external parquet table bucketed on
    ``bucket_cols`` (optionally sorted within buckets — enables merge join
    without a sort stage). Returns the re-read table."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table_name)
    return df.sparkSession.table(table_name)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join of two same-bucketed tables — plans with zero Exchange
    when both were written by :func:`write_bucketed` with the same
    (bucket_cols, n_buckets)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
