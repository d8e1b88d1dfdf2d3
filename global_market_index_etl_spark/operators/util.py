"""Shared physical-plan helpers for explode/join-heavy operators."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def parallelize_small(df: DataFrame) -> DataFrame:
    """Spread a narrow scan across all cores before expensive per-row work.

    A small table arrives as one or two input splits (single parquet file ⇒
    single task), so explode/tokenize/score stages run on one core.
    Repartition up to ``defaultParallelism`` — one cheap shuffle of the
    projected input amortized over the heavy downstream stage. At real scale
    the scan already has ≥ defaultParallelism splits and this is a no-op
    (no shuffle added).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly compute a subtree that several downstream branches reuse.

    Self-join + size-join consumers re-derive the input subtree once per
    branch — Catalyst's ReuseExchange does NOT fire across the distinct/join
    partitioning mix (measured on the exact-Jaccard plan: 8 parquet scans,
    22 exchanges, 0 reuses). One MEMORY_AND_DISK persist turns that into a
    single computation; at cluster scale the same role is played by
    persisting or checkpointing the intermediate before the pair join —
    standard practice in production dedup pipelines (spills to disk, never
    OOMs). The eager count avoids concurrent branch stages double-computing
    a cold cache.
    """
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    return df
