"""Durable MERGE-into-storage upsert over parquet (SURVEY.md §2.2 K1-K3).

The reference's at-rest semantic is ``INSERT ... ON CONFLICT DO UPDATE``
into live PostgreSQL tables (/root/reference/src/storage/postgres_writer.py:234-259,
DDL 32-113). Plain parquet has no MERGE, so the durable form here is the
lakehouse-standard **partition-pruned read-modify-overwrite**:

- the table is laid out partitioned by a deterministic key-hash bucket
  (``__bucket = pmod(xxhash64(keys...), n_buckets)``);
- a MERGE reads ONLY the buckets that contain updated keys (partition
  pruning on the scan), applies the relational last-write-wins upsert
  (operators/upsert.py — the oracle-checked core), and overwrites ONLY
  those buckets via dynamic partition overwrite.

Cost therefore scales with |touched buckets| ≍ |batch|, not |table| — the
property that makes MERGE viable on a 100 TB table. With Delta/Iceberg on
the classpath the same interface maps onto their native ``MERGE INTO``;
this form is the dependency-free equivalent with identical semantics
(idempotency under batch replay is asserted in tests and in the declared
``k2_upsert_roundtrip`` query).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .upsert import upsert

BUCKET = "__bucket"


def _bucket_col(key_columns: list[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_columns]), F.lit(n_buckets))


def write_bucketed_table(
    df: DataFrame, path: str, key_columns: list[str], n_buckets: int = 16
):
    """Materialize ``df`` as a key-hash-bucketed parquet table at ``path``.

    The bucket column is derived (never trusted from input) so every writer
    places a key in the same bucket forever — the invariant MERGE pruning
    relies on.

    The frame is repartitioned ON the bucket column before the partitioned
    write: without it every upstream task writes a sliver into every bucket
    directory (tasks × n_buckets small files — the classic dynamic-
    partition-write file explosion); with it each bucket is one task
    writing one file. At lake scale raise parallelism by repartitioning on
    (bucket, key) with more partitions — several files per bucket is fine,
    slivers from every task are not.

    Returns the on-disk schema (data columns + the bucket column). Keep it
    (or re-derive it from the frame you write) and pass it to ``read_table``
    / rely on ``merge_into_parquet`` pinning it from the batch: pinned-
    schema reads are what make an EMPTY table readable (a zero-row
    partitioned parquet dir has no footers to infer from — the gap a table
    format's transaction log normally covers) and skip footer-inference
    planning cost on wide tables.
    """
    bucketed = df.withColumn(BUCKET, _bucket_col(key_columns, n_buckets))
    (
        bucketed.repartition(n_buckets, F.col(BUCKET))
        .write.mode("overwrite")
        .partitionBy(BUCKET)
        .parquet(path)
    )
    return bucketed.schema


def merge_into_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_columns: list[str],
    order_column: str | None = None,
    n_buckets: int = 16,
) -> None:
    """MERGE ``updates`` into the bucketed table at ``path`` (last-write-wins).

    Reads only the buckets containing updated keys and rewrites only those
    buckets (dynamic partition overwrite) — untouched buckets' files are
    never read or rewritten. Idempotent: replaying the same batch leaves the
    table unchanged (updates win ties via the upsert's ``__src`` tag, and the
    survivor set is deterministic).
    """
    up = updates.withColumn(BUCKET, _bucket_col(key_columns, n_buckets))
    # ≤ n_buckets scalar rows — bounded driver collect, independent of data size
    affected = [r[0] for r in up.select(BUCKET).distinct().collect()]
    if not affected:
        return
    # Schema pinned from the batch (same columns by contract): parquet
    # columns resolve by NAME, the partition column fills from dir names,
    # a still-empty table reads as zero rows instead of failing inference,
    # and planning skips the footer sweep entirely.
    current = (
        spark.read.schema(up.schema)
        .parquet(path)
        .filter(F.col(BUCKET).isin(affected))
    )
    merged = upsert(current, up, key_columns, order_column=order_column)
    # Materialize BEFORE overwriting: the merged plan reads the very files
    # the write replaces (Spark rejects the self-overwrite, and rightly so).
    # localCheckpoint holds only the touched buckets — |batch|-sized, not
    # |table|-sized. A Delta/Iceberg MERGE does the same staging internally.
    merged = merged.localCheckpoint(eager=True)
    (
        merged.repartition(len(affected), F.col(BUCKET))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BUCKET)
        .parquet(path)
    )


def read_table(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read the bucketed table back without the layout column.

    Pass the schema ``write_bucketed_table`` returned to make empty tables
    readable and to skip footer inference; omitted, Spark infers (fine for
    known-nonempty tables).
    """
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.parquet(path).drop(BUCKET)


def export_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    fmt: str = "parquet",
    order_col: str | None = None,
) -> None:
    """Deterministic sharded export for training consumption: every row
    lands in shard ``pmod(xxhash64(id), n_shards)``, sorted within the
    shard by (order_col, id) — so two exports of the same corpus are
    file-for-file identical, and a training job can map shards to data
    loaders with stable membership across rebuilds (the same property the
    hash-bucket split gives, applied to physical files).

    ``repartition(n, col)`` alone would leave intra-partition order to scan
    order (nondeterministic across runs/cluster sizes); the
    ``sortWithinPartitions`` pins it. One shuffle, no global sort. The
    shard column is written so readers can verify placement; ``fmt`` may
    be ``parquet`` or ``json`` (JSONL shards for text-pipeline tooling).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    )
    order = [F.col(order_col)] if order_col else []
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions(*order, F.col(id_col))
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )


def read_training_shards(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None
) -> DataFrame:
    """Read back an exported shard set (schema required for json shards if
    inference is to be avoided)."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
