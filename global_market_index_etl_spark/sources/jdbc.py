"""JDBC source/sink adapters — the reference's persistence + verification
entry point (/root/reference/src/storage/postgres_writer.py:368-377 reads
back what it wrote; 234-278 writes with ON CONFLICT upsert semantics).

Thin, explicit wrappers over Spark's built-in JDBC relation provider. Why
wrappers at all: the scale-relevant knobs are easy to get silently wrong —

- **read**: without ``partitionColumn/lowerBound/upperBound/numPartitions``
  Spark reads the whole table through ONE connection on one task; at any
  real table size the parallel form is the only acceptable one, so
  ``read_jdbc`` makes the partitioning spec a first-class argument.
- **write**: JDBC has no MERGE in the DataFrameWriter; the idempotent path
  is append-into-staging + database-side ``INSERT ... ON CONFLICT`` (what
  the reference does), or the relational upsert (operators/upsert.py)
  before an overwrite. ``write_jdbc`` documents this and refuses the
  silently-lossy SaveMode.Overwrite-with-truncate-by-default trap.

No PostgreSQL JAR ships in this container, but Spark bundles Apache
Derby (for the Hive metastore) and Derby's EMBEDDED driver is a real
JDBC database inside the same JVM — so tests/test_jdbc.py runs the
write→read-back round-trip, the range-partitioned parallel read, and
the append contract LIVE against Derby. Swapping the URL + driver JAR
for PostgreSQL changes nothing in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 16,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC read (S7/K-readback parity, postgres_writer.py:368-377).

    With ``partition_column`` (a numeric/date column, ideally the PK) the
    scan issues ``num_partitions`` range-bounded queries in parallel;
    without it the read is single-connection — fine for dimension tables,
    wrong for facts, so the single-connection fallback is explicit, not
    accidental.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC read needs lower_bound and upper_bound "
                "(SELECT min(pk), max(pk) first — one cheap query)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC write (K2/K3 sink parity, postgres_writer.py:234-278).

    ``append`` is the only idempotency-compatible mode here: upsert
    semantics live either database-side (staging table + ``INSERT ... ON
    CONFLICT DO UPDATE``, the reference's exact mechanism) or Spark-side
    (operators/upsert.upsert before a full rewrite). ``overwrite`` is
    rejected: Spark's JDBC overwrite DROPs and re-creates the table
    (losing DDL/indexes/grants) unless ``truncate`` is set — a silent
    data-architecture change no ETL sink should make implicitly.
    """
    if mode != "append":
        raise ValueError(
            "write_jdbc supports mode='append' only; for MERGE semantics "
            "upsert Spark-side (operators/upsert.upsert) or append into a "
            "staging table and run the database's ON CONFLICT statement "
            "(the reference's postgres_writer.py:234-259 path)"
        )
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
