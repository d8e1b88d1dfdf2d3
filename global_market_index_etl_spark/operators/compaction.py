"""Small-file compaction for incrementally-loaded parquet tables.

Every availableNow/cron tick (streaming/incremental.py) appends a handful
of small files; after months of 6-hour ticks a table holds thousands of
KB-sized files and scan planning + task scheduling dominate query time.
Compaction rewrites the table into ~target-sized files, preserving rows
exactly.

Scale notes:
- File count is computed from actual on-disk bytes (`inputFiles` +
  driver-side stat), not row counts — binary/text columns make rows
  wildly uneven.
- ``repartition(n)`` (round-robin) balances output file sizes; use
  ``repartition(n, key)`` via ``partition_cols`` when downstream wants
  co-located keys instead of even files.
- The rewrite is atomic-enough for batch (write to ``path.tmp`` then
  swap) — real deployments do this under a table format (Delta/Iceberg
  OPTIMIZE); this is the dependency-free equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def planned_file_count(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> int:
    """Number of output files a compaction of ``path`` should produce."""
    df = spark.read.parquet(path)
    total = _total_bytes(df)
    return max(1, (total + target_bytes - 1) // target_bytes)


def _total_bytes(df: DataFrame) -> int:
    """On-disk bytes of the table via the Hadoop FileSystem API — works
    for any URI scheme (file:, hdfs:, s3a:, abfs:), not just local paths.

    Partial stat failures EXTRAPOLATE (statted mean × total file count)
    instead of silently under-counting — an under-count would shrink the
    planned file count and produce oversized output files; all-fail raises
    rather than planning from a zero estimate. The FileSystem handle is
    resolved once (all files of one table share a scheme), so the loop is
    one py4j call per file, not three."""
    spark = df.sparkSession
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    files = df.inputFiles()
    if not files:
        return 0
    fs = jvm.org.apache.hadoop.fs.Path(files[0]).getFileSystem(hconf)
    total = 0
    statted = 0
    for f in files:
        try:
            total += fs.getFileStatus(jvm.org.apache.hadoop.fs.Path(f)).getLen()
            statted += 1
        except Exception:
            pass
    if statted == 0:
        raise IOError(
            f"could not stat any of the {len(files)} input files — refusing "
            "to plan a compaction from a zero size estimate"
        )
    if statted < len(files):
        total = int(total * len(files) / statted)
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Rewrite ``path`` into ``out_path`` with ~``target_bytes`` files.

    Returns the compacted table. Row-for-row identical content (asserted
    in tests); only the file layout changes.
    """
    df = spark.read.parquet(path)
    n = planned_file_count(spark, path, target_bytes)
    if partition_cols:
        df = df.repartition(n, *partition_cols)
    else:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
