"""JDBC adapter tests — LIVE against embedded Apache Derby.

PostgreSQL ships no JDBC JAR in this container, but Spark bundles Derby
(for the Hive metastore), and Derby's embedded driver is a real JDBC
database in the same JVM — so the round-trip, parallel partitioned read,
and append semantics run for real here, not as a skip. The argument-
validation tests exercise the wrapper contract without a connection.
"""

from __future__ import annotations

import pytest

from global_market_index_etl_spark.sources.jdbc import read_jdbc, write_jdbc

from .conftest import SF_SMALL


def test_partitioned_read_requires_bounds(spark):
    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc(
            spark,
            "jdbc:sqlite:/tmp/none.db",
            "t",
            partition_column="id",
        )


def test_write_rejects_overwrite(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="append"):
        write_jdbc(df, "jdbc:sqlite:/tmp/none.db", "t", mode="overwrite")


def test_jdbc_roundtrip_live_derby(spark, tmp_path):
    """Write a dimension to a real JDBC database and read it back —
    the reference's write-then-verify cycle (postgres_writer.py:368-377)
    against Derby embedded. Values, not just counts."""
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    src = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    write_jdbc(src, url, "nation")
    back = read_jdbc(spark, url, "nation")
    assert sorted(back.columns) == sorted(src.columns)
    want = {
        (r.n_nationkey, r.n_name, r.n_regionkey) for r in src.collect()
    }
    got = {
        (r.n_nationkey, r.n_name, r.n_regionkey) for r in back.collect()
    }
    assert got == want


def test_jdbc_partitioned_parallel_read(spark, tmp_path):
    """The scale path: a range-partitioned read issues one bounded query
    per partition instead of a single-connection full scan."""
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    src = spark.read.parquet(f"{SF_SMALL}/customer.parquet").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    write_jdbc(src, url, "customer")
    bounds = src.agg({"c_custkey": "min"}).collect()[0][0], src.agg(
        {"c_custkey": "max"}
    ).collect()[0][0]
    back = read_jdbc(
        spark,
        url,
        "customer",
        partition_column="c_custkey",
        lower_bound=int(bounds[0]),
        upper_bound=int(bounds[1]),
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == src.count()
    assert {r.c_custkey for r in back.collect()} == {
        r.c_custkey for r in src.collect()
    }


def test_jdbc_append_is_append(spark, tmp_path):
    """Two appends of the same batch yield 2x rows — the documented
    contract that idempotency lives database-side (ON CONFLICT) or in
    the relational upsert BEFORE the write, never silently in the
    adapter."""
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    src = spark.read.parquet(f"{SF_SMALL}/region.parquet")
    write_jdbc(src, url, "region")
    write_jdbc(src, url, "region")
    assert read_jdbc(spark, url, "region").count() == 2 * src.count()
