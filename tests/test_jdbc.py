"""JDBC adapter tests — driver-JAR-gated.

No JDBC driver ships in this container, so the round-trip test skips
itself unless one is on the Spark classpath; the argument-validation tests
run everywhere (they exercise the wrapper contract without a connection).
"""

from __future__ import annotations

import pytest

from global_market_index_etl_spark.sources.jdbc import read_jdbc, write_jdbc

from .conftest import SF_SMALL


def _has_jdbc_driver(spark) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.sqlite.JDBC")
        return True
    except Exception:
        return False


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


def test_jdbc_roundtrip_when_driver_present(spark, tmp_path):
    if not _has_jdbc_driver(spark):
        pytest.skip(
            "no JDBC driver JAR on the classpath in this container — "
            "wrapper API validated structurally; round-trip needs a driver"
        )
    url = f"jdbc:sqlite:{tmp_path}/t.db"
    src = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    write_jdbc(src, url, "nation")
    back = read_jdbc(spark, url, "nation")
    assert back.count() == src.count()
    assert sorted(back.columns) == sorted(src.columns)
