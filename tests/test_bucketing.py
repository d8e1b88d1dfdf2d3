"""Bucketed co-located joins: correctness + the no-Exchange plan property."""

from __future__ import annotations

import pyspark.sql.functions as F

from global_market_index_etl_spark.operators.bucketing import (
    co_located_join,
    write_bucketed,
)

from .conftest import SF_SMALL


def _explain(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bucketed_join_is_exchange_free_and_correct(spark, tmp_path):
    lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_totalprice"
    )
    write_bucketed(
        lineitem, "b_lineitem", str(tmp_path / "l"), ["l_orderkey"], 8
    )
    write_bucketed(orders, "b_orders", str(tmp_path / "o"), ["l_orderkey"], 8)
    try:
        # force a merge join (small fixture would auto-broadcast, which
        # makes the planner skip bucketed scans entirely); at real scale
        # SMJ is what the planner picks on its own for big-big
        joined = (
            spark.table("b_lineitem")
            .hint("merge")
            .join(spark.table("b_orders"), "l_orderkey")
        )
        plan = _explain(joined)
        # both sides co-bucketed on the join key: no shuffle anywhere
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # correctness vs the plain (shuffling) join
        plain = lineitem.join(orders, "l_orderkey")
        assert joined.count() == plain.count()
        assert joined.exceptAll(plain).count() == 0

        # aggregation on the bucket key also skips its exchange
        agg = (
            spark.table("b_lineitem")
            .groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert "Exchange hashpartitioning" not in _explain(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_mismatched_buckets_fall_back_to_shuffle(spark, tmp_path):
    a = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    b = a.select(F.col("o_orderkey"), F.col("o_totalprice").alias("p2"))
    write_bucketed(a, "bm_a", str(tmp_path / "a"), ["o_orderkey"], 8)
    write_bucketed(b, "bm_b", str(tmp_path / "b"), ["o_orderkey"], 4)
    try:
        joined = co_located_join(spark, "bm_a", "bm_b", "o_orderkey")
        # different bucket counts: at least one side must exchange (or the
        # planner repartitions one side to match) — plan still correct
        assert joined.count() == a.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bm_a")
        spark.sql("DROP TABLE IF EXISTS bm_b")
