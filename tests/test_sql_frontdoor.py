"""E3 — ad-hoc SQL as the user-facing query path (SURVEY.md §3 E3).

The reference delegates ad-hoc SQL to Postgres; here ``spark.sql`` over the
registered views IS the query processor. The documented Q1-Q3 queries run
verbatim-shaped SQL and must agree with the DataFrame declarations.
"""

from __future__ import annotations

from global_market_index_etl_spark.plans import REGISTRY
from global_market_index_etl_spark.sources import register_views

from .conftest import SF_SMALL


def test_sql_frontdoor_matches_dataframe_queries(spark):
    register_views(spark, SF_SMALL)
    pairs = {
        # README.md:322-331 (Q1 shape)
        "q1_top5_recent": """
            SELECT o_orderkey, o_orderdate, o_totalprice
            FROM orders WHERE o_custkey = 42
            ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 5
        """,
        # README.md:350-357 (Q3 shape)
        "q3_catalog": """
            SELECT n_nationkey, n_name, r_name
            FROM nation JOIN region ON n_regionkey = r_regionkey
            ORDER BY n_name
        """,
    }
    for name, sql in pairs.items():
        via_sql = spark.sql(sql)
        via_df = REGISTRY[name].spark(spark, SF_SMALL)
        assert sorted(map(tuple, via_sql.collect())) == sorted(
            map(tuple, via_df.collect())
        ), name


def test_sql_frontdoor_window_query(spark):
    register_views(spark, SF_SMALL)
    out = spark.sql(
        """
        SELECT event_type, ts, value,
               avg(value) OVER (PARTITION BY event_type ORDER BY ts
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mavg
        FROM events LIMIT 10
        """
    )
    assert out.count() == 10
    assert set(out.columns) == {"event_type", "ts", "value", "mavg"}
