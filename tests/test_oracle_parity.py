"""Differential tests: every SQL-expressible declared query vs its DuckDB
oracle — the same comparison the driver performs (CORRECTNESS_r{N}.json),
run here at sf0.001 for fast iteration (set SPARK_GRAFT_TEST_SF to raise).

Values are compared exactly (float_rtol=0): the engine's declared queries
are designed to be bit-deterministic across engines (integer-scaled money
sums, per-row IEEE arithmetic, rounded+tie-broken rankings).
"""

from __future__ import annotations

import pytest

from global_market_index_etl_spark.plans import REGISTRY

from .conftest import SF_SMALL, assert_matches_oracle

SQL_CHECKED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(spark, name):
    qd = REGISTRY[name]
    assert_matches_oracle(spark, name, qd.spark, qd.oracle, SF_SMALL)


def test_all_queries_return_dataframes(spark):
    """Rows-only queries (no oracle) still execute and have stable schemas."""
    for name, qd in REGISTRY.items():
        if qd.oracle is None:
            df = qd.spark(spark, SF_SMALL)
            assert df.columns, f"{name}: empty schema"
            df.limit(5).collect()
