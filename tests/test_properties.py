"""Property-based tests (hypothesis): algebraic invariants that must hold
for ANY data, not just the fixtures — upsert idempotency/LWW, salted
aggregation equivalence, unpivot row conservation, dedup survivorship.

Strategy sizes are kept small: each example pays Spark job latency, so we
want many shapes, not many rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from global_market_index_etl_spark.operators.skew import (
    salted_join,
    salted_sum_count,
)
from global_market_index_etl_spark.operators.upsert import dedup_keyed, upsert

KEYS = st.sampled_from(["a", "b", "c", "d"])
ROWS = st.lists(
    st.tuples(KEYS, st.integers(0, 3), st.integers(-1000, 1000)),
    min_size=0,
    max_size=24,
)

PROP_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows, batch):
    return spark.createDataFrame(
        [(k, t, v, batch) for k, t, v in rows], "k string, t int, v long, b int"
    )


@given(base=ROWS, upd=ROWS)
@PROP_SETTINGS
def test_upsert_idempotent_and_lww(spark, base, upd):
    tgt = dedup_keyed(_df(spark, base, 1), ["k", "t"], [F.col("b").desc()])
    merged = upsert(tgt, _df(spark, upd, 2), ["k", "t"], "b")
    again = upsert(merged, _df(spark, upd, 2), ["k", "t"], "b")
    # idempotent: re-applying the same batch changes nothing
    assert merged.exceptAll(again).count() == 0
    assert again.exceptAll(merged).count() == 0
    # LWW: every key present in upd must carry upd's value
    got = {(r.k, r.t): (r.v, r.b) for r in merged.collect()}
    latest_upd = {}
    for k, t, v in upd:
        latest_upd[(k, t)] = v
    for key in latest_upd:
        assert got[key][1] == 2  # survivor comes from the newer batch
    # keys only in base survive untouched
    upd_keys = set(latest_upd)
    for k, t, v in base:
        if (k, t) not in upd_keys:
            assert got[(k, t)][1] == 1


@given(rows=ROWS)
@PROP_SETTINGS
def test_salted_agg_equals_plain_agg(spark, rows):
    df = _df(spark, rows, 1)
    salted = {
        r.k: (r.s, r.n_rows)
        for r in salted_sum_count(df, ["k"], {"s": F.col("v")}, n_salts=4).collect()
    }
    plain = {
        r.k: (r.s, r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert salted == plain


@given(rows=ROWS, dim=st.lists(st.tuples(KEYS, st.integers(0, 9)), max_size=6))
@PROP_SETTINGS
def test_salted_join_equals_plain_join(spark, rows, dim):
    big = _df(spark, rows, 1)
    small = spark.createDataFrame(
        list({(k,): None for k, _ in dim}.keys()) or [("zz",)], "k string"
    ).withColumn("d", F.length("k"))
    a = salted_join(big, small, "k", n_salts=4)
    b = big.join(small, "k")
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0


@given(rows=ROWS)
@PROP_SETTINGS
def test_dedup_keyed_one_survivor_per_key(spark, rows):
    df = _df(spark, rows, 1)
    out = dedup_keyed(df, ["k", "t"], [F.col("v").desc()])
    keys = [(r.k, r.t) for r in out.collect()]
    assert len(keys) == len(set(keys))
    assert set(keys) == {(k, t) for k, t, _ in rows}
