"""Streaming SCD2 maintenance: ticks ≡ full rebuild, replay convergence.

The maintained table is the UNCOMPRESSED history (scd2.py granularity
contract — compression is lossy under out-of-order delivery); the
compressed business view is scd2_compress at read time. Both layers are
compared against full rebuilds from the complete feed.
"""

from __future__ import annotations

from global_market_index_etl_spark.operators.scd2 import (
    scd2_compress,
    scd2_from_changelog,
)
from global_market_index_etl_spark.operators.storage import read_table
from global_market_index_etl_spark.streaming.scd2_stream import scd2_stream_apply

SCHEMA = "k long, seq long, attr string"

FEED = [
    (1, 10, "a"), (1, 20, "b"), (1, 30, "b"), (1, 40, "a"),
    (2, 10, "x"), (2, 50, "y"),
    (3, 15, "m"),
]
# ticks deliver interleaved and OUT OF ORDER across keys — tick 2 ships
# (1,40,'a') while (1,20,'b')/(1,30,'b') only arrive in tick 3, the
# resurrection case compressed storage cannot survive
TICKS = [
    [FEED[0], FEED[4]],
    [FEED[3], FEED[5], FEED[6]],
    [FEED[1], FEED[2]],
]

COLS = ["k", "attr", "valid_from", "valid_to", "is_current"]


def _tick(spark, src, ckpt, table, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = scd2_stream_apply(
        spark.readStream.schema(SCHEMA).parquet(src),
        table_path=table,
        checkpoint=ckpt,
        key_cols=["k"],
        seq_col="seq",
        attr_cols=["attr"],
    )
    q.awaitTermination(180)


def _rows(df):
    return sorted(map(tuple, df.select(*COLS).collect()))


def test_streamed_ticks_equal_full_rebuild(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "scd2")
    for rows in TICKS:
        _tick(spark, src, ckpt, table, rows)
    stored = read_table(spark, table)
    full = spark.createDataFrame(FEED, SCHEMA)
    # raw layer: uncompressed history ≡ compress=False full rebuild
    assert _rows(stored) == _rows(
        scd2_from_changelog(
            full, key_cols=["k"], order_cols=["seq"], attr_cols=["attr"],
            compress=False,
        )
    )
    # business view: compressed ≡ compressed full rebuild — including the
    # a@40 version that tick 2's compression would have discarded
    assert _rows(
        scd2_compress(stored, key_cols=["k"], attr_cols=["attr"])
    ) == _rows(
        scd2_from_changelog(
            full, key_cols=["k"], order_cols=["seq"], attr_cols=["attr"]
        )
    )


def test_replay_with_fresh_checkpoint_converges(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "scd2")
    for rows in TICKS:
        _tick(spark, src, ckpt, table, rows)
    before = _rows(read_table(spark, table))
    # a fresh checkpoint re-delivers EVERY file (at-least-once, worst
    # case); the table must not change
    q = scd2_stream_apply(
        spark.readStream.schema(SCHEMA).parquet(src),
        table_path=table,
        checkpoint=str(tmp_path / "ckpt2"),
        key_cols=["k"],
        seq_col="seq",
        attr_cols=["attr"],
    )
    q.awaitTermination(180)
    assert _rows(read_table(spark, table)) == before
