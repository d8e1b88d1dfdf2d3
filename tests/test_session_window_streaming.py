"""Native session_window sessionization: stream ≡ batch, boundary pinned,
and state-bounded emission under the watermark."""

from __future__ import annotations

import pyspark.sql.functions as F

from global_market_index_etl_spark.streaming.sessions import sessionize_stream

SCHEMA = "user_id long, ts timestamp, value double"


def _df(spark, rows):
    raw = spark.createDataFrame(rows, "user_id long, ts string, value double")
    return raw.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )


ROWS = [
    # user 1: two sessions separated by > 6h
    (1, "2024-01-01 00:00:00", 1.0),
    (1, "2024-01-01 01:00:00", 2.0),
    (1, "2024-01-01 09:00:00", 4.0),   # 8h after previous → new session
    (1, "2024-01-01 09:30:00", 8.0),
    # user 2: one session
    (2, "2024-01-01 05:00:00", 16.0),
    # flush row: far future, advances the watermark past everything above
    (99, "2024-02-01 00:00:00", 0.0),
]

EXPECTED = {
    (1, "2024-01-01 00:00:00", "2024-01-01 01:00:00", 2, 3.0),
    (1, "2024-01-01 09:00:00", "2024-01-01 09:30:00", 2, 12.0),
    (2, "2024-01-01 05:00:00", "2024-01-01 05:00:00", 1, 16.0),
}


def _keyed(rows):
    return {
        (
            r.user_id,
            r.session_start.strftime("%Y-%m-%d %H:%M:%S"),
            r.session_end.strftime("%Y-%m-%d %H:%M:%S"),
            r.n_events,
            r.total_value,
        )
        for r in rows
        if r.user_id != 99
    }


def test_batch_twin_sessions(spark):
    got = _keyed(sessionize_stream(_df(spark, ROWS)).collect())
    assert got == EXPECTED


def test_streaming_sessions_match_batch(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    # two files → the flush row arrives in a later batch, advancing the
    # watermark so the earlier sessions close and emit
    _df(spark, ROWS[:-1]).coalesce(1).write.mode("append").parquet(src)
    _df(spark, ROWS[-1:]).coalesce(1).write.mode("append").parquet(src)

    out = []

    def handle(batch, _bid):
        out.extend(batch.collect())

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch(handle)
        .start()
    )
    q.awaitTermination(180)
    assert _keyed(out) == EXPECTED


def test_exact_gap_boundary_semantics(spark):
    """An event at exactly last_ts + gap MERGES under session_window
    (inclusive bound) — the same rule as w_sessionize, which breaks only
    when the gap EXCEEDS the threshold; one second past it splits."""
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 06:00:00", 2.0),  # exactly the 6h gap → merges
    ]
    assert len(sessionize_stream(_df(spark, rows)).collect()) == 1
    rows2 = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 06:00:01", 2.0),  # one past the gap → splits
    ]
    assert len(sessionize_stream(_df(spark, rows2)).collect()) == 2
