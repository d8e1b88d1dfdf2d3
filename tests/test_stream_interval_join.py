"""Stream-stream interval join: batch parity + cross-micro-batch buffering.

The bucketization rewrite (operators/rangejoin.py) is what makes a pure
range join POSSIBLE between two streams — Structured Streaming's symmetric
hash join demands an equality key. These tests assert the streaming pair
set equals the batch operator's on identical rows, including when the two
sides arrive interleaved across separate files (micro-batch boundaries).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from global_market_index_etl_spark.operators.rangejoin import (
    interval_join_bucketed,
)
from global_market_index_etl_spark.streaming.joins import (
    stream_interval_join_bucketed,
)

P_SCHEMA = "pid long, p_ts timestamp"
I_SCHEMA = "iid long, i_ts timestamp"

POINTS = [
    (1, "2024-01-01 10:00:00"),  # == interval open: IN
    (2, "2024-01-01 10:29:59"),  # last second: IN
    (3, "2024-01-01 10:30:00"),  # == hi bound: OUT
    (4, "2024-01-01 11:05:00"),  # inside second interval
    (5, "2024-01-01 09:59:59"),  # before any interval
]
INTERVALS = [
    (10, "2024-01-01 10:00:00"),
    (11, "2024-01-01 10:45:00"),
]
WINDOW = 1800
EXPECTED = {(1, 10), (2, 10), (4, 11)}


def _typed(spark, rows, schema, ts):
    raw = spark.createDataFrame(
        rows, schema.replace("timestamp", "string")
    )
    return raw.select(
        *[c for c in raw.columns if c != ts],
        F.col(ts).cast("timestamp").alias(ts),
    )


def _run_stream(spark, tmp_path, p_files, i_files, one_file_per_batch=False):
    psrc, isrc = str(tmp_path / "p"), str(tmp_path / "i")
    ckpt = str(tmp_path / "ckpt")
    for chunk in p_files:
        _typed(spark, chunk, P_SCHEMA, "p_ts").coalesce(1).write.mode(
            "append"
        ).parquet(psrc)
    for chunk in i_files:
        _typed(spark, chunk, I_SCHEMA, "i_ts").coalesce(1).write.mode(
            "append"
        ).parquet(isrc)

    pairs: set[tuple[int, int]] = set()

    def handle(batch, _bid):
        pairs.update((r.pid, r.iid) for r in batch.select("pid", "iid").collect())

    def reader(schema, src):
        r = spark.readStream.schema(schema)
        if one_file_per_batch:
            r = r.option("maxFilesPerTrigger", 1)
        return r.parquet(src)

    joined = stream_interval_join_bucketed(
        reader("pid long, p_ts timestamp", psrc),
        reader("iid long, i_ts timestamp", isrc),
        point_ts_col="p_ts",
        interval_ts_col="i_ts",
        window_seconds=WINDOW,
    )
    q = (
        joined.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch(handle)
        .start()
    )
    q.awaitTermination(180)
    return pairs


def _batch_pairs(spark):
    p = _typed(spark, POINTS, P_SCHEMA, "p_ts").withColumn(
        "__pt", F.col("p_ts").cast("long")
    )
    i = _typed(spark, INTERVALS, I_SCHEMA, "i_ts").select(
        "iid",
        F.col("i_ts").cast("long").alias("__lo"),
        (F.col("i_ts").cast("long") + WINDOW).alias("__hi"),
    )
    j = interval_join_bucketed(
        p, i, ts_col="__pt", lo_col="__lo", hi_col="__hi", bucket_width=WINDOW
    )
    return {(r.pid, r.iid) for r in j.select("pid", "iid").collect()}


def test_stream_matches_batch_single_batch(spark, tmp_path):
    got = _run_stream(spark, tmp_path, [POINTS], [INTERVALS])
    assert got == EXPECTED
    assert _batch_pairs(spark) == EXPECTED


def test_stream_matches_batch_across_micro_batches(spark, tmp_path):
    """Points and intervals split across files: the symmetric join must
    buffer each side until the other's rows arrive."""
    got = _run_stream(
        spark,
        tmp_path,
        [POINTS[:2], POINTS[2:]],
        [INTERVALS[:1], INTERVALS[1:]],
        one_file_per_batch=True,
    )
    assert got == EXPECTED


def test_stream_watermark_bounds_join_state(spark, tmp_path):
    """The state-eviction contract is real and observable: the residual
    bounds both event-time columns against each other, so once the
    watermark passes, buffered join state is REMOVED (numRowsRemoved > 0
    in the state-operator metrics) under a tight watermark — state is
    bounded by rate × (watermark + window), not stream length. Under a
    generous watermark nothing is evicted and the late-arriving point
    still matches (the guaranteed-delivery side of the contract, and the
    reason the driver row sets its watermark past the fixture span when
    files are split by id rather than time). Spark only *guarantees*
    delivery within the watermark — too-late rows MAY still match if
    their partner's state has not yet been cleaned — so this asserts the
    eviction metric, not a drop."""
    late_point = [(99, "2024-01-01 10:10:00")]  # inside interval 10
    # batch 1 advances the watermark far ahead; batch 2 delivers the
    # late point whose event time is ~30 days behind it
    ahead = [(50, "2024-02-01 00:00:00")]

    def run(watermark):
        import shutil

        root = tmp_path / f"wm_{watermark.replace(' ', '_')}"
        shutil.rmtree(root, ignore_errors=True)
        psrc, isrc, ckpt = str(root / "p"), str(root / "i"), str(root / "c")
        for chunk in (ahead, late_point):
            _typed(spark, chunk, P_SCHEMA, "p_ts").coalesce(1).write.mode(
                "append"
            ).parquet(psrc)
        _typed(spark, INTERVALS, I_SCHEMA, "i_ts").coalesce(1).write.mode(
            "append"
        ).parquet(isrc)
        pairs: set[tuple[int, int]] = set()

        def handle(batch, _bid):
            pairs.update(
                (r.pid, r.iid) for r in batch.select("pid", "iid").collect()
            )

        joined = stream_interval_join_bucketed(
            spark.readStream.schema("pid long, p_ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(psrc),
            spark.readStream.schema("iid long, i_ts timestamp").parquet(isrc),
            point_ts_col="p_ts",
            interval_ts_col="i_ts",
            window_seconds=WINDOW,
            watermark=watermark,
        )
        q = (
            joined.writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .foreachBatch(handle)
            .start()
        )
        q.awaitTermination(180)
        removed = sum(
            s["numRowsRemoved"]
            for p in q.recentProgress
            for s in (p.get("stateOperators") or [])
        )
        return pairs, removed

    pairs_generous, removed_generous = run("90 days")
    assert pairs_generous == {(99, 10)}  # within watermark: must match
    assert removed_generous == 0  # nothing past a 90-day horizon
    _, removed_tight = run("1 minute")
    assert removed_tight > 0, (
        "tight watermark never evicted join state — the state bound is "
        "not operating"
    )


def test_stream_fractional_second_interval_open_not_dropped(spark, tmp_path):
    """Sub-second interval opens must not lose last-fractional-second
    matches (round-11 advice): CAST(ts AS BIGINT) truncates fractions, so
    with the old `+ window - 1` upper bound an interval opening at
    10:00:00.250 (whole-second part ≡ 0 mod bucket) never exploded to the
    bucket holding a valid point at 10:30:00.100 — the pair silently
    vanished. The upper bound now over-covers by one bucket and the exact
    residual keeps the semantics: p_ts ∈ [i_ts, i_ts + window)."""
    # epoch-double construction: fractional timestamps independent of the
    # session timezone's parse rules; 1704103200 ≡ 0 (mod 1800)
    i_open = 1704103200.250
    p_in = i_open + WINDOW - 0.150  # 10:30:00.100 — inside, last frac sec
    p_out = i_open + WINDOW + 0.050  # past the half-open end — out
    psrc, isrc, ckpt = (
        str(tmp_path / "p"), str(tmp_path / "i"), str(tmp_path / "c")
    )
    spark.createDataFrame(
        [(1, p_in), (2, p_out)], "pid long, e double"
    ).select("pid", F.col("e").cast("timestamp").alias("p_ts")).coalesce(
        1
    ).write.parquet(psrc)
    spark.createDataFrame([(10, i_open)], "iid long, e double").select(
        "iid", F.col("e").cast("timestamp").alias("i_ts")
    ).coalesce(1).write.parquet(isrc)

    pairs: set[tuple[int, int]] = set()

    def handle(batch, _bid):
        pairs.update(
            (r.pid, r.iid) for r in batch.select("pid", "iid").collect()
        )

    joined = stream_interval_join_bucketed(
        spark.readStream.schema("pid long, p_ts timestamp").parquet(psrc),
        spark.readStream.schema("iid long, i_ts timestamp").parquet(isrc),
        point_ts_col="p_ts",
        interval_ts_col="i_ts",
        window_seconds=WINDOW,
    )
    q = (
        joined.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch(handle)
        .start()
    )
    q.awaitTermination(180)
    assert pairs == {(1, 10)}


def test_stream_rejects_overlapping_or_equal_columns(spark):
    import pytest

    df = _typed(spark, POINTS, P_SCHEMA, "p_ts")
    with pytest.raises(ValueError):
        stream_interval_join_bucketed(
            df, df, point_ts_col="p_ts", interval_ts_col="p_ts",
            window_seconds=60,
        )
