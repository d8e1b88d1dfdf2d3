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


def test_subsecond_boundary_gaps_match_both_oracles(spark):
    """Round-12 sf0.1 soak regression class: every fixture event carries a
    sub-second timestamp, and DuckDB's epoch()::BIGINT ROUNDS where
    Spark's timestamp→long cast FLOORS — one boundary gap at sf0.1 made
    w_sessionize's oracle mint an extra session. Pin both formulations
    against in-memory DuckDB on planted fractional boundary gaps:
    w_sessionize (whole-second floor semantics on BOTH engines) and the
    native session_window (microsecond-exact strictly-greater split)."""
    import duckdb

    from global_market_index_etl_spark.plans import REGISTRY

    rows = []
    eid = 0
    # pairs straddling the 6h boundary with adversarial fractions:
    # gap 21600.4s with .3/.7 fractions (floor diff 21600 = merge;
    # round diff 21601 would split — the caught divergence), gap
    # 21599.6s rounding up to 21600, exact 21600.0, and 21600.5
    for base_frac, gap_s in [
        (0.3, 21600.4),
        (0.9, 21599.6),
        (0.0, 21600.0),
        (0.25, 21600.5),
        (0.6, 21601.2),
    ]:
        uid = len(rows) * 100 + 1
        t0 = 1704067200.0 + base_frac
        for t in (t0, t0 + gap_s):
            rows.append((eid, uid, t))
            eid += 1
    df = spark.createDataFrame(
        [
            (e, u, __import__("datetime").datetime.utcfromtimestamp(t), 1.0)
            for e, u, t in rows
        ],
        "event_id long, user_id long, ts timestamp_ntz, value double",
    )
    df.createOrReplaceTempView("events")

    con = duckdb.connect()
    con.register(
        "events_pd", df.toPandas()
    )
    con.execute("CREATE VIEW events AS SELECT * FROM events_pd")
    for name in ("w_sessionize", "w_session_window_native"):
        qd = REGISTRY[name]
        import types

        # run the registry plan against the in-memory view by monkey
        # substitution: both plans only read `events`
        import global_market_index_etl_spark.sources as S

        orig = S.load_table
        try:
            S.load_table = lambda sp, sf, t, _df=df: _df
            import global_market_index_etl_spark.plans.analytics as A

            orig_a = A.load_table
            A.load_table = S.load_table
            sdf = qd.spark(spark, "unused").toPandas()
        finally:
            S.load_table = orig
            A.load_table = orig_a
        odf = con.execute(qd.oracle).fetchdf()
        cols = sorted(sdf.columns)
        assert len(sdf) == len(odf), (name, len(sdf), len(odf))
        got = sorted(tuple(map(str, r)) for r in sdf[cols].itertuples(index=False))
        want = sorted(tuple(map(str, r)) for r in odf[cols].itertuples(index=False))
        assert got == want, (name, got[:3], want[:3])
    con.close()
