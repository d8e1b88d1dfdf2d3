"""applyInPandasWithState: per-key state across batches and across
separate availableNow runs (checkpoint-resumed cron ticks)."""

from __future__ import annotations

from global_market_index_etl_spark.streaming.stateful import running_user_totals

SCHEMA = "user_id long, value double"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        path
    )


def _drain(spark, src, ckpt):
    """One availableNow tick; results gathered via foreachBatch (the only
    sink mode that supports checkpoint recovery for this query shape)."""
    collected: dict[int, tuple[int, float]] = {}

    def handle(batch, batch_id):
        for r in batch.collect():
            collected[r.user_id] = (r.n_events, r.total_value)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        running_user_totals(stream)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch(handle)
        .start()
    )
    q.awaitTermination(120)
    return collected


def test_state_accumulates_across_available_now_runs(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, src, [(1, 10.0), (1, 5.0), (2, 1.0)])
    first = _drain(spark, src, ckpt)
    assert first[1] == (2, 15.0)
    assert first[2] == (1, 1.0)

    # next "cron tick": new files only; state resumes from the checkpoint
    _write_batch(spark, src, [(1, 2.5), (3, 7.0)])
    second = _drain(spark, src, ckpt)
    assert second[1] == (3, 17.5)  # cumulative across BOTH runs
    assert second[3] == (1, 7.0)
    assert 2 not in second  # untouched key emits nothing this tick
