"""applyInPandasWithState: per-key state across batches and across
separate availableNow runs (checkpoint-resumed cron ticks)."""

from __future__ import annotations

import pyspark.sql.functions as F

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


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark under availableNow: in-horizon
    re-deliveries are dropped; the batch twin dedups plainly."""
    import pyspark.sql.functions as F

    from global_market_index_etl_spark.streaming.incremental import (
        stream_dedup_within_watermark,
    )

    schema = "event_id long, ts timestamp, value double"
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        (1, "2024-01-01 10:00:00", 1.0),
        (1, "2024-01-01 10:00:05", 1.0),  # redelivery, in horizon -> dropped
        (2, "2024-01-01 10:01:00", 2.0),
        (3, "2024-01-01 10:02:00", 3.0),
        (3, "2024-01-01 10:02:00", 3.0),  # exact duplicate -> dropped
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, value double"
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    df.coalesce(1).write.mode("overwrite").parquet(src)

    got: list[int] = []

    def handle(batch, batch_id):
        got.extend(r.event_id for r in batch.collect())

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        stream_dedup_within_watermark(stream, ["event_id"], watermark="1 hour")
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch(handle)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got) == [1, 2, 3]

    # batch twin: same keyed-dedup survivor set
    batch_out = stream_dedup_within_watermark(
        spark.read.parquet(src), ["event_id"], watermark="1 hour"
    )
    assert sorted(r.event_id for r in batch_out.collect()) == [1, 2, 3]


def test_streaming_minhash_dedup_matches_batch(spark, tmp_path):
    """Two availableNow ticks through the streaming curation loop must
    reproduce exactly the full-corpus batch pair set: tick 1 bootstraps
    the persisted index from batch-1 docs (internal pairs), tick 2 dedups
    batch-2 against that index and folds it in — the streaming twin of
    test_incremental_minhash_matches_full_corpus."""
    from global_market_index_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from global_market_index_etl_spark.sources.tables import load_table
    from global_market_index_etl_spark.streaming.incremental import (
        streaming_minhash_dedup,
    )

    from .conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)

    src = str(tmp_path / "src")
    args = dict(
        source_dir=src,
        schema=docs.schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
        index_dir=str(tmp_path / "index"),
        pairs_dir=str(tmp_path / "pairs"),
    )

    b1.coalesce(1).write.mode("append").parquet(src)
    streaming_minhash_dedup(spark, **args).awaitTermination(120)
    b2.coalesce(1).write.mode("append").parquet(src)
    streaming_minhash_dedup(spark, **args).awaitTermination(120)

    got = {
        (r.id_1, r.id_2): r.jaccard
        for r in spark.read.parquet(args["pairs_dir"]).collect()
    }
    full = {
        (r.id_1, r.id_2): r.jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    assert got == full and len(full) > 0

    # the folded index now covers the whole corpus: one more tick with no
    # new files must be a no-op (no new pairs directory entries)
    n_batches = len(got)
    streaming_minhash_dedup(spark, **args).awaitTermination(120)
    again = {
        (r.id_1, r.id_2): r.jaccard
        for r in spark.read.parquet(args["pairs_dir"]).collect()
    }
    assert again == got, n_batches


def test_prior_index_read_excludes_current_batch(spark, tmp_path):
    """The stored-index read for batch N must exclude N's own committed
    delta (a foreachBatch retry otherwise sees its docs on both sides of
    the dedup join and duplicates pair rows), and index absence must come
    from an explicit FS listing, not a swallowed read error."""
    from global_market_index_etl_spark.streaming.incremental import (
        _read_prior_index,
    )

    root = str(tmp_path / "bands")
    # no directory at all → true first batch
    assert _read_prior_index(spark, root, 0, ["doc_id"]) is None

    spark.range(3).withColumnRenamed("id", "doc_id").write.parquet(
        f"{root}/batch=0"
    )
    spark.range(3, 5).withColumnRenamed("id", "doc_id").write.parquet(
        f"{root}/batch=1"
    )
    # retry of batch 1: must see ONLY batch 0's rows
    prior = _read_prior_index(spark, root, 1, ["doc_id"])
    assert sorted(r.doc_id for r in prior.collect()) == [0, 1, 2]
    # next batch (2): sees both committed deltas
    both = _read_prior_index(spark, root, 2, ["doc_id"])
    assert sorted(r.doc_id for r in both.collect()) == [0, 1, 2, 3, 4]
    # only batch 1's own delta on disk and batch 1 retries → first-batch path
    assert _read_prior_index(spark, str(tmp_path / "b2"), 7, ["doc_id"]) is None
    spark.range(2).withColumnRenamed("id", "doc_id").write.parquet(
        str(tmp_path / "b2") + "/batch=7"
    )
    assert _read_prior_index(spark, str(tmp_path / "b2"), 7, ["doc_id"]) is None


def test_streaming_minhash_retry_is_idempotent(spark, tmp_path):
    """Replaying a completed tick's foreachBatch body (same batch id) must
    regenerate exactly the pairs already on disk for that batch — the
    crash-after-write/before-checkpoint-commit case."""
    from global_market_index_etl_spark.operators.dedup import (
        incremental_minhash_pairs,
    )
    from global_market_index_etl_spark.sources.tables import load_table
    from global_market_index_etl_spark.streaming.incremental import (
        _read_prior_index,
        streaming_minhash_dedup,
    )

    from .conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)

    src = str(tmp_path / "src")
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    args = dict(
        source_dir=src,
        schema=docs.schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
        index_dir=index_dir,
        pairs_dir=pairs_dir,
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    streaming_minhash_dedup(spark, **args).awaitTermination(120)
    b2.coalesce(1).write.mode("append").parquet(src)
    streaming_minhash_dedup(spark, **args).awaitTermination(120)

    committed = {
        (r.id_1, r.id_2): r.jaccard
        for r in spark.read.parquet(f"{pairs_dir}/batch=1").collect()
    }
    # replay tick 2's body: the prior-index read must skip batch=1's own
    # delta, so the recomputed pairs equal the committed delta exactly
    stored_bands = _read_prior_index(
        spark, f"{index_dir}/bands", 1, ["doc_id", "band", "bucket"]
    )
    stored_arrays = _read_prior_index(
        spark, f"{index_dir}/arrays", 1, ["doc_id", "__sh"]
    )
    replay, _, _ = incremental_minhash_pairs(
        b2, stored_bands, stored_arrays, threshold=0.8
    )
    replayed = {(r.id_1, r.id_2): r.jaccard for r in replay.collect()}
    assert replayed == committed and len(committed) > 0


def test_streaming_decontaminate_matches_batch(spark, tmp_path):
    """Two availableNow ticks of ingestion-time decontamination must
    reproduce the batch operator's split exactly: clean ∪ quarantined =
    all docs, clean set ≡ batch decontaminate over the same rows, and
    quarantined rows carry their hit counts."""
    from global_market_index_etl_spark.operators.decontaminate import (
        decontaminate,
    )
    from global_market_index_etl_spark.sources.tables import load_table
    from global_market_index_etl_spark.streaming.incremental import (
        streaming_decontaminate,
    )

    from .conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    # eval set = a slice of the corpus itself → guaranteed contamination
    eval_df = docs.filter(F.col("doc_id") % 10 == 3).select("text")

    src = str(tmp_path / "src")
    args = dict(
        source_dir=src,
        schema=docs.schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
        eval_df=eval_df,
        clean_dir=str(tmp_path / "clean"),
        quarantine_dir=str(tmp_path / "quar"),
    )
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    b1.coalesce(1).write.mode("append").parquet(src)
    streaming_decontaminate(spark, **args).awaitTermination(120)
    b2.coalesce(1).write.mode("append").parquet(src)
    streaming_decontaminate(spark, **args).awaitTermination(120)

    clean = {r.doc_id for r in spark.read.parquet(args["clean_dir"]).collect()}
    quar = spark.read.parquet(args["quarantine_dir"]).collect()
    quar_ids = {r.doc_id for r in quar}
    all_ids = {r.doc_id for r in docs.collect()}
    assert clean | quar_ids == all_ids and not (clean & quar_ids)
    batch_clean = {
        r.doc_id for r in decontaminate(docs, eval_df).collect()
    }
    assert clean == batch_clean
    assert quar and all(r.n_hits >= 1 for r in quar)


def test_streaming_embedding_neardup_matches_batch(spark, tmp_path):
    """Two availableNow ticks of streaming embedding dedup must reproduce
    the batch LSH pair set over the union — including planted duplicate
    pairs that STRADDLE the batch boundary (found only via the persisted
    index)."""
    from global_market_index_etl_spark.operators.similarity import (
        embedding_neardup_pairs_lsh,
    )
    from global_market_index_etl_spark.sources.tables import load_table
    from global_market_index_etl_spark.streaming.incremental import (
        streaming_embedding_neardup,
    )

    from .conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", "embedding"
    )
    # plant cross-batch duplicates: copies of even-id vectors under odd ids
    copies = (
        emb.filter(F.col("vec_id") % 2 == 0)
        .limit(5)
        .select((F.col("vec_id") + 100001).alias("vec_id"), "embedding")
    )
    full = emb.unionByName(copies)
    b1 = full.filter(F.col("vec_id") % 2 == 0)
    b2 = full.filter(F.col("vec_id") % 2 == 1)  # copies land here

    src = str(tmp_path / "src")
    args = dict(
        source_dir=src,
        schema=full.schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
        index_dir=str(tmp_path / "index"),
        pairs_dir=str(tmp_path / "pairs"),
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    streaming_embedding_neardup(spark, **args).awaitTermination(120)
    b2.coalesce(1).write.mode("append").parquet(src)
    streaming_embedding_neardup(spark, **args).awaitTermination(120)

    got = {
        (r.id_1, r.id_2, r.cos_sim)
        for r in spark.read.parquet(args["pairs_dir"]).collect()
    }
    expect = {
        (r.id_1, r.id_2, r.cos_sim)
        for r in embedding_neardup_pairs_lsh(
            full, threshold=0.95, bits=8, tables=32
        ).collect()
    }
    assert got == expect
    # the planted cross-batch pairs were actually found
    assert sum(1 for a, b, _ in got if b > 100000) >= 5


def test_streaming_phash_dedup_matches_batch(spark, tmp_path):
    """Two availableNow ticks through the IMAGE streaming dedup loop must
    reproduce exactly the full-corpus pHash pair set: tick 1 bootstraps
    the persisted signature index, tick 2 hashes only batch 2 and joins
    it against stored 8-byte signatures — the pHash twin of
    test_streaming_minhash_dedup_matches_batch."""
    from global_market_index_etl_spark.operators.phash import (
        phash_near_pairs,
    )
    from global_market_index_etl_spark.plans.textdata import (
        _phash_corpus_media,
    )
    from global_market_index_etl_spark.streaming.incremental import (
        streaming_phash_dedup,
    )

    from .conftest import SF_SMALL

    media = _phash_corpus_media(spark, SF_SMALL)
    b1 = media.filter(F.col("media_id") % 2 == 0)
    b2 = media.filter(F.col("media_id") % 2 == 1)

    src = str(tmp_path / "src")
    args = dict(
        source_dir=src,
        schema=media.schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
        index_dir=str(tmp_path / "index"),
        pairs_dir=str(tmp_path / "pairs"),
        payload_col="img",
    )

    b1.coalesce(1).write.mode("append").parquet(src)
    streaming_phash_dedup(spark, **args).awaitTermination(120)
    b2.coalesce(1).write.mode("append").parquet(src)
    streaming_phash_dedup(spark, **args).awaitTermination(120)

    got = {
        (r.id_1, r.id_2): r.hamming
        for r in spark.read.parquet(args["pairs_dir"]).collect()
    }
    full = {
        (r.id_1, r.id_2): r.hamming
        for r in phash_near_pairs(media, payload_col="img").collect()
    }
    assert got == full and len(full) > 0

    # no new files → a further tick must be a no-op
    streaming_phash_dedup(spark, **args).awaitTermination(120)
    again = {
        (r.id_1, r.id_2): r.hamming
        for r in spark.read.parquet(args["pairs_dir"]).collect()
    }
    assert again == got


def test_await_drain_raises_on_timeout_and_stops_query():
    """Round-11 advice (medium): an availableNow drain that exceeds its
    deadline must RAISE — falling through would cache a partially-written
    sink per (process, sf) and every later bench rep / driver check would
    silently read incomplete output. The query is stopped before raising
    so no zombie stream keeps writing."""
    import pytest

    from global_market_index_etl_spark.plans.analytics import _await_drain

    class _Hung:
        def __init__(self):
            self.stopped = False

        def awaitTermination(self, timeout):
            return False  # still running at the deadline

        def stop(self):
            self.stopped = True

    q = _Hung()
    with pytest.raises(TimeoutError, match="did not finish"):
        _await_drain(q, what="unit-test drain", timeout_s=1)
    assert q.stopped

    class _Done:
        def awaitTermination(self, timeout):
            return True

    _await_drain(_Done(), what="finished drain", timeout_s=1)  # no raise
