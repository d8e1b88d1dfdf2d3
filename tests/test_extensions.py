"""Tests for the training-data extension operators: approximate methods
validated against their exact counterparts, multimodal plumbing, streaming
semantics."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
import pytest

from global_market_index_etl_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from global_market_index_etl_spark.operators.multimodal import (
    as_media_table,
    extract_features,
    resize_images,
    sample_frames,
)
from global_market_index_etl_spark.operators.similarity import (
    cosine_topk,
    lsh_cosine_topk,
)
from global_market_index_etl_spark.operators.text import language_id, quality_score
from global_market_index_etl_spark.sources import load_table
from global_market_index_etl_spark.streaming.incremental import (
    available_now_upsert,
    windowed_event_counts,
)

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMALL, "embeddings").cache()


def test_minhash_lsh_matches_exact_jaccard(spark, docs):
    """At threshold 0.8 with b=8,r=4 (P(candidate|s=0.8)≈0.986) the LSH
    pipeline must recover exactly the exact-Jaccard pair set on this data."""
    exact = {
        (r.id_1, r.id_2): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    approx = {
        (r.id_1, r.id_2): r.jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    assert set(approx) == set(exact)
    for pair, j in approx.items():
        assert j == exact[pair]  # verify stage recomputes the exact value


def test_simhash_finds_planted_neardups(spark, docs):
    pairs = simhash_near_pairs(docs, max_hamming=7)
    exact = {
        (r.id_1, r.id_2)
        for r in ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    got = {(r.id_1, r.id_2) for r in pairs.collect()}
    # SimHash is coarse; it must still see the overwhelming majority of
    # ≥0.9-Jaccard planted duplicates
    if exact:
        assert len(got & exact) / len(exact) >= 0.8


def test_ann_lsh_recall(spark, emb):
    probes = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, probes, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_cosine_topk(emb, probes, k=5, bits=6, tables=16).collect()
    }
    # random embeddings ⇒ top-5 sims ≈0.35-0.5; multi-table LSH theory gives
    # ~0.6 candidate prob there — require a sane floor, not perfection
    assert len(exact & approx) / len(exact) >= 0.3


def test_language_id_deterministic_and_total(spark, docs):
    out = language_id(docs).select("doc_id", "lang_pred")
    assert out.filter(F.col("lang_pred").isNull()).count() == 0
    assert out.count() == docs.count()


def test_quality_score_bounded(spark, docs):
    out = quality_score(docs)
    bad = out.filter(
        (F.col("quality_score") < 0.0) | (F.col("quality_score") > 1.0)
    )
    assert bad.count() == 0


def test_multimodal_feature_extraction_plumbing(spark, docs):
    media = as_media_table(
        docs.withColumn("payload", F.encode("text", "UTF-8")),
        "doc_id",
        "payload",
        "image",
    )
    feats = extract_features(media, decode_stub=True)
    rows = feats.collect()
    assert len(rows) == docs.count()
    r = rows[0]
    assert r.n_bytes > 0 and len(r.feature) == 32  # 16 bins × 2 hex chars
    # determinism: same input ⇒ same feature
    again = {x.media_id: x.feature for x in extract_features(media).collect()}
    assert all(again[x.media_id] == x.feature for x in rows)


def test_multimodal_frame_sampling_expands_rows(spark, docs):
    media = as_media_table(
        docs.withColumn("payload", F.encode("text", "UTF-8")),
        "doc_id",
        "payload",
        "video",
    )
    frames = sample_frames(media, every_n_bytes=64, max_frames=4)
    per_doc = frames.groupBy("media_id").count()
    assert per_doc.filter(F.col("count") > 1).count() > 0  # 1→N expansion
    assert frames.filter(F.col("frame_idx") >= 4).count() == 0


def test_multimodal_real_decode_is_explicit_stub(spark):
    with pytest.raises(NotImplementedError, match="PIL"):
        resize_images(None)


def test_windowed_counts_batch_equivalence(spark):
    events = load_table(spark, SF_SMALL, "events")
    out = windowed_event_counts(events, window_duration="6 hours")
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == events.count()  # batch mode: nothing late, all counted
    assert out.filter(
        F.col("window_end") <= F.col("window_start")
    ).count() == 0


def test_available_now_streaming_upsert(spark):
    """One AvailableNow tick over a parquet source dir upserts into the
    target exactly like the batch path (same code path by construction)."""
    events = load_table(spark, SF_SMALL, "events").limit(200).cache()
    state: dict[str, object] = {"df": None}

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        ckpt = os.path.join(tmp, "ckpt")
        events.write.parquet(src)
        schema = events.schema

        q = available_now_upsert(
            spark,
            src,
            schema,
            ckpt,
            target_read=lambda: state["df"],
            target_write=lambda df: state.__setitem__(
                "df", spark.createDataFrame(df.collect(), df.schema)
            ),
            key_columns=["user_id", "event_type"],
            order_column="ts",
        )
        q.awaitTermination(120)
        merged = state["df"]
        assert merged is not None
        # one survivor per key, and it is the latest ts in the batch
        expected = (
            events.groupBy("user_id", "event_type")
            .agg(F.max("ts").alias("ts"))
            .count()
        )
        assert merged.count() == expected


def test_salted_agg_matches_plain(spark):
    from global_market_index_etl_spark.functions.exact import cents
    from global_market_index_etl_spark.operators.skew import salted_sum_count

    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    salted = {
        r.event_type: (r.sum_value_cents, r.n_rows)
        for r in salted_sum_count(
            events, ["event_type"], {"sum_value_cents": cents("value")}, n_salts=16
        ).collect()
    }
    plain = {
        r.event_type: (r.s, r.n)
        for r in events.groupBy("event_type")
        .agg(F.sum(cents("value")).alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    from global_market_index_etl_spark.operators.skew import salted_join

    lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    a = salted_join(lineitem, orders, "l_orderkey", n_salts=8)
    b = lineitem.join(orders, "l_orderkey")
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_ivf_topk_exact_when_probing_all_lists(spark):
    from global_market_index_etl_spark.operators.similarity import (
        cosine_topk,
        ivf_cosine_topk,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rn)
        for r in cosine_topk(emb, probes, k=5).collect()
    }
    ivf_all = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rn)
        for r in ivf_cosine_topk(emb, probes, k=5, n_lists=8, nprobe=8).collect()
    }
    assert ivf_all == exact


def test_ivf_topk_partial_probe_recall(spark):
    from global_market_index_etl_spark.operators.similarity import (
        cosine_topk,
        ivf_cosine_topk,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, probes, k=5).collect()
    }
    part = {
        (r.query_id, r.neighbor_id)
        for r in ivf_cosine_topk(emb, probes, k=5, n_lists=8, nprobe=2).collect()
    }
    # every probe still returns a full (if approximate) top-5
    assert len(part) == len(exact)
    # scanning 1/4 of the corpus must find a nonzero share of true neighbors
    assert len(exact & part) / len(exact) > 0.1


def test_sketch_profile_error_bounds(spark):
    from global_market_index_etl_spark.plans import REGISTRY

    prof = {
        r.event_type: r
        for r in REGISTRY["sketch_event_profile"].spark(spark, SF_SMALL).collect()
    }
    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    exact = {
        r.event_type: (r.users, r.med)
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("med"),
        )
        .collect()
    }
    for etype, (users, med) in exact.items():
        row = prof[etype]
        assert abs(row.approx_users - users) / users < 0.10  # HLL rsd 2%
        q50 = row.value_quantiles[0]
        assert abs(q50 - med) <= abs(med) * 0.05 + 1e-6
        assert row.value_quantiles[0] <= row.value_quantiles[1] <= row.value_quantiles[2]


def test_rolling_fingerprint_sequence_sensitivity(spark):
    from global_market_index_etl_spark.operators.text import rolling_fingerprint

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "beta alpha gamma"),   # permutation -> different hash
            (3, "alpha beta gamma"),   # identical -> same hash
            (4, "ALPHA   beta GAMMA"), # case/ws-normalized -> same hash
            (5, ""),
        ],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fp for r in df.select(
        "doc_id", rolling_fingerprint("text").alias("fp")).collect()}
    assert fp[1] == fp[3] == fp[4]
    assert fp[1] != fp[2]
    assert fp[5] == 0  # empty word stream folds to the seed
    # partitioning-independence: same values from a repartitioned plan
    fp32 = {r.doc_id: r.fp for r in df.repartition(32).select(
        "doc_id", rolling_fingerprint("text").alias("fp")).collect()}
    assert fp == fp32


def test_connected_components_transitive_chain(spark):
    from global_market_index_etl_spark.operators.dedup import connected_components

    # chain 1-2-3-4 (diameter 3, needs multiple propagation rounds),
    # pair (10,11), singleton 20
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "id_1 long, id_2 long"
    )
    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 20]], "doc_id long"
    )
    got = {
        r.doc_id: r.canonical_id
        for r in connected_components(pairs, docs, "doc_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_deterministic_split_is_partitioning_independent(spark):
    from global_market_index_etl_spark.operators.sampling import (
        deterministic_sample,
        train_val_test_split,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    s1 = {r.doc_id: r.split for r in train_val_test_split(docs, "doc_id").collect()}
    s2 = {
        r.doc_id: r.split
        for r in train_val_test_split(docs.repartition(17), "doc_id").collect()
    }
    assert s1 == s2
    # roughly the requested proportions
    from collections import Counter

    c = Counter(s1.values())
    n = len(s1)
    assert abs(c["train"] / n - 0.8) < 0.06
    assert abs(c["val"] / n - 0.1) < 0.05
    # split stability under corpus growth: subset's splits unchanged
    sub = {r.doc_id: r.split for r in train_val_test_split(
        docs.filter(F.col("doc_id") < 100), "doc_id").collect()}
    assert all(s1[k] == v for k, v in sub.items())
    # deterministic_sample keeps the hash-stable subset
    frac = deterministic_sample(docs, "doc_id", 0.25).count() / docs.count()
    assert abs(frac - 0.25) < 0.06


def test_events_ts_range_matches_converted_filter(spark):
    from global_market_index_etl_spark.sources import (
        load_events_ts_range,
        load_table,
    )

    lo, hi = "2024-01-02T00:00:00", "2024-01-03T00:00:00"
    fast = load_events_ts_range(spark, SF_SMALL, lo, hi)
    slow = load_table(spark, SF_SMALL, "events").filter(
        (F.col("ts") >= F.lit(lo.replace("T", " ")).cast("timestamp_ntz"))
        & (F.col("ts") < F.lit(hi.replace("T", " ")).cast("timestamp_ntz"))
    )
    assert fast.count() == slow.count()
    a = {r.event_id for r in fast.select("event_id").collect()}
    b = {r.event_id for r in slow.select("event_id").collect()}
    assert a == b
    # the converted column type matches the standard loader's
    assert dict(fast.dtypes)["ts"] == dict(slow.dtypes)["ts"]
