"""Degenerate-input hardening: empty tables, single-row corpora, all-null
columns — the shapes that appear at the tail of real partitioned data
(an empty date partition, a filtered-out shard) and must not crash."""

from __future__ import annotations

import pyspark.sql.functions as F

from global_market_index_etl_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from global_market_index_etl_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
)
from global_market_index_etl_spark.operators.skew import salted_join, salted_sum_count
from global_market_index_etl_spark.operators.upsert import upsert

DOCS = "doc_id long, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS)


def test_dedup_operators_on_empty_input(spark):
    empty = _docs(spark, [])
    assert exact_dedup(empty).count() == 0
    assert ngram_jaccard_pairs(empty).count() == 0
    assert minhash_lsh_pairs(empty).count() == 0
    assert simhash_near_pairs(empty).count() == 0


def test_dedup_operators_on_single_doc(spark):
    one = _docs(spark, [(1, "a b c d e")])
    assert exact_dedup(one).count() == 1
    assert ngram_jaccard_pairs(one).count() == 0  # no pairs possible
    assert minhash_lsh_pairs(one).count() == 0
    assert simhash_near_pairs(one).count() == 0


def test_dedup_on_short_and_null_texts(spark):
    oddballs = _docs(
        spark,
        [(1, "one two"), (2, ""), (3, "   "), (4, "single")],
    )
    # shorter than the shingle width n=3 ⇒ empty shingle sets, no pairs
    assert ngram_jaccard_pairs(oddballs).count() == 0
    # "" and "   " trim+collapse to the same normal form ⇒ one fingerprint
    assert exact_dedup(oddballs).count() == 3


def test_connected_components_with_no_edges(spark):
    docs = _docs(spark, [(1, "x"), (2, "y")])
    pairs = spark.createDataFrame([], "id_1 long, id_2 long")
    got = {
        r.doc_id: r.canonical_id
        for r in connected_components(pairs, docs, "doc_id").collect()
    }
    assert got == {1: 1, 2: 2}


def test_cosine_topk_single_vector_corpus(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    probes = emb.filter(F.col("vec_id") == 1)
    # self excluded ⇒ exactly the one other vector
    out = cosine_topk(emb, probes, k=5).collect()
    assert len(out) == 1 and out[0].neighbor_id == 2
    only = emb.filter(F.col("vec_id") == 1)
    assert cosine_topk(only, only, k=5).count() == 0
    assert embedding_neardup_pairs(only).count() == 0


def test_upsert_empty_sides(spark):
    schema = "k string, t int, v double, b int"
    data = spark.createDataFrame([("A", 1, 1.0, 1)], schema)
    empty = spark.createDataFrame([], schema)
    assert upsert(data, empty, ["k", "t"], "b").count() == 1
    assert upsert(empty, data, ["k", "t"], "b").count() == 1


def test_skew_ops_empty(spark):
    schema = "k string, v long"
    empty = spark.createDataFrame([], schema)
    assert salted_sum_count(empty, ["k"], {"s": F.col("v")}).count() == 0
    small = spark.createDataFrame([("a", 1)], schema)
    assert salted_join(empty, small.select("k"), "k").count() == 0


def test_whitespace_padded_duplicate_is_found(spark):
    pad = _docs(spark, [(1, "same text here"), (2, "  same   text here \t")])
    groups = exact_dedup(pad).collect()
    assert len(groups) == 1 and groups[0].n_copies == 2


def test_salted_join_rejects_outer(spark):
    import pytest

    schema = "k string, v long"
    df = spark.createDataFrame([("a", 1)], schema)
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(df, df.select("k"), "k", how="full")


def test_minhash_rejects_bad_banding(spark):
    import pytest

    df = _docs(spark, [(1, "a b c d e")])
    with pytest.raises(ValueError, match="multiple"):
        minhash_lsh_pairs(df, num_hashes=32, bands=5)
    with pytest.raises(ValueError, match="multiple"):
        minhash_lsh_pairs(df, num_hashes=32, bands=64)
