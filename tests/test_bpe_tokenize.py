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
