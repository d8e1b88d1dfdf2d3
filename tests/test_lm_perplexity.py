"""Bigram LM perplexity scoring: pure-python reference parity, the
fluent-vs-gibberish separation property, and determinism."""

from __future__ import annotations

import math
from collections import Counter

from global_market_index_etl_spark.operators.lm import (
    BOS,
    score_bigram_perplexity,
    train_bigram_lm,
)

from .conftest import SF_SMALL


def _py_reference(train_texts, score_texts, k=1.0):
    """Independent add-k bigram LM (python). Tokens equal to the BOS
    sentinel are dropped, mirroring the operator's forgery guard."""
    c12: Counter = Counter()
    c1: Counter = Counter()
    vocab = set()
    for t in train_texts:
        toks = [BOS] + [w for w in t.lower().split() if w and w != BOS]
        if len(toks) < 2:
            continue
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
            vocab.add(b)
    v = len(vocab) or 1
    out = {}
    for i, t in enumerate(score_texts):
        toks = [BOS] + [w for w in t.lower().split() if w and w != BOS]
        if len(toks) < 2:
            continue
        s = 0.0
        n = 0
        for a, b in zip(toks, toks[1:]):
            p = (c12.get((a, b), 0) + k) / (c1.get(a, 0) + k * v)
            s += -math.log2(p)
            n += 1
        out[i] = (n, s / n)
    return out


def test_bigram_perplexity_matches_python_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "the cat and the dog",
        "a completely different sentence here",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    model = train_bigram_lm(df)
    got = {
        r.doc_id: (r.n_bigrams, r.log2_ppl)
        for r in score_bigram_perplexity(df, model).collect()
    }
    want = _py_reference(texts, texts)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        assert abs(got[i][1] - want[i][1]) < 1e-9, i


def test_gibberish_scores_higher_perplexity(spark):
    corpus = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    model = train_bigram_lm(corpus)
    first = corpus.orderBy("doc_id").first()
    probes = spark.createDataFrame(
        [
            (0, first.text),  # in-corpus text
            (1, "zxqv wvut qpon mlkj ihgf edcb zyxw vutq ponm"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.log2_ppl
        for r in score_bigram_perplexity(probes, model).collect()
    }
    # the fixture corpus is synthetic random-word text, so its own bigram
    # structure is weak — the separation is modest but must be there
    assert got[1] > got[0] + 0.2


def test_bigram_perplexity_deterministic_under_partitioning(spark):
    corpus = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 40")
    )
    outs = set()
    for parts in (1, 4, 8):
        model = train_bigram_lm(corpus.repartition(parts))
        rows = score_bigram_perplexity(
            corpus.repartition(parts), model
        ).collect()
        outs.add(
            tuple(
                sorted((r.doc_id, r.n_bigrams, round(r.log2_ppl, 9)) for r in rows)
            )
        )
    assert len(outs) == 1


def test_unseen_context_uses_smoothed_floor(spark):
    train = spark.createDataFrame(
        [(0, "aa bb aa bb")], "doc_id long, text string"
    )
    model = train_bigram_lm(train)
    # "cc dd": context cc unseen entirely -> p = k / (0 + k*V) = 1/V
    probe = spark.createDataFrame([(1, "cc dd")], "doc_id long, text string")
    [r] = score_bigram_perplexity(probe, model).collect()
    v = model.select("w2").distinct().count()
    # bigrams: (BOS,cc) unseen-with-seen-context? BOS IS seen (c1=1):
    #   p = 1/(1 + v); (cc,dd) fully unseen: p = 1/v
    expect = (
        -(math.log2(1.0 / (1 + v)) + math.log2(1.0 / v)) / 2
    )
    assert abs(r.log2_ppl - expect) < 1e-9


def test_every_doc_gets_a_row_even_unscorable(spark):
    texts = [(0, "the cat sat"), (1, ""), (2, None), (3, "   "), (4, "one")]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    model = train_bigram_lm(df)
    got = {
        r.doc_id: (r.n_bigrams, r.log2_ppl)
        for r in score_bigram_perplexity(df, model).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4}
    assert got[0][0] > 0 and got[0][1] is not None
    # "one" -> [BOS, one]: 1 bigram, scorable
    assert got[4][0] == 1
    for i in (1, 2, 3):  # unscorable: explicit zero-bigram NULL-ppl row
        assert got[i] == (0, None), i


def test_literal_bos_token_cannot_forge_start_context(spark):
    """A document CONTAINING the literal BOS sentinel must not alias the
    sentence-start context (round-8 review fix): the forged token is
    dropped, so counts and scores equal the same corpus without it."""
    poisoned = [(0, "the cat sat"), (1, f"{BOS} the dog sat")]
    clean = [(0, "the cat sat"), (1, "the dog sat")]
    ms = {}
    for tag, rows in (("poisoned", poisoned), ("clean", clean)):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        model = train_bigram_lm(df)
        ms[tag] = (
            sorted(map(tuple, model.collect())),
            sorted(
                (r.doc_id, r.n_bigrams, round(r.log2_ppl, 12))
                for r in score_bigram_perplexity(df, model).collect()
            ),
        )
    assert ms["poisoned"] == ms["clean"]
    # and in particular the start-context count was not inflated
    want = _py_reference([t for _, t in clean], [t for _, t in clean])
    got = dict(
        (d, (n, p)) for d, n, p in ms["poisoned"][1]
    )
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 1e-9


def test_bits_scaled_agrees_with_float_scorer(spark):
    """The integer-scaled scorer is the float scorer with per-bigram
    rounding at 1e-9 bit: bits_scaled / n / 1e9 must equal log2_ppl to
    within the accumulated rounding budget (n · 0.5e-9), and the in-plan
    vocabulary default must equal an explicit vocab_size."""
    from global_market_index_etl_spark.operators.lm import (
        score_bigram_bits_scaled,
    )

    corpus = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 60")
    )
    model = train_bigram_lm(corpus)
    flt = {
        r.doc_id: (r.n_bigrams, r.log2_ppl)
        for r in score_bigram_perplexity(corpus, model).collect()
    }
    fix = {
        r.doc_id: (r.n_bigrams, r.bits_scaled)
        for r in score_bigram_bits_scaled(corpus, model).collect()
    }
    assert set(flt) == set(fix)
    for d, (n, ppl) in flt.items():
        assert fix[d][0] == n
        if n == 0:
            assert fix[d][1] is None
            continue
        avg = fix[d][1] / n / 1e9
        assert abs(avg - ppl) <= 0.5e-9 + 1e-12, (d, avg, ppl)

    v = model.select("w2").distinct().count()
    explicit = {
        r.doc_id: (r.n_bigrams, r.bits_scaled)
        for r in score_bigram_bits_scaled(
            corpus, model, vocab_size=v
        ).collect()
    }
    assert explicit == fix


def test_null_id_doc_keeps_its_score(spark):
    """A NULL document id is a legal key: its score must surface under the
    NULL id, not be mislabeled unscorable (null-safe join)."""
    df = spark.createDataFrame(
        [(None, "the cat sat on the mat"), (1, "the cat sat")],
        "doc_id long, text string",
    )
    model = train_bigram_lm(df)
    got = {
        r.doc_id: (r.n_bigrams, r.log2_ppl)
        for r in score_bigram_perplexity(df, model).collect()
    }
    assert set(got) == {None, 1}
    assert got[None][0] == 6 and got[None][1] is not None
