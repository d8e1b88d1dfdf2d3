"""Property-based tests (hypothesis): algebraic invariants that must hold
for ANY data, not just the fixtures — upsert idempotency/LWW, salted
aggregation equivalence, unpivot row conservation, dedup survivorship.

Strategy sizes are kept small: each example pays Spark job latency, so we
want many shapes, not many rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from global_market_index_etl_spark.operators.skew import (
    salted_join,
    salted_sum_count,
)
from global_market_index_etl_spark.operators.upsert import dedup_keyed, upsert

KEYS = st.sampled_from(["a", "b", "c", "d"])
ROWS = st.lists(
    st.tuples(KEYS, st.integers(0, 3), st.integers(-1000, 1000)),
    min_size=0,
    max_size=24,
)

PROP_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows, batch):
    return spark.createDataFrame(
        [(k, t, v, batch) for k, t, v in rows], "k string, t int, v long, b int"
    )


@given(base=ROWS, upd=ROWS)
@PROP_SETTINGS
def test_upsert_idempotent_and_lww(spark, base, upd):
    tgt = dedup_keyed(_df(spark, base, 1), ["k", "t"], [F.col("b").desc()])
    merged = upsert(tgt, _df(spark, upd, 2), ["k", "t"], "b")
    again = upsert(merged, _df(spark, upd, 2), ["k", "t"], "b")
    # idempotent: re-applying the same batch changes nothing
    assert merged.exceptAll(again).count() == 0
    assert again.exceptAll(merged).count() == 0
    # LWW: every key present in upd must carry upd's value
    got = {(r.k, r.t): (r.v, r.b) for r in merged.collect()}
    latest_upd = {}
    for k, t, v in upd:
        latest_upd[(k, t)] = v
    for key in latest_upd:
        assert got[key][1] == 2  # survivor comes from the newer batch
    # keys only in base survive untouched
    upd_keys = set(latest_upd)
    for k, t, v in base:
        if (k, t) not in upd_keys:
            assert got[(k, t)][1] == 1


@given(rows=ROWS)
@PROP_SETTINGS
def test_salted_agg_equals_plain_agg(spark, rows):
    df = _df(spark, rows, 1)
    salted = {
        r.k: (r.s, r.n_rows)
        for r in salted_sum_count(df, ["k"], {"s": F.col("v")}, n_salts=4).collect()
    }
    plain = {
        r.k: (r.s, r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert salted == plain


@given(rows=ROWS, dim=st.lists(st.tuples(KEYS, st.integers(0, 9)), max_size=6))
@PROP_SETTINGS
def test_salted_join_equals_plain_join(spark, rows, dim):
    big = _df(spark, rows, 1)
    small = spark.createDataFrame(
        list({(k,): None for k, _ in dim}.keys()) or [("zz",)], "k string"
    ).withColumn("d", F.length("k"))
    a = salted_join(big, small, "k", n_salts=4)
    b = big.join(small, "k")
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0


@given(rows=ROWS)
@PROP_SETTINGS
def test_dedup_keyed_one_survivor_per_key(spark, rows):
    df = _df(spark, rows, 1)
    out = dedup_keyed(df, ["k", "t"], [F.col("v").desc()])
    keys = [(r.k, r.t) for r in out.collect()]
    assert len(keys) == len(set(keys))
    assert set(keys) == {(k, t) for k, t, _ in rows}


# vocabulary for generated corpora: enough words that random docs are
# dissimilar, few enough that mutated copies stay similar
_VOCAB = [f"w{i}" for i in range(40)]
_DOC_STRAT = st.lists(st.sampled_from(_VOCAB), min_size=8, max_size=16)


@given(
    base_docs=st.lists(_DOC_STRAT, min_size=2, max_size=5),
    dup_of=st.integers(0, 4),
)
@PROP_SETTINGS
def test_minhash_lsh_precision_and_duplicate_recall(spark, base_docs, dup_of):
    """The two MinHash-LSH properties that are DETERMINISTIC (banding
    recall on borderline-jaccard pairs is probabilistic by design — a
    pair at exactly J=0.8 has a 1.4% miss chance per the b=8,r=4 math,
    so equality with the exact pair set cannot be asserted on arbitrary
    corpora):
    1. precision is exact — every emitted pair passes the exact-Jaccard
       verify, so approx ⊆ exact on ANY corpus;
    2. identical docs (J=1.0 ⇒ identical signatures ⇒ identical buckets
       in every band) are ALWAYS found."""
    from global_market_index_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = [(i, " ".join(ws)) for i, ws in enumerate(base_docs)]
    copy_id = len(docs)
    docs.append((copy_id, " ".join(base_docs[dup_of % len(base_docs)])))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    exact = {
        (r.id_1, r.id_2) for r in ngram_jaccard_pairs(df, threshold=0.8).collect()
    }
    approx = {
        (r.id_1, r.id_2) for r in minhash_lsh_pairs(df, threshold=0.8).collect()
    }
    assert approx <= exact  # precision 1 (exact verify)
    assert (dup_of % len(base_docs), copy_id) in approx  # J=1.0 always found


@given(base=ROWS, upd=ROWS)
@settings(
    max_examples=5,  # each example pays three Spark file jobs
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_storage_merge_equals_dataframe_upsert(spark, tmp_path_factory, base, upd):
    """The durable MERGE (write → partition-pruned read-modify-overwrite →
    read back) must land on exactly the relational upsert's answer for ANY
    base/batch pair — storage is a faithful materialization of the
    operator, never a semantic fork."""
    from global_market_index_etl_spark.operators.storage import (
        merge_into_parquet,
        read_table,
        write_bucketed_table,
    )

    tgt = dedup_keyed(_df(spark, base, 1), ["k", "t"], [F.col("b").desc()])
    updates = dedup_keyed(_df(spark, upd, 2), ["k", "t"], [F.col("b").desc()])
    expected = {
        (r.k, r.t): (r.v, r.b)
        for r in upsert(tgt, updates, ["k", "t"], "b").collect()
    }
    path = str(tmp_path_factory.mktemp("merge")) + "/tbl"
    disk_schema = write_bucketed_table(tgt, path, ["k", "t"], n_buckets=4)
    merge_into_parquet(spark, path, updates, ["k", "t"], "b", n_buckets=4)
    got = {
        (r.k, r.t): (r.v, r.b)
        for r in read_table(spark, path, disk_schema).collect()
    }
    assert got == expected


BUDGET_ROWS = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 20), st.integers(0, 9)),
    min_size=0,
    max_size=24,
    unique_by=lambda r: r[0],
)


@given(rows=BUDGET_ROWS, budget=st.integers(0, 120))
@PROP_SETTINGS
def test_token_budget_equals_python_prefix(spark, rows, budget):
    """select_to_token_budget must pick exactly the maximal greedy prefix
    (priority desc, id asc) for ANY rows/budget — independent of the range
    partitioner's boundary placement."""
    from global_market_index_etl_spark.operators.sampling import (
        select_to_token_budget,
    )

    df = spark.createDataFrame(
        rows, "id long, tokens long, priority long"
    )
    got = {
        r.id
        for r in select_to_token_budget(
            df, budget, "tokens", "priority", "id", num_partitions=3
        ).collect()
    }
    expect, cum = set(), 0
    for rid, tok, _pri in sorted(rows, key=lambda r: (-r[2], r[0])):
        if cum + tok > budget:
            break
        cum += tok
        expect.add(rid)
    assert got == expect


WORDS_ST = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
DOC_ST = st.lists(WORDS_ST, min_size=0, max_size=8)


@given(
    corpus=st.lists(DOC_ST, min_size=0, max_size=8),
    eval_docs=st.lists(DOC_ST, min_size=0, max_size=4),
    min_hits=st.integers(1, 3),
)
@PROP_SETTINGS
def test_decontamination_matches_python_reference(
    spark, corpus, eval_docs, min_hits
):
    """contamination_hits == a direct python n-gram-overlap computation for
    ANY corpus/eval shape (n=2 grams, per-doc distinct, >= min_hits)."""
    from global_market_index_etl_spark.operators.decontaminate import (
        contamination_hits,
    )

    def grams(ws):
        return {" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)}

    eval_grams = set().union(*(grams(d) for d in eval_docs)) if eval_docs else set()
    expect = {}
    for i, d in enumerate(corpus):
        hits = len(grams(d) & eval_grams)
        if hits >= min_hits:
            expect[i] = hits

    cdf = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(corpus)],
        "doc_id long, text string",
    )
    edf = spark.createDataFrame(
        [(1000 + i, " ".join(d)) for i, d in enumerate(eval_docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_hits
        for r in contamination_hits(cdf, edf, n=2, min_hits=min_hits).collect()
    }
    assert got == expect


@given(
    corpus=st.lists(DOC_ST, min_size=0, max_size=6),
    eval_docs=st.lists(DOC_ST, min_size=0, max_size=3),
    threshold=st.sampled_from([0.5, 0.8]),
)
@PROP_SETTINGS
def test_fuzzy_contamination_sound_for_any_corpus(
    spark, corpus, eval_docs, threshold
):
    """Soundness for ANY corpus/eval shape: every fuzzy pair the operator
    reports must appear in the brute-force 3-gram cross-Jaccard at the
    same value and >= threshold — the exact per-candidate verify means
    banding can only DROP pairs (completeness is probabilistic), never
    admit a false positive or mis-state a jaccard."""
    from global_market_index_etl_spark.operators.decontaminate import (
        fuzzy_contamination_pairs,
    )

    def grams(ws):
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    brute = {}
    for i, d in enumerate(corpus):
        for j, e in enumerate(eval_docs):
            g1, g2 = grams(d), grams(e)
            if not g1 or not g2:
                continue
            jac = len(g1 & g2) / len(g1 | g2)
            if jac >= threshold:
                brute[(i, 1000 + j)] = round(jac, 12)

    cdf = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(corpus)],
        "doc_id long, text string",
    )
    edf = spark.createDataFrame(
        [(1000 + j, " ".join(e)) for j, e in enumerate(eval_docs)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.eval_id): round(r.jaccard, 12)
        for r in fuzzy_contamination_pairs(
            cdf, edf, threshold=threshold
        ).collect()
    }
    assert set(got) <= set(brute)
    for pair, jac in got.items():
        assert jac == brute[pair]


WORDS_ST = st.lists(
    st.sampled_from(["spark", "join", "scan", "agg", "sort", "table"]),
    min_size=0,
    max_size=12,
)
DOCS_ST = st.lists(WORDS_ST, min_size=0, max_size=10)


@PROP_SETTINGS
@given(corpus=DOCS_ST, threshold=st.sampled_from([0.5, 0.8, 1.0]))
def test_prefix_filter_jaccard_equals_naive(spark, corpus, threshold):
    """The All-Pairs prefix-filter candidate path is EXACT for any corpus
    and threshold — identical pair set (ids, n_common, jaccard) to the
    naive self-join, including duplicate texts (jaccard 1.0 at every
    threshold) and short docs below the shingle width."""
    from global_market_index_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(corpus)],
        "doc_id long, text string",
    )

    def run(strategy):
        return {
            (r.id_1, r.id_2, r.n_common, r.jaccard)
            for r in ngram_jaccard_pairs(
                df, n=2, threshold=threshold, strategy=strategy
            ).collect()
        }

    assert run("prefix") == run("naive")


# --------------------------------------------------------------------- #
# round-7 operators: interval join, SCD2 incremental, span profile
# --------------------------------------------------------------------- #

POINT_ROWS = st.lists(
    st.tuples(st.integers(0, 50), st.integers(-40, 120)),  # (pid offset, ts)
    min_size=0, max_size=14,
)
INTERVAL_ROWS = st.lists(
    st.tuples(st.integers(0, 50), st.integers(-40, 120), st.integers(0, 60)),
    min_size=0, max_size=8,  # (iid offset, lo, length)
)


@given(points=POINT_ROWS, intervals=INTERVAL_ROWS,
       bucket=st.sampled_from([1, 3, 7, 16, 100]))
@PROP_SETTINGS
def test_interval_join_equals_brute_force(spark, points, intervals, bucket):
    from global_market_index_etl_spark.operators.rangejoin import (
        interval_join_bucketed,
    )

    pts = [(i, ts) for i, (_, ts) in enumerate(points)]
    ivs = [(i, lo, lo + ln) for i, (_, lo, ln) in enumerate(intervals)]
    expect = {
        (pid, iid)
        for pid, pt in pts
        for iid, lo, hi in ivs
        if lo <= pt < hi
    }
    p = spark.createDataFrame(pts or [(None, None)], "pid long, pt long").where(
        "pid IS NOT NULL"
    )
    i = spark.createDataFrame(
        ivs or [(None, None, None)], "iid long, lo long, hi long"
    ).where("iid IS NOT NULL")
    j = interval_join_bucketed(
        p, i, ts_col="pt", lo_col="lo", hi_col="hi", bucket_width=bucket
    )
    got = {(r.pid, r.iid) for r in j.select("pid", "iid").collect()}
    assert got == expect


SCD_FEED = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 30),
              st.sampled_from(["a", "b", None])),
    min_size=0, max_size=16, unique_by=lambda r: (r[0], r[1]),
)




def _nsort(rows):
    return sorted(
        (tuple(r) for r in rows),
        key=lambda r: tuple((x is None, x) for x in r),
    )


@given(feed=SCD_FEED, cut=st.integers(0, 16), cut2=st.integers(0, 16))
@PROP_SETTINGS
def test_scd2_incremental_any_batching_equals_full(spark, feed, cut, cut2):
    """ANY 3-way split of a changelog, applied incrementally in ANY order
    of those batches' contents, must equal the full rebuild at both the
    raw and compressed layers — the invariant that exposed the
    lossy-compression defect."""
    from global_market_index_etl_spark.operators.scd2 import (
        scd2_apply_changes,
        scd2_compress,
        scd2_from_changelog,
    )

    a, b = sorted((min(cut, len(feed)), min(cut2, len(feed))))
    batches = [feed[:a], feed[a:b], feed[b:]]
    schema = "k long, seq long, attr string"

    def full(rows, compress):
        return scd2_from_changelog(
            spark.createDataFrame(rows, schema) if rows else
            spark.createDataFrame([], schema),
            key_cols=["k"], order_cols=["seq"], attr_cols=["attr"],
            compress=compress,
        )

    hist = full(batches[0], compress=False)
    for batch in batches[1:]:
        if not batch:
            continue
        hist = scd2_apply_changes(
            hist, spark.createDataFrame(batch, schema),
            key_cols=["k"], seq_col="seq", attr_cols=["attr"],
        )
    assert _nsort(hist.collect()) == _nsort(
        full(feed, compress=False).collect()
    )
    assert _nsort(
        scd2_compress(hist, key_cols=["k"], attr_cols=["attr"]).collect()
    ) == _nsort(full(feed, compress=True).collect())


WORDS = st.lists(
    st.lists(
        st.sampled_from(["aa", "ab", "ba", "cat", "dog", "x"]),
        min_size=0,
        max_size=6,
    ).map(" ".join),
    min_size=0,
    max_size=8,
)


@given(texts_a=WORDS, texts_b=WORDS)
@PROP_SETTINGS
def test_count_min_cells_additive(spark, texts_a, texts_b):
    """CMS additivity — the property streaming maintenance relies on:
    cells(A) + cells(B) == cells(A ∪ B), exactly, for ANY corpora."""
    from global_market_index_etl_spark.operators.terms import count_min_cells

    def cells(texts, start):
        df = spark.createDataFrame(
            [(start + i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        return {
            (r.row, r.cell): r.cnt
            for r in count_min_cells(df, depth=3, width=16).collect()
        }

    a = cells(texts_a, 0)
    b = cells(texts_b, 1000)
    ab = cells(texts_a + texts_b, 0)
    summed: dict = {}
    for m in (a, b):
        for k, v in m.items():
            summed[k] = summed.get(k, 0) + v
    assert summed == ab


@given(
    values=st.lists(
        st.integers(0, 100), min_size=1, max_size=40
    ),
    lo=st.integers(-10, 110),
    span=st.integers(0, 60),
)
@PROP_SETTINGS
def test_pruned_read_never_changes_answers(
    spark, tmp_path_factory, values, lo, span
):
    """Data skipping is an optimization, never a filter: for ANY data and
    ANY prune band, pruned-read + predicate == full-read + predicate."""
    from global_market_index_etl_spark.operators.storage import (
        read_table,
        write_bucketed_table,
    )

    hi = lo + span
    path = str(tmp_path_factory.mktemp("prune") / "tbl")
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "k long, value double"
    )
    write_bucketed_table(
        df, path, ["k"], n_buckets=2, stats_columns=["value"],
        cluster_by=["value"], max_records_per_file=8,
    )
    pred = (F.col("value") >= float(lo)) & (F.col("value") <= float(hi))
    full = sorted(map(tuple, read_table(spark, path).filter(pred).collect()))
    pruned = sorted(
        map(
            tuple,
            read_table(
                spark, path, prune={"value": (float(lo), float(hi))}
            ).filter(pred).collect(),
        )
    )
    assert pruned == full


BPE_TEXTS = st.lists(
    st.lists(
        st.sampled_from(["ab", "aab", "abab", "ba", "cat", "catcat", "x"]),
        min_size=1,
        max_size=5,
    ).map(" ".join),
    min_size=1,
    max_size=6,
)


@given(texts=BPE_TEXTS, k=st.integers(1, 6))
@PROP_SETTINGS
def test_bpe_training_equals_naive_reference_for_any_corpus(spark, texts, k):
    """Both trainer paths must reproduce the from-scratch reference for
    ANY corpus and merge budget — not just the fixture shapes."""
    from collections import Counter

    from global_market_index_etl_spark.operators.tokenize import (
        bpe_train_merges,
    )

    def naive(texts, k):
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
            nv = {}
            for syms, c in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                nv[tuple(out)] = nv.get(tuple(out), 0) + c
            vocab = nv
        return merges

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    expect = naive(texts, k)
    assert bpe_train_merges(df, k=k) == expect
    assert bpe_train_merges(df, k=k, driver_vocab_threshold=0) == expect


@given(
    tokens=st.lists(st.integers(1, 500), min_size=1, max_size=30),
    max_tokens=st.integers(100, 600),
)
@PROP_SETTINGS
def test_pack_best_fit_invariants_for_any_corpus(spark, tokens, max_tokens):
    """Conservation + capacity hold for ANY token distribution."""
    from global_market_index_etl_spark.operators.chunking import (
        pack_documents_best_fit,
    )

    rows = [(i, t) for i, t in enumerate(tokens)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_documents_best_fit(df, max_tokens=max_tokens, n_buckets=2).collect()
    assert sorted((r.doc_id, r.n_tokens) for r in out) == sorted(rows)
    packs = {}
    for r in out:
        packs.setdefault(r.pack_id, []).append(r)
    for members in packs.values():
        if any(m.oversize for m in members):
            assert len(members) == 1
        else:
            assert sum(m.n_tokens for m in members) <= max_tokens


@given(
    counts=st.dictionaries(
        st.sampled_from(["en", "de", "fr", "sw", "zh"]),
        st.integers(1, 60),
        min_size=1,
        max_size=5,
    ),
    alpha=st.sampled_from([0.0, 0.5, 1.0]),
)
@PROP_SETTINGS
def test_temperature_mix_inplan_invariants_for_any_counts(
    spark, counts, alpha
):
    """For ANY group-count shape and the exactly-portable alphas: every
    quota equals the exact integer derivation (α=1 keeps all, α=0 levels
    to min, α=0.5 is floor(sqrt(c·min)) — isqrt-exact), no group keeps
    more than it has, and the scarcest group NEVER loses a row to a
    floor-boundary ulp."""
    import math

    from global_market_index_etl_spark.operators.sampling import (
        corpus_mix_temperature_inplan,
    )

    rows = []
    base = 0
    for g in sorted(counts):
        rows += [(base + i, g) for i in range(counts[g])]
        base += 1000
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = corpus_mix_temperature_inplan(df, "lang", alpha, "doc_id")
    got = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}

    mn = min(counts.values())
    for g, c in counts.items():
        if alpha == 1.0:
            want = c
        elif alpha == 0.0:
            want = mn
        else:
            want = math.isqrt(c * mn)
        assert got.get(g, 0) == want, (g, alpha)
        assert got.get(g, 0) <= c
    binding = min(counts, key=counts.get)
    assert got.get(binding, 0) == (mn if alpha != 1.0 else counts[binding])


@given(
    groups=st.dictionaries(
        st.sampled_from(["en", "de", "sw"]),
        st.lists(st.integers(1, 200), min_size=1, max_size=12),
        min_size=1,
        max_size=3,
    ),
)
@PROP_SETTINGS
def test_token_mix_invariants_for_any_weights(spark, groups):
    """Token-weighted mixing at α = 0.5, for ANY per-doc token shape:
    kept tokens per group never exceed floor(sqrt(W·minW)), the binding
    group keeps every token, and the survivor set is the maximal
    md5-order prefix."""
    import hashlib
    import math

    from global_market_index_etl_spark.operators.sampling import (
        corpus_mix_temperature_tokens,
    )

    rows = []
    base = 0
    for g in sorted(groups):
        rows += [(base + i, g, n) for i, n in enumerate(groups[g])]
        base += 10_000
    df = spark.createDataFrame(rows, "doc_id long, lang string, n long")
    kept = {
        r.doc_id
        for r in corpus_mix_temperature_tokens(
            df, "lang", 0.5, "doc_id", "n"
        ).collect()
    }

    weights = {g: sum(ns) for g, ns in groups.items()}
    mn = min(weights.values())
    for g, ns in groups.items():
        quota = math.floor(math.sqrt(float(weights[g]) * float(mn)))
        members = [
            (d, n) for d, gg, n in rows if gg == g
        ]
        order = sorted(
            members,
            key=lambda m: (hashlib.md5(str(m[0]).encode()).hexdigest(), m[0]),
        )
        cum, expect = 0, set()
        for d, n in order:
            cum += n
            if cum <= quota:
                expect.add(d)
        got_g = {d for d, gg, _ in rows if gg == g and d in kept}
        assert got_g == expect, g
    binding = min(weights, key=weights.get)
    assert {d for d, g, _ in rows if g == binding} <= kept


# ---- ExactSubstr vs pure-python twin (round 12) --------------------------

WORDS = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
DOC_TEXTS = st.lists(
    st.lists(WORDS, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=5,
)


def _exactsubstr_twin(docs, L, keep_first=True):
    """Reference implementation: repeated L-gram occurrence marking with a
    (doc, position)-minimal survivor — the semantics exact_substring_dedup
    claims, computed the obvious sequential way."""
    import re as _re
    from collections import defaultdict

    toks = {}
    for d, t in docs:
        norm = _re.sub(r"\s+", " ", t.lower()).strip()
        if norm:
            toks[d] = norm.split(" ")
    by_w = defaultdict(list)
    for d, ts in toks.items():
        for i in range(1, len(ts) - L + 2):
            by_w[" ".join(ts[i - 1 : i - 1 + L])].append((d, i))
    covered = defaultdict(set)
    for w, occs in by_w.items():
        if len(occs) < 2:
            continue
        surv = min(occs)
        for d, i in occs:
            if keep_first and (d, i) == surv:
                continue
            covered[d].update(range(i, i + L))
    out = {}
    for d, ts in toks.items():
        kept = [t for j, t in enumerate(ts, 1) if j not in covered[d]]
        out[d] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


@given(texts=DOC_TEXTS, keep_first=st.booleans())
@settings(
    max_examples=10,  # each example pays several Spark jobs
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_substring_matches_python_twin(spark, texts, keep_first):
    """For ANY tiny corpus over a 5-word vocabulary (so repeats arise
    naturally, aligned or not, within or across docs), the distributed
    stride-1 L-gram plan must equal the sequential reference — cleaned
    text, token counts, and removal counts, under both survivor modes."""
    from global_market_index_etl_spark.operators.spans import (
        exact_substring_dedup,
    )

    L = 3
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.cleaned_text, r.n_tokens, r.n_removed_tokens)
        for r in exact_substring_dedup(
            df, min_len=L, keep_first=keep_first
        ).collect()
    }
    want = _exactsubstr_twin(docs, L, keep_first=keep_first)
    assert got == want


HLL_KEYS = st.lists(st.integers(0, 10_000), min_size=0, max_size=40)


@given(a=HLL_KEYS, b=HLL_KEYS)
@PROP_SETTINGS
def test_hll_merge_is_union_for_any_split(spark, a, b):
    """registers(a ∪ b) ≡ merge(registers(a), registers(b)) for ANY two
    key multisets — the max-mergeability that makes HLL maintainable
    over shards and streaming ticks (duplicate keys across shards must
    not perturb the merge: max is idempotent)."""
    from global_market_index_etl_spark.operators.terms import (
        hll_merge,
        hll_registers,
    )

    df_a = spark.createDataFrame([(k,) for k in a] or [(None,)], "k long")
    df_b = spark.createDataFrame([(k,) for k in b] or [(None,)], "k long")
    if not a:
        df_a = df_a.filter("k IS NOT NULL")
    if not b:
        df_b = df_b.filter("k IS NOT NULL")
    union = df_a.unionByName(df_b)
    merged = hll_merge(
        hll_registers(df_a, "k", p=6), hll_registers(df_b, "k", p=6)
    )
    full = hll_registers(union, "k", p=6)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


_W5 = st.sampled_from(["alpha", "beta", "gamma", "delta", "epsi"])
_DOC = st.lists(_W5, min_size=3, max_size=8).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=2, max_size=7)
_SPLIT = st.lists(st.booleans(), min_size=7, max_size=7)

_MINHASH_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(corpus=_CORPUS, split=_SPLIT)
@_MINHASH_SETTINGS
def test_incremental_minhash_union_is_full_for_any_split(
    spark, corpus, split
):
    """full(b1 ∪ b2) ≡ internal(b1) ∪ incremental(b2 | index(b1)) for ANY
    corpus and ANY batch assignment — including an EMPTY index (day-zero
    ingest) and an empty batch (idle tick), edges the fixture test's
    fixed %2 split never exercises. The 5-word alphabet makes ≥0.8
    Jaccard near-dups common, so the pair sets are routinely non-empty."""
    from global_market_index_etl_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_index,
        minhash_lsh_pairs,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    b1_ids = [i for i in range(len(corpus)) if split[i % len(split)]]
    b1 = docs.filter(F.col("doc_id").isin(b1_ids or [-1]))
    b2 = docs.filter(~F.col("doc_id").isin(b1_ids or [-1]))

    full = {
        (r.id_1, r.id_2) for r in minhash_lsh_pairs(docs).collect()
    }
    internal = {
        (r.id_1, r.id_2) for r in minhash_lsh_pairs(b1).collect()
    }
    bands, arrays = minhash_index(b1)
    pairs, _, _ = incremental_minhash_pairs(b2, bands, arrays)
    incremental = {(r.id_1, r.id_2) for r in pairs.collect()}

    assert not (internal & incremental)
    assert internal | incremental == full


_VEC_POOL = [
    [1.0, 0.0, 0.0, 0.5],
    [0.0, 1.0, 0.25, 0.0],
    [0.5, 0.5, 1.0, 0.0],
]
_VECS = st.lists(st.sampled_from([0, 1, 2]), min_size=2, max_size=7)


@given(picks=_VECS, split=_SPLIT)
@_MINHASH_SETTINGS
def test_incremental_embedding_union_is_full_for_any_split(
    spark, picks, split
):
    """The embedding twin of the minhash property: repeated picks from a
    3-vector pool plant exact duplicates (cos = 1.0 ≥ 0.95), so pairs
    exist for most draws; the split ranges over every assignment
    including empty index / empty batch."""
    from global_market_index_etl_spark.operators.similarity import (
        embedding_lsh_index,
        embedding_neardup_pairs,
        incremental_embedding_neardup_pairs,
    )

    rows = [(i, _VEC_POOL[k]) for i, k in enumerate(picks)]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    b1_ids = [i for i in range(len(picks)) if split[i % len(split)]]
    b1 = vecs.filter(F.col("vec_id").isin(b1_ids or [-1]))
    b2 = vecs.filter(~F.col("vec_id").isin(b1_ids or [-1]))

    full = {
        (r.id_1, r.id_2)
        for r in embedding_neardup_pairs(vecs, threshold=0.95).collect()
    }
    internal = {
        (r.id_1, r.id_2)
        for r in embedding_neardup_pairs(b1, threshold=0.95).collect()
    }
    pairs, _ = incremental_embedding_neardup_pairs(
        b2, embedding_lsh_index(b1, dim=4), b1, threshold=0.95, dim=4
    )
    incremental = {(r.id_1, r.id_2) for r in pairs.collect()}

    assert not (internal & incremental)
    assert internal | incremental == full


# --------------------------------------------------------------------- #
# chunking + packing (round 13)
# --------------------------------------------------------------------- #

WORD = st.sampled_from(["alpha", "b", "gamma7", "Zz", "q.q"])
DOC_TEXTS = st.lists(
    st.lists(WORD, min_size=0, max_size=30).map(" ".join),
    min_size=0,
    max_size=8,
)


@given(
    texts=DOC_TEXTS,
    chunk_tokens=st.integers(2, 9),
    overlap=st.integers(0, 4),
)
@PROP_SETTINGS
def test_chunk_documents_reconstruction_and_coverage(
    spark, texts, chunk_tokens, overlap
):
    """For ANY corpus and any (chunk_tokens, overlap < chunk_tokens):
    dropping each chunk's first `overlap` words (except chunk 0) and
    concatenating in chunk_idx order reconstructs the document exactly —
    i.e. chunking loses nothing, duplicates only the declared overlap,
    and chunk_idx ordering is the document ordering."""
    from global_market_index_etl_spark.operators.chunking import (
        chunk_documents,
    )

    overlap = min(overlap, chunk_tokens - 1)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = chunk_documents(
        df, chunk_tokens=chunk_tokens, overlap=overlap
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in enumerate(texts):
        words = text.split() if text.strip() else []
        chunks = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_idx)
        if not words:
            assert chunks == []
            continue
        assert [r.chunk_idx for r in chunks] == list(range(len(chunks)))
        rebuilt: list[str] = []
        for r in chunks:
            toks = r.chunk_text.split()
            assert r.n_tokens == len(toks) <= chunk_tokens
            rebuilt.extend(toks if not rebuilt else toks[overlap:])
        assert rebuilt == words, (doc_id, rebuilt, words)


@given(
    texts=DOC_TEXTS,
    chunks_per_pack=st.integers(1, 5),
    hash_fn=st.sampled_from(["xxhash64", "md5"]),
)
@PROP_SETTINGS
def test_pack_fixed_chunks_conservation_any_corpus(
    spark, texts, chunks_per_pack, hash_fn
):
    """For ANY chunk set, either hash dial: every chunk is placed exactly
    once (multiset conservation), no pack exceeds chunks_per_pack, and at
    most one non-full pack exists per bucket."""
    from collections import Counter

    from global_market_index_etl_spark.operators.chunking import (
        chunk_documents,
        pack_fixed_chunks,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    chunks = chunk_documents(df, chunk_tokens=4)
    expect = Counter(
        (r.doc_id, r.chunk_idx, r.chunk_text) for r in chunks.collect()
    )
    packs = pack_fixed_chunks(
        chunks, chunks_per_pack=chunks_per_pack, n_buckets=4, hash_fn=hash_fn
    ).collect()
    placed: Counter = Counter()
    short_per_bucket: Counter = Counter()
    for r in packs:
        assert 1 <= r.n_chunks <= chunks_per_pack
        assert len(r.texts) == len(r.provenance) == r.n_chunks
        if r.n_chunks < chunks_per_pack:
            short_per_bucket[r.pack_id >> 32] += 1
        for p, t in zip(r.provenance, r.texts):
            placed[(p.doc_id, p.chunk_idx, t)] += 1
    assert placed == expect
    assert all(v == 1 for v in short_per_bucket.values())


# --------------------------------------------------------------------- #
# portable quantile histogram (round 13)
# --------------------------------------------------------------------- #

QH_VALUES = st.lists(
    st.one_of(
        st.integers(-(10**6), 10**6).map(lambda i: i / 97.0),
        st.sampled_from([0.0, -0.0, 1e-7, -1e-7, 123456.78]),
    ),
    min_size=1,
    max_size=40,
)


@given(vals=QH_VALUES, bits=st.integers(2, 8), probs_seed=st.integers(0, 4))
@PROP_SETTINGS
def test_quantile_sketch_bound_holds_for_any_values(
    spark, vals, bits, probs_seed
):
    """For ANY value multiset and grid: every estimated quantile is
    within the documented bound of the exact order statistic — relative
    2^-(bits+1) of |exact| plus the 2^-(scale_bits+1) quantization."""
    import math

    from global_market_index_etl_spark.operators.terms import (
        quantile_buckets,
        quantile_estimate,
    )

    scale_bits = 20
    probs = [[0.5], [0.0, 1.0], [0.25, 0.75], [0.99], [0.01, 0.5, 1.0]][
        probs_seed
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    hist = quantile_buckets(df, "v", bits=bits, scale_bits=scale_bits)
    est = {
        r.p: r.approx_value for r in quantile_estimate(hist, probs).collect()
    }
    svals = sorted(vals)
    for p in probs:
        exact = svals[max(0, math.ceil(p * len(svals)) - 1)]
        tol = abs(exact) * 2 ** -(bits + 1) + 2 ** -(scale_bits + 1)
        # one float guard ulp on the decode arithmetic
        tol += abs(exact) * 1e-12 + 1e-15
        assert abs(est[p] - exact) <= tol, (p, exact, est[p], bits)


@given(vals=QH_VALUES, split=st.integers(0, 39))
@PROP_SETTINGS
def test_quantile_sketch_merge_split_invariance(spark, vals, split):
    """merge(hist(A), hist(B)) ≡ hist(A ∪ B) for ANY split point —
    the additivity law sharded and streaming construction rely on."""
    from global_market_index_etl_spark.operators.terms import (
        quantile_buckets,
        quantile_histogram_merge,
    )

    split = min(split, len(vals))
    a, b = vals[:split], vals[split:]
    df_all = spark.createDataFrame([(v,) for v in vals], "v double")
    full = sorted(map(tuple, quantile_buckets(df_all, "v").collect()))
    parts = []
    for chunk in (a, b):
        df = (
            spark.createDataFrame([(v,) for v in chunk], "v double")
            if chunk
            else spark.createDataFrame([], "v double")
        )
        parts.append(quantile_buckets(df, "v"))
    merged = sorted(
        map(tuple, quantile_histogram_merge(*parts).collect())
    )
    assert merged == full
