"""Benchmark decontamination: remove training documents that overlap an
evaluation/benchmark set (driver north star; first-class alongside
SURVEY.md §2 training-data extensions).

The standard contamination check is n-gram overlap: a training document is
contaminated if it shares at least ``min_hits`` distinct word n-grams with
any document of the eval set (production pipelines use n ≈ 8-13; the
declared fixture query uses n=3 so the DuckDB oracle can reuse the
engine's existing shingle SQL fragment).

Scale design — the corpus side never takes a wide shuffle:
- per-document gram sets are built NARROW: tokenize → shingle →
  ``array_distinct`` inside the row, then explode. No corpus-wide
  ``distinct()`` — per-doc set semantics need only per-row dedup.
- the eval side is tiny by construction (benchmarks are thousands of
  docs, not billions), so its distinct gram table is ``broadcast()`` and
  the contamination probe is a broadcast hash join at scan speed.
- only MATCHING grams survive the join, so the final ``groupBy(doc_id)``
  shuffles the hit rows alone — at 100 TB that is the benchmark-overlap
  volume (≈ eval-set-sized), not the corpus volume.

Gram identity is ``xxhash64`` of the shingle string (8-byte probe keys;
two distinct grams colliding per doc has P ≈ 2⁻⁶⁴ — the same accepted
equivalence as the Jaccard kernel, dedup.py:100-106). The DuckDB oracle
joins on the shingle STRING, so a collision would surface as a driver
hash mismatch — none occurs on the fixture corpora.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .text import shingles_from_words, words
from .util import parallelize_small as _parallelize_small


def doc_gram_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document DISTINCT hashed n-grams as (id, gram) rows — built with
    narrow operators only (``array_distinct`` inside the row replaces the
    corpus-wide ``distinct()`` shuffle of ``dedup.shingle_table``).

    The word array and the gram array are each materialized in their own
    projection so the tokenizing split and the shingle transform evaluate
    once per row (text.shingles_from_words docstring: CollapseProject
    re-inlines referenced expressions per element).
    """
    prepared = (
        _parallelize_small(df.select(id_col, text_col))
        .withColumn("__words", words(F.lower(F.col(text_col))))
        .withColumn(
            "__grams", F.array_distinct(shingles_from_words(F.col("__words"), n))
        )
    )
    return prepared.select(
        F.col(id_col), F.explode("__grams").alias("__shingle")
    ).select(id_col, F.xxhash64("__shingle").alias("gram"))


def eval_gram_set(
    eval_df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """DISTINCT hashed n-grams of the eval/benchmark set, as a one-column
    relation ready to broadcast. The distinct here is fine — the eval set
    is small by construction."""
    prepared = _parallelize_small(eval_df.select(text_col)).withColumn(
        "__words", words(F.lower(F.col(text_col)))
    )
    return (
        prepared.select(
            F.explode(
                F.array_distinct(shingles_from_words(F.col("__words"), n))
            ).alias("__shingle")
        )
        .select(F.xxhash64("__shingle").alias("gram"))
        .distinct()
    )


def contamination_hits(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_hits: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Contamination report: (id, n_hits) for every training document
    sharing ≥ ``min_hits`` distinct n-grams with the eval set.

    ``broadcast_eval=False`` falls back to a shuffling join for the rare
    eval set too large to broadcast (leave True for real benchmarks).
    """
    grams = doc_gram_table(corpus, id_col, text_col, n)
    eval_grams = eval_gram_set(eval_df, text_col, n)
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    return (
        grams.join(eval_grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def contamination_hits_bloom(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_hits: int = 1,
    m_bits: int = 1 << 20,
    k_hashes: int = 3,
) -> DataFrame:
    """:func:`contamination_hits` for eval sets TOO LARGE to broadcast
    as a gram set — the Bloom pre-filter composition.

    ``broadcast_eval=False`` exists for that case but pays a full
    corpus-gram shuffle into the join. Here the eval grams build a
    FIXED-SIZE Bloom filter (``terms.bloom_registers`` — ≤ m_bits/32
    packed words regardless of eval size), :func:`terms.bloom_prefilter`
    drops definitely-absent corpus grams at scan speed (k broadcast
    word-lookups, no shuffle), and only the surviving candidates — true
    hits plus an FP-rate-sized excess — enter the exact shuffling join.
    At 100 TB that turns "shuffle every corpus gram" into "shuffle
    ≈ the benchmark-overlap volume".

    Result-IDENTICAL to :func:`contamination_hits` by the
    no-false-negative contract: the pre-filter can only drop grams the
    exact join would drop anyway (asserted in tests, including with a
    deliberately saturated tiny filter)."""
    from .terms import bloom_prefilter, bloom_registers

    grams = doc_gram_table(corpus, id_col, text_col, n)
    eval_grams = eval_gram_set(eval_df, text_col, n)
    filt = bloom_registers(
        eval_grams, "gram", m_bits=m_bits, k_hashes=k_hashes
    )
    candidates = bloom_prefilter(
        filt, grams, "gram", m_bits=m_bits, k_hashes=k_hashes
    )
    return (
        candidates.join(eval_grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """The clean corpus: anti-join away every contaminated document.

    The hit set is benchmark-overlap-sized (small), so Spark/AQE plans the
    anti join as a broadcast — the corpus passes through at scan speed.
    """
    hits = contamination_hits(corpus, eval_df, id_col, text_col, n, min_hits)
    return corpus.join(hits.select(id_col), id_col, "left_anti")


def fuzzy_contamination_pairs(
    corpus: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    seed: int = 42,
    corpus_index: tuple[DataFrame, DataFrame] | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """NEAR-duplicate contamination: ``(doc_id, eval_id, jaccard)`` for
    every (training doc, eval doc) pair with n-gram Jaccard ≥ threshold.

    Exact n-gram overlap (:func:`contamination_hits`) misses lightly
    edited benchmark copies — reworded prompts, shuffled answer options,
    whitespace-mangled passages — which production decontamination
    (GPT-3 appx. C, Llama 2 §A.6) treats with fuzzy matching. This is the
    MinHash+LSH tier applied CROSS-corpus: both sides are signed with the
    identical seeded family (``dedup.minhash_index`` — same seed ⇒ same
    buckets, the property incremental dedup already rests on), the eval
    side's band table is broadcast, and the corpus band table probes it
    with a broadcast hash join — the corpus is never shuffled against the
    eval set. Candidates are verified EXACTLY per pair via
    ``array_intersect`` on the hashed-shingle arrays (the
    ``dedup._verify_jaccard`` arithmetic), so banding only ever drops
    pairs below its catch probability, never admits a false positive.

    Scale: the corpus-side cost is one signing pass (or zero — pass
    ``corpus_index=(band_rows, arrays)`` from a persisted
    ``minhash_index`` to decontaminate against a new benchmark without
    re-reading the corpus); the join output is benchmark-overlap-sized.
    The eval side is small by construction (thousands of docs), so its
    bands and arrays broadcast; ``broadcast_eval=False`` falls back to
    shuffling joins for the rare eval set too large to broadcast — same
    escape hatch, and identical output, as :func:`contamination_hits`.
    """
    from .dedup import _verify_jaccard, minhash_index  # shared arithmetic

    if corpus_index is not None:
        c_bands, c_arrays = corpus_index
    else:
        c_bands, c_arrays = minhash_index(
            corpus, id_col, text_col, n, num_hashes, bands, seed
        )
    e_bands, e_arrays = minhash_index(
        eval_df, eval_id_col, text_col, n, num_hashes, bands, seed
    )
    e_bands = e_bands.select(
        F.col(eval_id_col).alias("__eval_id"), "band", "bucket"
    )
    if broadcast_eval:
        e_bands = F.broadcast(e_bands)
    candidates = (
        c_bands.join(e_bands, ["band", "bucket"])
        .select(F.col(id_col).alias("id_1"), F.col("__eval_id").alias("id_2"))
        .distinct()
    )
    # cross-table verify: corpus arrays on id_1, broadcast eval arrays on
    # id_2 — the id namespaces are distinct relations, so equal ids on the
    # two sides are two different documents, never a self-pair
    a1 = c_arrays.select(
        F.col(id_col).alias("id_1"),
        F.col("__sh").alias("__sh1"),
        F.size("__sh").alias("n_1"),
    )
    a2 = e_arrays.select(
        F.col(eval_id_col).alias("id_2"),
        F.col("__sh").alias("__sh2"),
        F.size("__sh").alias("n_2"),
    )
    if broadcast_eval:
        a2 = F.broadcast(a2)
    n_common = F.size(F.array_intersect("__sh1", "__sh2"))
    return (
        candidates.join(a1, "id_1")
        .join(a2, "id_2")
        .withColumn("__nc", n_common)
        .withColumn(
            "jaccard",
            F.col("__nc")
            * F.lit(1.0)
            / (F.col("n_1") + F.col("n_2") - F.col("__nc")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("id_1").alias(id_col),
            F.col("id_2").alias("eval_id"),
            "jaccard",
        )
    )


def fuzzy_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    seed: int = 42,
    corpus_index: tuple[DataFrame, DataFrame] | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """The fuzzily-clean corpus: anti-join away every training document
    whose n-gram Jaccard against ANY eval document reaches ``threshold``.
    The flagged set is benchmark-overlap-sized, so AQE plans the anti
    join as a broadcast and the corpus passes through at scan speed."""
    flagged = fuzzy_contamination_pairs(
        corpus,
        eval_df,
        id_col=id_col,
        text_col=text_col,
        eval_id_col=eval_id_col,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        seed=seed,
        corpus_index=corpus_index,
        broadcast_eval=broadcast_eval,
    )
    return corpus.join(
        flagged.select(id_col).distinct(), id_col, "left_anti"
    )
