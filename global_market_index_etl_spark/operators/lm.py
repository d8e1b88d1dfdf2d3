"""N-gram language-model perplexity scoring — the CCNet-style quality
signal, trained distributively on the corpus itself.

The filtering tier so far is heuristic (text.quality metrics) and
model-shaped (text.model_quality_classifier); production curation
pipelines add a third signal: perplexity under a small language model
(CCNet, Wenzek et al., LREC 2020 — KenLM over Wikipedia; Gopher and
RedPajama filter on the same statistic). A full Kneser-Ney LM is a
codebase; the distributed re-expression here is the add-k-smoothed
BIGRAM model, which already separates fluent text from gibberish and
boilerplate, and whose training IS the classic Spark workload:

- TRAIN: one pass — per-document bigrams explode (sentence-start token
  prepended), ``groupBy (w1, w2)`` with partial aggregation; unigram
  context counts derive from the same table by a second small groupBy.
  Model size is vocabulary-shaped, stored as a DataFrame (join-able,
  persistable with the storage layer — never a driver object).
- SCORE: per-document bigrams join the model on (w1, w2) — an ordinary
  keyed shuffle join (AQE broadcasts a small model on its own); unseen
  bigrams fall back to the smoothed floor ``k / (C(w1) + k·V)``; the
  score is average negative log2 probability per token (= log2
  perplexity), aggregated with exact double sums.

Determinism: counts are exact integers; log/÷ are IEEE doubles evaluated
in a fixed order per row, so scores are engine-reproducible (twin-tested
against a pure-python reference).

Scale: training shuffles one row per distinct bigram (Zipf-bounded, far
under corpus size); scoring shuffles doc-bigrams once. A hot bigram
("of the") pre-aggregates map-side on both paths. No driver state, no
UDF — everything is codegen expressions + joins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .text import words

__all__ = [
    "train_bigram_lm",
    "score_bigram_perplexity",
    "score_bigram_bits_scaled",
    "BOS",
]

# sentence-start context token. Tokenization is plain whitespace split, so
# a hostile document could CONTAIN the literal sentinel and alias the
# sentence-start context, skewing counts and scores for it — _doc_bigrams
# therefore DROPS any token equal to BOS (round-8 review fix; the only
# text change is removing a non-printable-prefixed pseudo-token).
BOS = "\x02<s>"


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per bigram occurrence, BOS-prefixed, over
    lowercase whitespace tokens (the corpus-wide tokenization). Tokens
    equal to the BOS sentinel are dropped so no document can forge the
    sentence-start context (see BOS above)."""
    toks = docs.select(
        F.col(id_col),
        F.concat(
            F.array(F.lit(BOS)),
            F.filter(
                words(F.lower(F.col(text_col))), lambda w: w != F.lit(BOS)
            ),
        ).alias("__t"),
    ).where(F.size("__t") >= 2)
    return toks.select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice("__t", 1, F.size("__t") - 1),
                F.slice("__t", 2, F.size("__t") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("__bg"),
    ).select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))


def train_bigram_lm(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram count table ``(w1, w2, c12, c1)`` — ``c12`` the bigram count,
    ``c1`` the context's total continuation count. One corpus pass plus a
    vocabulary-sized window; persist with the storage layer to reuse
    across scoring runs."""
    bg = _doc_bigrams(docs, id_col, text_col)
    counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    from pyspark.sql import Window

    c1 = F.sum("c12").over(Window.partitionBy("w1"))
    return counts.withColumn("c1", c1)


def score_bigram_perplexity(
    docs: DataFrame,
    model: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int | None = None,
    k: float = 1.0,
) -> DataFrame:
    """Per-document ``(id, n_bigrams, log2_ppl)`` under the add-``k``
    smoothed bigram model: ``p(w2|w1) = (c12 + k) / (c1 + k·V)``; unseen
    bigrams/contexts use ``c12 = 0`` / ``c1 = 0``. ``log2_ppl`` is the
    average ``-log2 p`` per bigram — lower = more corpus-like; curation
    thresholds on it exactly as CCNet buckets its KenLM scores.

    EVERY input document gets exactly one output row: docs with no
    scorable bigram (empty/whitespace/null text) return ``n_bigrams = 0``
    and ``log2_ppl = NULL`` — explicit "unscorable", never silently
    missing, so joins back onto the corpus cannot drop documents
    (round-8 review fix)."""
    if vocab_size is None:
        # bounded driver action: one row (distinct continuation count)
        vocab_size = int(
            model.select(F.countDistinct("w2").alias("v")).first()["v"]
        ) or 1
    if k <= 0:
        raise ValueError(f"smoothing k must be positive, got {k}")
    bg = _doc_bigrams(docs, id_col, text_col)
    # two lookups: the bigram count AND the context count — a left join on
    # (w1, w2) alone would lose C(w1) for unseen bigrams with SEEN
    # contexts, overweighting exactly the tokens smoothing must handle
    contexts = model.groupBy("w1").agg(F.max("c1").alias("c1"))
    joined = bg.join(
        model.select("w1", "w2", "c12"), ["w1", "w2"], "left"
    ).join(contexts, ["w1"], "left")
    p = (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(float(k))) / (
        F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(k * vocab_size))
    )
    neg_log2 = -F.log2(p)
    scored = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.sum(neg_log2) / F.count(F.lit(1))).alias("log2_ppl"),
    )
    # null-safe join: a NULL id is a legal (if ugly) document identity —
    # groupBy put its score under the NULL key, and a plain equi-join
    # would drop that row and mislabel the doc unscorable (review fix)
    every_doc = docs.select(id_col).dropDuplicates([id_col]).alias("e")
    s = scored.alias("s")
    return every_doc.join(
        s, F.col(f"e.{id_col}").eqNullSafe(F.col(f"s.{id_col}")), "left"
    ).select(
        F.col(f"e.{id_col}").alias(id_col),
        F.coalesce(F.col("s.n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.col("s.log2_ppl").alias("log2_ppl"),
    )


def score_bigram_bits_scaled(
    docs: DataFrame,
    model: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int | None = None,
    k: float = 1.0,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """:func:`score_bigram_perplexity` in CROSS-ENGINE-EXACT integer form:
    ``(id, n_bigrams, bits_scaled)`` where each bigram contributes
    ``round(-log2(p) * scale)`` as a BIGINT and ``bits_scaled`` is their
    exact integer sum (average bits = ``bits_scaled / n_bigrams / scale``).

    Why this variant exists: the float score sums per-bigram doubles in
    partition order, so the last ulp depends on the summation order — fine
    for thresholds, fatal for the hash-exact oracle comparison the driver
    runs. Rounding each bigram's cost to an integer FIRST makes the sum
    order-independent and engine-portable: +,×,÷ are IEEE-exact on the
    operands, and a libm-vs-JVM log2 ulp difference only matters when a
    cost sits within ~1e-7 of a rounding boundary at nano scale (verified
    zero occurrences on the fixture corpus; any future hit is a visible
    hash mismatch, not silent drift). Same plan shape as the float scorer:
    two keyed joins + one partial-agg groupBy, no UDF.

    Unscorable docs (no bigram) keep their explicit row with
    ``n_bigrams = 0`` and NULL ``bits_scaled``.

    Unlike the float scorer, the vocabulary size defaults to an IN-PLAN
    1-row aggregate (broadcast cross join) instead of a driver action —
    the whole scoring stays one lazy plan, composable into larger
    pipelines without forcing a pass at plan-construction time.
    """
    if k <= 0:
        raise ValueError(f"smoothing k must be positive, got {k}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    bg = _doc_bigrams(docs, id_col, text_col)
    contexts = model.groupBy("w1").agg(F.max("c1").alias("c1"))
    joined = bg.join(
        model.select("w1", "w2", "c12"), ["w1", "w2"], "left"
    ).join(contexts, ["w1"], "left")
    if vocab_size is None:
        vrel = model.agg(
            F.greatest(F.countDistinct("w2"), F.lit(1)).alias("__v")
        )
        joined = joined.crossJoin(F.broadcast(vrel))
        v_term = F.lit(float(k)) * F.col("__v").cast("double")
    else:
        v_term = F.lit(float(k * vocab_size))
    p = (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(float(k))) / (
        F.coalesce(F.col("c1"), F.lit(0)) + v_term
    )
    cost = F.round(-F.log2(p) * F.lit(float(scale))).cast("long")
    scored = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(cost).alias("bits_scaled"),
    )
    every_doc = docs.select(id_col).dropDuplicates([id_col]).alias("e")
    s = scored.alias("s")
    return every_doc.join(
        s, F.col(f"e.{id_col}").eqNullSafe(F.col(f"s.{id_col}")), "left"
    ).select(
        F.col(f"e.{id_col}").alias(id_col),
        F.coalesce(F.col("s.n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.col("s.bits_scaled").alias("bits_scaled"),
    )
