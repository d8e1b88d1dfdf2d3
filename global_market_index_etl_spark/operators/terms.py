"""Corpus term statistics: TF-IDF scoring, document frequency, heavy
hitters (driver north star; training-data text-analysis tier alongside
operators/text.py).

Where text.py is strictly per-row (scan-speed, zero shuffle), these
operators are the *corpus-level* statistics — vocabulary discovery,
stopword/boilerplate identification, per-document salient terms — and
every shuffle is keyed and partially aggregated:

- TF: one shuffle on (doc, word) with map-side combine;
- DF: one shuffle on word over the already-unique (doc, word) pairs;
- top-k per doc: one shuffle on doc for the ranking window.

No corpus-sized broadcast anywhere: the vocabulary can be millions of
terms at 100 TB, so DF joins back to TF as an ordinary keyed shuffle join
(AQE converts it to broadcast when the filtered vocabulary is small). The
only broadcast is the 1-row corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .text import words
from .util import parallelize_small as _parallelize_small


def term_frequencies(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, word, tf) — whitespace terms, lowercased. One partial-aggregated
    shuffle on (id, word)."""
    prepared = _parallelize_small(df.select(id_col, text_col)).withColumn(
        "__words", words(F.lower(F.col(text_col)))
    )
    return (
        prepared.select(F.col(id_col), F.explode("__words").alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def document_frequencies(tf: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(word, df) from the TF table — (id, word) is already unique there,
    so DF is a count, not a count-distinct (no second dedup shuffle)."""
    return tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Top-k salient terms per document by smoothed TF-IDF:
    ``tf * (ln((N+1)/(df+1)) + 1)``, ties broken by word for a fully
    deterministic ranking. ``min_df`` drops hapax noise before the join.

    N is the total corpus document count, carried as a broadcast 1-row
    relation (no driver-side ``.count()`` action in the plan).
    """
    tf = term_frequencies(docs, id_col, text_col)
    dfreq = document_frequencies(tf, id_col)
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n_docs"))
    scored = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (
                F.log(
                    (F.col("__n_docs") + F.lit(1)).cast("double")
                    / (F.col("df") + F.lit(1)).cast("double")
                )
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("word")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "term_rank", "word", "tf", "df", "tfidf")
    )


def top_terms_global(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    by_document_frequency: bool = False,
) -> DataFrame:
    """Corpus heavy hitters: the k most frequent terms, by total occurrence
    count (default) or by document frequency. Partial-aggregated shuffle on
    word, then a TakeOrderedAndProject (no global sort materialization).
    Ties broken by word ascending.
    """
    if by_document_frequency:
        counts = document_frequencies(
            term_frequencies(docs, id_col, text_col), id_col
        ).select("word", F.col("df").alias("n"))
    else:
        prepared = _parallelize_small(docs.select(text_col)).withColumn(
            "__words", words(F.lower(F.col(text_col)))
        )
        counts = (
            prepared.select(F.explode("__words").alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    return counts.orderBy(F.desc("n"), F.asc("word")).limit(k)
