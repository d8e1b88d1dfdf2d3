"""Document chunking + sequence packing — the preprocessing pair between a
curated corpus and a pretraining tokenizer (driver north star; beyond the
reference surface).

- ``chunk_documents``: split each document into fixed-token-count chunks
  (optionally overlapping) with deterministic (doc_id, chunk_idx) identity.
  Pure array expressions — the word array is sliced per chunk index inside
  one ``transform`` — so chunking is a narrow, shuffle-free map at any
  corpus size, and a chunk's identity never depends on partitioning.
- ``pack_fixed_chunks``: group fixed-size chunks into training sequences of
  ``chunks_per_pack`` chunks. Exact greedy packing is a sequential scan —
  hostile to distribution — but with UNIFORM chunks (what chunk_documents
  emits) packing reduces to row-numbering: hash-bucket the chunks, number
  them within each bucket, and ``pack_id = (bucket, rn div k)``. Fully
  parallel, deterministic on any cluster size, and every pack except at
  most one tail per bucket is exactly full — the same packing efficiency a
  sequential packer gets on uniform pieces.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .text import words


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """One row per (doc, chunk): ``(id, chunk_idx, chunk_text, n_tokens)``.

    Chunks are ``chunk_tokens`` words long with ``overlap`` words shared
    between consecutive chunks (stride = chunk_tokens - overlap); the last
    chunk keeps the tail (may be short). Empty/NULL documents produce no
    rows. Deterministic: chunk_idx is the 0-based stride index, so the
    same document always yields the same chunks regardless of
    partitioning — the identity requirement for downstream dedup against
    chunk fingerprints.

    Every chunk after the first contributes at least one token not covered
    by its predecessor: with ``overlap`` > 0, start offsets stop before
    ``n_words - overlap`` (a later start's chunk would sit entirely inside
    the previous chunk, duplicating content in the training corpus).
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap} — an "
            "overlap >= chunk size never advances and loops forever"
        )
    stride = chunk_tokens - overlap
    prepared = df.select(id_col, text_col).withColumn(
        "__words", words(F.col(text_col))
    )
    n_w = F.size("__words")
    # start offsets 0, stride, 2*stride, ... < n_words - overlap: a start in
    # [n_words - overlap, n_words) yields a chunk fully contained in the
    # previous one (its tokens are the previous chunk's last < chunk_tokens
    # tokens), so it is excluded.  overlap=0 reduces to "< n_words".
    starts = F.sequence(
        F.lit(0), F.greatest(n_w - overlap - 1, F.lit(0)), F.lit(stride)
    )
    chunks = F.transform(
        starts,
        lambda s: F.array_join(
            F.slice(F.col("__words"), s + 1, chunk_tokens), " "
        ),
    )
    return (
        prepared.filter(n_w > 0)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
        .withColumn(
            "n_tokens",
            F.size(F.split(F.col("chunk_text"), r"\s+")).cast("int"),
        )
    )


def pack_fixed_chunks(
    df: DataFrame,
    chunks_per_pack: int,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    text_col: str = "chunk_text",
    n_buckets: int = 256,
) -> DataFrame:
    """Pack uniform chunks into sequences: one row per pack with the
    ordered chunk texts and their (doc, idx) provenance.

    ``pack_id`` = (hash bucket of the doc id) × 2^32 + (per-bucket pack
    ordinal) — stable, collision-free, and derivable without any global
    coordination. Within a bucket, chunks order by (doc, chunk_idx), so a
    document's chunks stay adjacent (sequence-coherent packs) and the
    assignment is deterministic under any partitioning. One shuffle on the
    bucket; each bucket's row-numbering is the only serial region, sized
    1/n_buckets of the data.
    """
    if chunks_per_pack <= 0:
        raise ValueError(
            f"chunks_per_pack must be positive, got {chunks_per_pack}"
        )
    bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    w = Window.partitionBy("__bucket").orderBy(id_col, idx_col)
    packed = (
        df.withColumn("__bucket", bucket)
        .withColumn("__rn", F.row_number().over(w) - 1)
        .withColumn(
            "pack_id",
            F.col("__bucket") * F.lit(1 << 32)
            + (F.col("__rn") / chunks_per_pack).cast("long"),
        )
    )
    return (
        packed.groupBy("pack_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("__rn").alias("pos"),
                        F.col(id_col).alias("doc_id"),
                        F.col(idx_col).alias("chunk_idx"),
                        F.col(text_col).alias("chunk_text"),
                    )
                )
            ).alias("__parts"),
        )
        .select(
            "pack_id",
            F.transform("__parts", lambda p: p.chunk_text).alias("texts"),
            F.transform(
                "__parts",
                lambda p: F.struct(p.doc_id.alias("doc_id"), p.chunk_idx.alias("chunk_idx")),
            ).alias("provenance"),
            F.size("__parts").alias("n_chunks"),
        )
    )
