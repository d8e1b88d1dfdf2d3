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
    hash_fn: str = "xxhash64",
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

    ``hash_fn``: ``"xxhash64"`` (default, fastest — one JVM hash) or
    ``"md5"`` (portable — bucket = first 8 md5 hex chars of the id
    string, reproducible by ANY engine; the export_training_shards dial,
    which is what lets the packing carry a full SQL oracle).
    """
    if chunks_per_pack <= 0:
        raise ValueError(
            f"chunks_per_pack must be positive, got {chunks_per_pack}"
        )
    if n_buckets < 1:
        # pmod(x, 0) yields NULL buckets (non-ANSI) and every chunk would
        # silently collapse into ONE unbounded NULL pack — fail loudly at
        # the API boundary like pack_documents_best_fit (code-review fix)
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from .util import portable_id_hash

    bucket = F.pmod(portable_id_hash(F.col(id_col), hash_fn), F.lit(n_buckets))
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
    # group by (__bucket, pack_id), not pack_id alone: pack_id determines
    # the bucket (pack_id >> 32 == __bucket), so the grouping is identical
    # — but hash-partitioning on __bucket (already in place from the
    # row-number window) satisfies the clustered distribution of the
    # superset key, and Catalyst reuses that exchange instead of adding a
    # second full shuffle of the chunk set (plan-asserted in tests)
    return (
        packed.groupBy("__bucket", "pack_id")
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


def pack_documents_best_fit(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int = 256,
) -> DataFrame:
    """Pack VARIABLE-length documents into ≤ ``max_tokens`` bins with
    minimal padding — best-fit-decreasing, distributed.

    ``pack_fixed_chunks`` covers the uniform-chunk case where packing
    degenerates to row-numbering; whole-document packing (no document
    split across sequences — the attention-boundary-preserving regime,
    cf. Ding et al., "Fewer Truncations Improve Language Modeling", ICML
    2024) is genuine bin packing, which is inherently sequential. The
    distributed decomposition:

    1. hash-bucket documents by id — each bucket sees a REPRESENTATIVE
       sample of the corpus length distribution, so per-bucket packing
       quality tracks global packing quality (the same argument as
       hash-bucketed sampling), and each bucket is 1/n_buckets of the
       corpus — sized to executor memory via ``n_buckets``;
    2. per bucket, an Arrow-batched ``applyInPandas`` runs exact
       best-fit-decreasing (sort by tokens desc with id tie-break; place
       each doc in the FULLEST bin that still fits, via bisect on a
       sorted remaining-capacity list): the classic ≤ 11/9·OPT + 1 bins
       guarantee holds per bucket. Bin packing has no SQL/codegen form —
       this is the legitimate Python-path category (like the BPE encoder),
       and the per-row work is O(log bins).

    Documents LONGER than ``max_tokens`` become single-doc packs flagged
    ``oversize=true`` (the caller chunks them first if truncation is
    unacceptable) — they are never silently dropped or truncated.

    Returns one row per document: ``(id, tokens, pack_id, oversize)``
    with ``pack_id`` = bucket × 2^32 + per-bucket ordinal (stable,
    collision-free, no global coordination). Deterministic under any
    partitioning: the per-bucket input set is partition-independent and
    the packer sorts before placing.
    """
    import bisect

    import pandas as pd

    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if n_buckets < 1:
        # pmod(x, 0) yields NULL buckets and the failure would surface as
        # an obscure NaN/groupBy-on-null error inside pack_bucket — fail
        # loudly at the API boundary like max_tokens (round-8 review fix)
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")

    def pack_bucket(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # a negative count would mint a bin with remaining capacity ABOVE
        # max_tokens (silently breaking the capacity guarantee); a null
        # becomes NaN and crashes obscurely — both are contract
        # violations, surfaced with a clear error (round-8 review fix)
        if pdf["__tok"].isna().any() or (pdf["__tok"] < 0).any():
            bad = pdf.loc[
                pdf["__tok"].isna() | (pdf["__tok"] < 0), "__id"
            ].head(3).tolist()
            raise ValueError(
                f"token counts must be non-negative and non-null; "
                f"offending ids include {bad}"
            )
        pdf = pdf.sort_values(
            ["__tok", "__id"], ascending=[False, True]
        ).reset_index(drop=True)
        bucket = int(pdf["__bucket"].iloc[0]) if len(pdf) else 0
        # parallel sorted structures: remaining capacity (asc) + bin index
        caps: list[int] = []
        cap_bins: list[int] = []
        n_bins = 0
        assignment = []
        oversize = []
        for tok in pdf["__tok"]:
            tok = int(tok)
            if tok > max_tokens:
                assignment.append(n_bins)
                oversize.append(True)
                n_bins += 1  # closed single-doc bin; never reopened
                continue
            # best fit: the SMALLEST remaining capacity >= tok
            i = bisect.bisect_left(caps, tok)
            if i < len(caps):
                b = cap_bins.pop(i)
                rem = caps.pop(i) - tok
            else:
                b = n_bins
                n_bins += 1
                rem = max_tokens - tok
            j = bisect.bisect_left(caps, rem)
            caps.insert(j, rem)
            cap_bins.insert(j, b)
            assignment.append(b)
            oversize.append(False)
        out = pdf[["__id", "__tok"]].copy()
        out["pack_id"] = [
            (bucket << 32) + b for b in assignment
        ]
        out["oversize"] = oversize
        return out

    prepared = df.select(
        F.col(id_col).alias("__id"),
        F.col(tokens_col).cast("long").alias("__tok"),
    ).withColumn("__bucket", F.pmod(F.xxhash64(F.col("__id")), F.lit(n_buckets)))
    packed = prepared.groupBy("__bucket").applyInPandas(
        pack_bucket, "__id long, __tok long, pack_id long, oversize boolean"
    )
    return packed.select(
        F.col("__id").alias(id_col),
        F.col("__tok").alias(tokens_col),
        "pack_id",
        "oversize",
    )
