"""Perceptual image hashing — near-duplicate IMAGE detection, extending
the dedup family across modalities.

Text near-dup has four tiers (operators/dedup.py); image near-dup gets
the standard 64-bit pHash (DCT perceptual hash — the public algorithm
behind pHash.org/imagehash, widely used for training-image dedup):

1. decode (the engine's own codecs: PNG/GIF/JPEG via
   ``multimodal.decode_image`` — no external libraries);
2. ITU-R BT.601 luma, nearest-neighbor resample to 32×32 (content scale
   normalization — resizes and re-encodes of the same picture land on
   the same grid);
3. 2-D DCT-II (an exact 32×32 orthonormal DCT matrix product — numpy
   matmul, no scipy), keep the top-left 8×8 low-frequency block minus
   the DC term;
4. each of the 64 coefficients contributes one bit: above the median →
   1. Brightness/contrast shifts move only DC and uniform gain, so the
   hash is EXACTLY invariant to them (pinned in tests); small content
   edits flip few bits.

Pair finding reuses the pigeonhole Hamming kernel
(:func:`operators.dedup.hamming_block_pairs`) — the same lossless
blocked equi-join SimHash uses, so image near-dup at corpus scale is one
Arrow-batched decode pass plus a keyed join, never all-pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

from .dedup import hamming_block_pairs

__all__ = [
    "phash64_array",
    "image_phash",
    "phash_near_pairs",
    "incremental_phash_pairs",
]


def _dct_matrix(n: int):
    """Orthonormal DCT-II matrix (type-II, norm='ortho') — exact, tiny."""
    import numpy as np

    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    c = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    c[0, :] = np.sqrt(1.0 / n)
    return c


def phash64_array(img) -> int:
    """64-bit perceptual hash of an ``(h, w, 3)`` uint8 array — the pure
    numpy reference the distributed operator maps over."""
    import numpy as np

    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB, got {img.shape}")
    h, w, _ = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    luma = (
        0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    )
    rows = (np.arange(32) * h) // 32
    cols = (np.arange(32) * w) // 32
    small = luma[rows][:, cols]
    c = _dct_matrix(32)
    d = c @ small @ c.T
    block = d[:8, :8].copy()
    block[0, 0] = 0.0  # drop DC — brightness invariance
    flat = block.reshape(-1)
    med = float(np.median(flat))
    bits = flat > med
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    # to signed int64 (Spark LongType)
    return out - (1 << 64) if out >= (1 << 63) else out


def image_phash(
    media: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """(id, phash) per image payload — Arrow-batched decode + hash; the
    embarrassingly parallel pass, one signature row per image."""

    def run(it: Iterator) -> Iterator:
        import pandas as pd

        from .multimodal import decode_image

        for pdf in it:
            hashes = [
                phash64_array(decode_image(bytes(p)))
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "phash": hashes})

    return media.select(id_col, payload_col).mapInPandas(
        run, f"{id_col} long, phash long"
    )


def phash_near_pairs(
    media: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 7,
    blocks: int = 8,
) -> DataFrame:
    """Near-duplicate image pairs (Hamming ≤ ``max_hamming`` over pHash):
    ``(id_1, id_2, hamming)``. Same pigeonhole blocking guarantees as
    SimHash — lossless for ``max_hamming ≤ blocks − 1``; widen ``blocks``
    down (and tighten the radius) as the corpus grows, exactly the
    ``auto_simhash_blocks`` trade."""
    from .util import materialize

    if max_hamming >= blocks:  # before the eager decode pass, see below
        raise ValueError("pigeonhole blocking requires max_hamming < blocks")
    # materialize signatures before the self-join — without it both join
    # sides recompute the decode+DCT pass from the same mapInPandas
    # lineage (the cost simhash_near_pairs also caches away)
    sigs = materialize(image_phash(media, payload_col=payload_col, id_col=id_col))
    return hamming_block_pairs(
        sigs,
        id_col=id_col,
        sig_col="phash",
        max_hamming=max_hamming,
        blocks=blocks,
    )


def incremental_phash_pairs(
    new_media: DataFrame,
    index_sigs: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 7,
    blocks: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup image pairs for a NEW batch against an already-hashed
    corpus — without re-decoding or re-hashing one stored image (the
    image twin of :func:`dedup.incremental_minhash_pairs`, completing
    the incremental-index family across modalities).

    ``index_sigs`` is the persisted ``(id, phash)`` table previous
    batches produced (:func:`image_phash` output — deterministic from
    payloads, so yesterday's index and today's batch hash identically).
    Batch cost is |batch| decode+DCT plus a pigeonhole bucket join whose
    LEFT side is batch-sized; the stored index contributes only its
    bucket partitions, never a rescan of payload bytes. Returned pairs
    are exactly the full-corpus pairs that INVOLVE a new image
    (new×indexed ∪ new×new); old×old pairs were emitted when those
    images were indexed, which is what makes
    ``pairs(b1) ∪ incremental(b2 | b1)`` ≡ ``pairs(b1 ∪ b2)``
    (asserted in tests).

    Returns ``(pairs, new_sigs)`` — append ``new_sigs`` to the stored
    index (e.g. ``storage.merge_into_parquet``) to complete the tick.
    """
    from .dedup import hamming_block_pairs_against
    from .util import materialize

    # front-load the pigeonhole argument check: materialize() below runs
    # the full decode+DCT pass eagerly, and wasting it on a ValueError
    # the join helper would raise anyway is pure loss (round-9 review)
    if max_hamming >= blocks:
        raise ValueError("pigeonhole blocking requires max_hamming < blocks")
    new_sigs = materialize(
        image_phash(new_media, payload_col=payload_col, id_col=id_col)
    )
    all_sigs = index_sigs.select(id_col, "phash").unionByName(new_sigs)
    pairs = hamming_block_pairs_against(
        new_sigs,
        all_sigs,
        id_col=id_col,
        sig_col="phash",
        max_hamming=max_hamming,
        blocks=blocks,
    )
    return pairs, new_sigs
