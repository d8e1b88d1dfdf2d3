"""Perceptual image hashing: brightness invariance (exact), perturbation
robustness, distinct-image separation, and the blocked pair join."""

from __future__ import annotations

import numpy as np

from global_market_index_etl_spark.operators.multimodal import encode_png
from global_market_index_etl_spark.operators.phash import (
    image_phash,
    phash64_array,
    phash_near_pairs,
)


def _rand_img(rng, h=24, w=24):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_brightness_shift_exact_invariance():
    rng = np.random.default_rng(3)
    img = rng.integers(40, 200, size=(32, 32, 3), dtype=np.uint8)
    brighter = np.clip(img.astype(int) + 30, 0, 255).astype(np.uint8)
    # +30 on every channel moves only the DC coefficient, which pHash drops
    assert phash64_array(img) == phash64_array(brighter)


def test_phash_small_edit_close_distinct_far():
    rng = np.random.default_rng(5)
    base = _rand_img(rng, 48, 48)
    edited = base.copy()
    edited[:4, :4] = 255  # small local edit
    other = _rand_img(rng, 48, 48)
    d_edit = _hamming(phash64_array(base), phash64_array(edited))
    d_other = _hamming(phash64_array(base), phash64_array(other))
    assert d_edit <= 12
    assert d_other >= 20
    assert d_edit < d_other


def test_phash_resize_robust():
    rng = np.random.default_rng(9)
    # a smooth image (random low-res upsampled) survives resampling
    low = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    big = np.repeat(np.repeat(low, 8, axis=0), 8, axis=1)  # 64x64
    small = np.repeat(np.repeat(low, 4, axis=0), 4, axis=1)  # 32x32
    d = _hamming(phash64_array(big), phash64_array(small))
    assert d <= 6


def test_phash_near_pairs_finds_planted_dups(spark):
    rng = np.random.default_rng(11)
    imgs = {}
    for i in range(10):
        imgs[i] = _rand_img(rng, 40, 40)
    # plant: 100+i is a brightness-shifted copy of i (exact hash match)
    rows = []
    for i, img in imgs.items():
        rows.append((i, bytearray(encode_png(img))))
        if i < 3:
            shifted = np.clip(img.astype(int) + 25, 0, 255).astype(np.uint8)
            rows.append((100 + i, bytearray(encode_png(shifted))))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {
        (r.id_1, r.id_2)
        for r in phash_near_pairs(df, max_hamming=7, blocks=8).collect()
    }
    for i in range(3):
        assert (i, 100 + i) in pairs, (i, sorted(pairs))
    # distinct random images must not pair up
    assert all(a % 100 == b % 100 for a, b in pairs), sorted(pairs)


def test_image_phash_matches_reference(spark):
    rng = np.random.default_rng(21)
    rows = []
    expect = {}
    for i in range(6):
        img = _rand_img(rng, 20, 28)
        rows.append((i, bytearray(encode_png(img))))
        expect[i] = phash64_array(img)
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r.phash for r in image_phash(df).collect()}
    assert got == expect


# --------------------------------------------------------------------- #
# video motion features (round 8)
# --------------------------------------------------------------------- #


def test_video_motion_static_vs_moving(spark):
    from global_market_index_etl_spark.operators.multimodal import (
        encode_avi,
        video_motion_features,
    )

    rng = np.random.default_rng(17)
    frame = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    static = [frame] * 6
    moving = [
        np.roll(frame, shift=i * 3, axis=1) for i in range(6)
    ]  # horizontal pan
    cut = [frame] * 3 + [255 - frame] * 3  # hard scene cut
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_avi(static))),
            (2, bytearray(encode_avi(moving))),
            (3, bytearray(encode_avi(cut))),
        ],
        "media_id long, payload binary",
    )
    got = {r.media_id: r for r in video_motion_features(df).collect()}
    assert got[1].n_frames == 6 and (got[1].height, got[1].width) == (16, 16)
    assert got[1].motion_energy == 0.0 and got[1].motion_peak == 0.0
    assert got[2].motion_energy > 0.05
    # the cut clip: one huge jump dominates the peak, energy modest
    assert got[3].motion_peak > got[3].motion_energy * 2
    assert got[3].motion_peak > got[2].motion_peak


def test_video_motion_single_frame_and_quarantine(spark):
    import pytest

    from global_market_index_etl_spark.operators.multimodal import (
        encode_avi,
        video_motion_features,
    )

    rng = np.random.default_rng(23)
    one = [rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)]
    df = spark.createDataFrame(
        [(1, bytearray(encode_avi(one)))], "media_id long, payload binary"
    )
    [r] = video_motion_features(df).collect()
    assert r.n_frames == 1 and r.motion_energy == 0.0

    bad = spark.createDataFrame(
        [(2, bytearray(b"garbage-not-avi"))], "media_id long, payload binary"
    )
    with pytest.raises(Exception):
        video_motion_features(bad).collect()


def test_phash_near_pairs_query_matches_brute_force(spark):
    """Exact twin for the mm_phash_near_pairs driver row: the registry
    query's pair set (pigeonhole-joined, engine PNG decode) must equal a
    pure-python pHash + brute-force Hamming sweep over the same
    synthesized corpus, and every planted perturbed duplicate must be in
    it."""
    import itertools

    from global_market_index_etl_spark.plans import REGISTRY
    from global_market_index_etl_spark.plans.textdata import (
        _phash_corpus_media,
    )

    from .conftest import SF_SMALL

    got = sorted(
        (r.id_1, r.id_2, r.hamming)
        for r in REGISTRY["mm_phash_near_pairs"].spark(spark, SF_SMALL).collect()
    )

    # brute force: decode every payload in python, hash, all-pairs Hamming
    from global_market_index_etl_spark.operators.multimodal import (
        decode_image,
    )

    media = _phash_corpus_media(spark, SF_SMALL).collect()
    hashes = {
        r.media_id: phash64_array(decode_image(bytes(r.img))) for r in media
    }

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    want = sorted(
        (i, j, ham(hashes[i], hashes[j]))
        for i, j in itertools.combinations(sorted(hashes), 2)
        if ham(hashes[i], hashes[j]) <= 7
    )
    assert got == want

    planted = {i for i in hashes if i >= 10_000_000}
    found = {(a, b) for a, b, _ in got}
    in_radius = {
        p for p in planted if ham(hashes[p - 10_000_000], hashes[p]) <= 7
    }
    # every planted pair inside the radius is found (lossless blocking);
    # the one-pixel edit keeps the vast majority inside — a couple landing
    # at Hamming 8 documents the radius boundary, not a miss
    for p in in_radius:
        assert (p - 10_000_000, p) in found, p
    assert len(in_radius) >= 0.8 * len(planted), (
        len(in_radius), len(planted),
    )


def test_incremental_phash_matches_full_corpus(spark):
    """index(b1) ∪ incremental(b2 | b1) must equal the full-corpus pair
    set — the invariant that lets a growing image corpus dedup at
    batch cost (the image twin of incremental MinHash)."""
    from global_market_index_etl_spark.operators.phash import (
        incremental_phash_pairs,
        phash_near_pairs,
    )
    from global_market_index_etl_spark.plans.textdata import (
        _phash_corpus_media,
    )

    from .conftest import SF_SMALL

    media = _phash_corpus_media(spark, SF_SMALL)
    b1 = media.filter("media_id % 2 = 0")
    b2 = media.filter("media_id % 2 = 1")

    full = sorted(
        map(tuple, phash_near_pairs(media, payload_col="img").collect())
    )
    base = phash_near_pairs(b1, payload_col="img")
    from global_market_index_etl_spark.operators.phash import image_phash

    idx = image_phash(b1, payload_col="img")
    inc_pairs, new_sigs = incremental_phash_pairs(
        b2, idx, payload_col="img"
    )
    merged = sorted(
        map(tuple, base.collect())
    ) + sorted(map(tuple, inc_pairs.collect()))
    assert sorted(merged) == full
    # the appended signatures equal a fresh hash of the batch
    assert sorted(map(tuple, new_sigs.collect())) == sorted(
        map(tuple, image_phash(b2, payload_col="img").collect())
    )


def test_hamming_block_pairs_against_is_lossless(spark):
    """The two-sided pigeonhole kernel must find every cross pair within
    the radius that a brute-force sweep finds (planted bit-flips at
    exactly the boundary)."""
    from global_market_index_etl_spark.operators.dedup import (
        hamming_block_pairs_against,
    )

    def signed(x):
        return x - (1 << 64) if x >= (1 << 63) else x

    base = 0x0123456789ABCDEF
    left = [(1, base), (2, base ^ 0b1111111)]  # 7 bits from base
    right = [
        (10, base),                               # ham 0 vs id1, 7 vs id2
        (11, base ^ 0b1),                         # ham 1 vs id1
        (12, signed(base ^ ((1 << 63) | 0xFF))),  # ham 9 vs id1 — outside
    ]
    ldf = spark.createDataFrame(left, "media_id long, phash long")
    rdf = spark.createDataFrame(
        left + right, "media_id long, phash long"
    )
    got = sorted(
        (r.id_1, r.id_2, r.hamming)
        for r in hamming_block_pairs_against(
            ldf, rdf, id_col="media_id", sig_col="phash",
            max_hamming=7, blocks=8,
        ).collect()
    )

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    allv = dict(left + right)
    want = sorted(
        (min(i, j), max(i, j), ham(allv[i], allv[j]))
        for i, _ in left
        for j, _ in left + right
        if i != j and ham(allv[i], allv[j]) <= 7
    )
    assert got == sorted(set(want))


def test_phash_argument_errors_precede_decode(spark):
    """The pigeonhole max_hamming < blocks check fires BEFORE the eager
    decode+DCT materialization, so an argument error costs nothing
    (round-9 review fix). The payload here is garbage — if either
    function touched it, the decode itself would blow up instead of
    raising the argument ValueError."""
    import pytest

    from global_market_index_etl_spark.operators.phash import (
        incremental_phash_pairs,
        phash_near_pairs,
    )

    junk = spark.createDataFrame(
        [(1, bytearray(b"not an image"))], "media_id long, payload binary"
    )
    empty_index = spark.createDataFrame([], "media_id long, phash long")
    with pytest.raises(ValueError, match="max_hamming < blocks"):
        phash_near_pairs(junk, max_hamming=8, blocks=8)
    with pytest.raises(ValueError, match="max_hamming < blocks"):
        incremental_phash_pairs(junk, empty_index, max_hamming=8, blocks=8)


def test_ivf_search_empty_index_fails_clearly(spark, tmp_path):
    """An IVF index built from an empty corpus succeeds at build time
    (zero centroids, zero PQ codebooks) but is unusable — searching it
    must raise the actionable error, not a numpy AxisError from probe
    assignment or max()-of-empty from the codebook load (round-9 review
    fix)."""
    import pytest

    from global_market_index_etl_spark.operators.similarity import (
        ivf_build_index,
        ivf_search_index,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    path = str(tmp_path / "idx")
    ivf_build_index(empty, path, n_lists=4, quantize="pq", pq_m=4, pq_ksub=4)
    probes = spark.createDataFrame(
        [(1, [0.1] * 16)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="no centroids"):
        ivf_search_index(spark, path, probes, k=3, nprobe=4, rerank=5)
