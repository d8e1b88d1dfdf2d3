"""GIF codec: round-trip identity, interlace, animation, LZW width growth,
transparency compositing, and the truncation quarantine contract."""

from __future__ import annotations

import numpy as np
import pytest

from global_market_index_etl_spark.operators.gif import (
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


def _rand_rgb(rng, h, w, n_colors):
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w))
    return palette[idx]


@pytest.mark.parametrize(
    "h,w,n_colors",
    [(1, 1, 2), (3, 5, 2), (8, 8, 4), (16, 9, 16), (7, 13, 100),
     (32, 32, 256), (64, 48, 250)],
)
def test_round_trip_identity(h, w, n_colors):
    rng = np.random.default_rng(h * 1000 + w * 10 + n_colors)
    img = _rand_rgb(rng, h, w, n_colors)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_round_trip_interlaced():
    rng = np.random.default_rng(7)
    for h in (1, 2, 4, 5, 8, 17, 33):
        img = _rand_rgb(rng, h, 11, 8)
        assert np.array_equal(
            decode_gif(encode_gif(img, interlace=True)), img
        ), f"h={h}"


def test_lzw_width_growth_and_dictionary_reset():
    # long repetitive stream forces the dictionary through width bumps
    # and past the 12-bit reset
    rng = np.random.default_rng(3)
    img = _rand_rgb(rng, 80, 97, 256)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_animation_frames_and_delays():
    rng = np.random.default_rng(11)
    f1 = _rand_rgb(rng, 6, 6, 4)
    f2 = _rand_rgb(rng, 6, 6, 4)
    f3 = _rand_rgb(rng, 6, 6, 4)
    payload = encode_gif([f1, f2, f3], delays_cs=[10, 20, 30])
    frames, delays = decode_gif_frames(payload)
    assert delays == [10, 20, 30]
    assert len(frames) == 3
    for got, want in zip(frames, (f1, f2, f3)):
        assert np.array_equal(got, want)


def test_transparency_composites_previous_frame():
    # hand-assemble: 2x2 canvas, 4-color GCT, frame1 opaque, frame2 all
    # transparent-index pixels -> viewer shows frame1 through it
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8
    )
    f1_idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)

    out = bytearray(b"GIF89a")
    out += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    out.append(0x80 | 1)  # GCT, 4 entries
    out += b"\x00\x00" + palette.tobytes()

    def frame(idx, transparent=None):
        buf = bytearray()
        buf += b"\x21\xf9\x04"
        buf.append(0x04 | (0x01 if transparent is not None else 0))
        buf += (0).to_bytes(2, "little")
        buf.append(transparent if transparent is not None else 0)
        buf += b"\x00"
        buf += b"\x2c" + b"\x00\x00\x00\x00"
        buf += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
        buf.append(0)
        buf.append(2)  # lzw min code
        data = _lzw_encode(idx, 2)
        buf.append(len(data))
        buf += data
        buf.append(0)
        return buf

    out += frame(f1_idx)
    out += frame(np.full((2, 2), 3, dtype=np.uint8), transparent=3)
    out.append(0x3B)

    frames, _ = decode_gif_frames(bytes(out))
    assert np.array_equal(frames[0], palette[f1_idx])
    # second frame entirely transparent -> identical to first
    assert np.array_equal(frames[1], frames[0])


def test_truncation_raises_value_error_at_any_cut():
    rng = np.random.default_rng(5)
    payload = encode_gif(_rand_rgb(rng, 9, 9, 16))
    for cut in range(1, len(payload), max(1, len(payload) // 40)):
        with pytest.raises(ValueError):
            decode_gif(payload[:cut])


def test_bad_signature_and_palette_overflow():
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + b"\x00" * 20)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    if len(np.unique(img.reshape(-1, 3), axis=0)) > 256:
        with pytest.raises(ValueError):
            encode_gif(img)


def test_decode_image_dispatches_gif():
    from global_market_index_etl_spark.operators.multimodal import (
        decode_image,
    )

    rng = np.random.default_rng(2)
    img = _rand_rgb(rng, 5, 7, 8)
    assert np.array_equal(decode_image(encode_gif(img)), img)


def test_gif_animation_frame_sampling(spark):
    """Animated GIFs flow through the real video frame-sampling path."""
    from global_market_index_etl_spark.operators.multimodal import (
        as_media_table,
        decode_png,
        sample_frames,
    )

    rng = np.random.default_rng(21)
    clip = [_rand_rgb(rng, 8, 8, 16) for _ in range(6)]
    payload = encode_gif(clip, delays_cs=[5] * 6)
    media = as_media_table(
        spark.createDataFrame([(1, bytearray(payload))], "id long, p binary"),
        "id", "p", "video",
    )
    out = sample_frames(media, max_frames=3, decode_stub=False).collect()
    assert len(out) == 3
    for row in out:
        decoded = decode_png(bytes(row.frame_payload))
        assert decoded.shape == (8, 8, 3)
    # strided: frame 0 must be the first animation frame
    first = decode_png(bytes(sorted(out, key=lambda r: r.frame_idx)[0].frame_payload))
    assert np.array_equal(first, clip[0])


def test_mm_real_decode_stats_deterministic(spark):
    from global_market_index_etl_spark.plans import REGISTRY

    q = REGISTRY["mm_real_decode_stats"].spark
    a = sorted(map(tuple, q(spark, "/root/testdata/sf0.001").collect()))
    b = sorted(map(tuple, q(spark, "/root/testdata/sf0.001").collect()))
    assert a == b
    df = q(spark, "/root/testdata/sf0.001")
    cols = df.columns
    i = {c: cols.index(c) for c in cols}
    containers = {r[i["container"]] for r in a}
    assert containers == {"png", "gif", "jpeg"}
    assert all(r[i["height"]] == 8 and r[i["width"]] == 8 for r in a)
    # the round-8 feature legs are populated and physically sane
    assert all(r[i["n_frames"]] == 4 for r in a)
    assert all(r[i["video_motion_micro"]] >= 0 for r in a)
    assert any(r[i["video_motion_micro"]] > 0 for r in a)  # panning clips move
    assert any(r[i["audio_rms_micro"]] > 0 for r in a)


def _hand_gif(frames_spec, palette, w=2, h=2):
    """Hand-assemble a GIF89a: frames_spec is a list of
    (idx_array, disposal, transparent_idx_or_None) full-canvas frames."""
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | 1)  # GCT, 4 entries
    out += b"\x00\x00" + palette.tobytes()
    for idx, disposal, transparent in frames_spec:
        out += b"\x21\xf9\x04"
        out.append((disposal << 2) | (0x01 if transparent is not None else 0))
        out += (0).to_bytes(2, "little")
        out.append(transparent if transparent is not None else 0)
        out += b"\x00"
        out += b"\x2c" + b"\x00\x00\x00\x00"
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out.append(0)
        out.append(2)  # lzw min code
        data = _lzw_encode(idx, 2)
        out.append(len(data))
        out += data
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def test_disposal_3_restores_previous_canvas():
    """Restore-to-previous: frame2 (disposal 3) draws over frame1, and
    frame3's transparent pixels must then reveal FRAME1's canvas — not
    frame2's pixels (the old leave-in-place bug)."""
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8
    )
    f1 = np.array([[0, 0], [0, 0]], dtype=np.uint8)  # all red
    f2 = np.array([[1, 1], [1, 1]], dtype=np.uint8)  # all green, disposal 3
    f3 = np.full((2, 2), 3, dtype=np.uint8)          # all transparent
    frames, _ = decode_gif_frames(
        _hand_gif([(f1, 1, None), (f2, 3, None), (f3, 1, 3)], palette)
    )
    assert np.array_equal(frames[0], palette[f1])
    assert np.array_equal(frames[1], palette[f2])
    # after disposal 3 the canvas is back to frame1; transparent frame3
    # therefore renders as frame1, NOT frame2
    assert np.array_equal(frames[2], palette[f1])


def test_disposal_undefined_codes_quarantine():
    import pytest

    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8
    )
    f1 = np.zeros((2, 2), dtype=np.uint8)
    for code in (4, 5, 6, 7):
        with pytest.raises(ValueError, match="disposal"):
            decode_gif_frames(_hand_gif([(f1, code, None)], palette))


def test_mm_real_decode_stats_survives_blank_documents(spark):
    """Empty/NULL text documents must produce a row, not sink the query."""
    from global_market_index_etl_spark.plans.textdata import (
        mm_real_decode_stats,
    )

    import pyspark.sql.functions as F

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    blanks = spark.createDataFrame(
        [(90001, ""), (90002, None), (90003, "   ")],
        "doc_id long, text string",
    )
    import tempfile, shutil, os
    d = tempfile.mkdtemp()
    try:
        (
            base.select("doc_id", "text").unionByName(blanks)
            .coalesce(1).write.mode("overwrite")
            .parquet(os.path.join(d, "documents.parquet"))
        )
        for t in ("region nation customer supplier part orders lineitem "
                  "events embeddings").split():
            os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                       os.path.join(d, f"{t}.parquet"))
        out = mm_real_decode_stats(spark, d).collect()
        ids = {r.doc_id for r in out}
        assert {90001, 90002, 90003} <= ids
    finally:
        shutil.rmtree(d, ignore_errors=True)
