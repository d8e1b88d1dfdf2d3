"""Multimodal (image/audio/video) column plumbing for training-data
pipelines (driver north star).

Design: payloads are opaque ``binary`` columns + typed metadata columns
(media_type, width/height/duration, codec). All Spark-side plumbing —
schemas, partitioning, Arrow batch shape, UDF signatures — is real and
tested. Decode libraries (PIL/ffmpeg/torchaudio) are not in this
container, so the codec work is a pure-numpy family instead: PNG
(inflate+unfilter), baseline JPEG (``operators/jpeg.py`` — Huffman +
batched IDCT + 4:2:0 upsample, baseline AND progressive), RIFF/PCM WAV,
and AVI video in both uncompressed RGB24 ('00db' DIB chunks) and MJPEG
('00dc' chunks, each a JPEG decoded by the same ``operators/jpeg.py``
codec — the dominant compressed format in webcam/drone/archival AVI).
Every decode path is real; what remains OUT of scope — inter-frame video
codecs (H.264 etc., a codebase, not a function) and non-AVI containers
(MP4/MKV) — raises ValueError uniformly, so pipelines quarantine rather
than special-case.

- ``decode_stub=False`` paths really decode via the codec family above;
  unsupported containers raise ValueError for the quarantine path.
- ``decode_stub=True`` paths run a deterministic fake decode (byte
  histogram as "pixels") so the batch plumbing is exercisable end-to-end
  with payloads that aren't valid media files.

Everything runs through ``mapInPandas``: Arrow-batched, streaming per
partition (never materializes a partition in memory), and the iterator
signature lets one input row yield many output rows (frame sampling).
At 100 TB: binary payloads dominate partition size — repartition by a
size-aware key first (``repartition_for_payloads``) so one Arrow batch of
videos does not blow executor memory; metadata-only predicates are pushed
down *before* payload bytes are ever read (parquet column pruning keeps the
binary column unscanned for filtered-out rows).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", StringType(), True),  # hex-encoded feature vec
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_payload", BinaryType(), True),
    ]
)


def as_media_table(
    df: DataFrame, id_col: str, payload_col: str, media_type: str
) -> DataFrame:
    """Lift any (id, binary) pair into the canonical media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("double").alias("duration_s"),
    )


def repartition_for_payloads(
    df: DataFrame, target_bytes_per_partition: int = 128 * 1024 * 1024
) -> DataFrame:
    """Size-aware repartition: binary rows are huge; row-count-based
    partitioning makes skewed Arrow batches. Uses octet_length to salt into
    byte-balanced partitions (cheap: length only, payload not decoded)."""
    with_sz = df.withColumn("__sz", F.octet_length("payload").cast("long"))
    # bucket id ≈ running size / target is not expressible without a global
    # scan; hash-salt proportional to size class instead (log2 size buckets)
    return (
        with_sz.withColumn(
            "__size_class", F.ceil(F.log2(F.greatest(F.col("__sz"), F.lit(1))))
        )
        .repartition(F.col("__size_class"), F.col("media_id"))
        .drop("__sz", "__size_class")
    )


def decode_png(payload: bytes):
    """Decode a PNG payload to an ``(h, w, channels)`` uint8 numpy array.

    Pure numpy + stdlib zlib — no PIL/imageio in this container, and the
    PNG format is simple enough that depending on one would be gratuitous:
    chunk walk (IHDR/IDAT/IEND), one zlib inflate, then per-scanline
    unfilter (all five filter types: None/Sub/Up/Average/Paeth, RFC 2083
    §6). Supports 8-bit gray/gray+alpha/RGB/RGBA, non-interlaced — the
    standard training-corpus encodings. Raises ValueError on anything else
    so callers can route exotic files to a quarantine column instead of
    silently mangling pixels.
    """
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload (bad signature)")
    pos, idat = 8, []
    width = height = None
    channels = 0
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            try:
                channels = {0: 1, 2: 3, 4: 2, 6: 4}[color]
            except KeyError:
                raise ValueError(f"unsupported PNG color type {color}") from None
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a left scan
            cur = line
            for x in range(stride):
                left = int(cur[x - channels]) if x >= channels else 0
                up = int(prev[x])
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    ul = int(prev[x - channels]) if x >= channels else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(height, width, channels)


def decode_image(payload: bytes):
    """Decode an image payload to ``(h, w, channels)`` uint8, dispatching
    on the container's magic bytes: PNG (pure-numpy inflate+unfilter,
    :func:`decode_png`), baseline/progressive JPEG (pure-numpy
    Huffman+IDCT, :func:`..operators.jpeg.decode_jpeg` — the format real
    crawl corpora are actually in), or GIF (LZW + palette + interlace,
    first frame — :func:`..operators.gif.decode_gif`). Anything else
    raises ValueError for the quarantine path."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        return decode_gif(payload)
    raise ValueError("unsupported image container (not PNG, JPEG, or GIF)")


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    ``decode_stub=True``: 16-bin BYTE histogram of the raw payload,
    hex-encoded — deterministic, so tests can assert exact values without
    any codec. ``decode_stub=False``: REAL decode on every media type —
    images through ``decode_image`` (pure-numpy PNG + baseline/progressive
    JPEG, 16-bin pixel histogram), audio through ``decode_wav`` (amplitude
    histogram), video through ``decode_avi_frames`` (RGB24/MJPEG AVI,
    whole-clip pixel histogram); same schema, same batch shape, so
    swapping in PIL/librosa/pyav for other formats changes one function.
    """

    def _fake_decode(payload: bytes) -> str:
        hist = [0] * 16
        for b in payload:
            hist[b >> 4] += 1
        return "".join(f"{min(h, 255):02x}" for h in hist)

    def _real_decode(payload: bytes, media_type: str) -> str:
        import numpy as np

        if media_type == "image":
            pixels = decode_image(payload)
            hist = np.bincount(pixels.reshape(-1) >> 4, minlength=16)
        elif media_type == "audio":
            # 16-bin histogram over the decoded sample amplitude range —
            # the audio analog of the pixel histogram (real RIFF/PCM
            # parse, no codec libs)
            samples = decode_wav(payload).astype(np.int64)
            hist = np.bincount(
                ((samples.reshape(-1) + 32768) >> 12).clip(0, 15),
                minlength=16,
            )
        else:
            # video: decode every frame through the AVI walk (RGB24 DIB
            # or MJPEG via the engine's JPEG codec) and histogram the
            # pixels of the whole clip — non-AVI containers and
            # inter-frame codecs raise ValueError for the quarantine
            # path, same contract as image decode
            frames = decode_avi_frames(bytes(payload))
            if not frames:
                hist = np.zeros(16, dtype=np.int64)
            else:
                stack = np.concatenate([f.reshape(-1) for f in frames])
                hist = np.bincount(stack >> 4, minlength=16)
        return "".join(f"{min(int(h), 255):02x}" for h in hist)

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            if not decode_stub:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "media_type": pdf["media_type"],
                        "n_bytes": pdf["payload"].map(
                            lambda p: len(p) if p is not None else None
                        ),
                        "feature": [
                            _real_decode(p, mt) if p is not None else None
                            for p, mt in zip(pdf["payload"], pdf["media_type"])
                        ],
                    }
                )
                continue
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(
                        lambda p: len(p) if p is not None else None
                    ),
                    "feature": payloads.map(
                        lambda p: _fake_decode(p) if p is not None else None
                    ),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8,
    decode_stub: bool = True,
) -> DataFrame:
    """Frame sampling: one input row → many frame rows (iterator shape).

    Stub "frames" are byte slices at a fixed stride — the row-expansion
    plumbing (the part Spark cares about) is identical to real video
    decoding with a frame stride. ``decode_stub=False`` REALLY decodes
    video-ish containers by magic bytes: AVI (``decode_avi_frames``, pure
    numpy — uncompressed RGB24 and compressed MJPEG streams alike) and
    animated GIF (``gif.decode_gif_frames`` — LZW + disposal
    compositing, the lightweight "video" crawl data actually carries):
    every ``max_frames``-strided frame is re-emitted as a PNG payload —
    container parse, per-frame entropy decode, frame iteration, and
    per-frame re-encode all exercised; inter-frame codecs (H.264) remain
    the documented hook point.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            if not decode_stub:
                out_ids, out_idx, out_payload = [], [], []
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    if payload is None:
                        continue
                    raw = bytes(payload)
                    if raw[:6] in (b"GIF87a", b"GIF89a"):
                        from .gif import decode_gif_frames

                        frames = decode_gif_frames(raw)[0]
                    else:
                        frames = decode_avi_frames(raw)
                    stride = max(1, len(frames) // max_frames)
                    for i, frame in enumerate(frames[::stride][:max_frames]):
                        out_ids.append(mid)
                        out_idx.append(i)
                        out_payload.append(encode_png(frame))
                yield pd.DataFrame(
                    {
                        "media_id": out_ids,
                        "frame_idx": out_idx,
                        "frame_payload": out_payload,
                    }
                )
                continue
            out_ids, out_idx, out_payload = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_payload.append(
                        bytes(payload[i * every_n_bytes : (i + 1) * every_n_bytes])
                    )
            yield pd.DataFrame(
                {
                    "media_id": out_ids,
                    "frame_idx": out_idx,
                    "frame_payload": out_payload,
                }
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)


def encode_png(arr) -> bytes:
    """Encode an ``(h, w, channels)`` uint8 array as a PNG (filter 0,
    one zlib stream) — the inverse of ``decode_png``, kept dependency-free
    for the same reason. Round-trip (encode→decode) is identity, asserted
    in tests."""
    import struct
    import zlib

    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_images(
    df: DataFrame, width: int, height: int, decode_stub: bool = False
) -> DataFrame:
    """Resize image payloads to ``width × height`` via mapInPandas.

    REAL path for PNG and baseline-JPEG payloads: ``decode_image`` →
    nearest-neighbor index sampling (one numpy fancy-index per image, no
    Python pixel loop) → ``encode_png`` (thumbnails re-emit lossless; a
    JPEG source stays decodable downstream without quality re-loss).
    Nearest-neighbor is the standard choice for training-data thumbnailing
    where throughput beats interpolation quality; swapping in PIL's
    Lanczos later changes only the per-image function. Other containers
    raise ValueError from the decoder — route exotic codecs through a
    quarantine filter first. ``decode_stub=True`` passes payloads through
    untouched (metadata-only update) for plumbing tests without codec
    work.
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def one(payload: bytes) -> bytes:
            if payload is None:
                return None
            if decode_stub:
                return payload
            px = decode_image(payload)
            h0, w0, _c = px.shape
            ys = (np.arange(height) * h0 // height).astype(np.int64)
            xs = (np.arange(width) * w0 // width).astype(np.int64)
            return encode_png(px[ys][:, xs])

        for pdf in it:
            out = pdf.copy()
            out["payload"] = pdf["payload"].map(one)
            out["width"] = pd.array([width] * len(pdf), dtype="Int32")
            out["height"] = pd.array([height] * len(pdf), dtype="Int32")
            yield out

    return df.mapInPandas(batches, MEDIA_SCHEMA)


def _riff_pcm_chunks(payload: bytes):
    """ONE RIFF chunk walk → ``(fmt_tuple, data_bytes)`` — shared by
    ``decode_wav`` and ``decode_wav_info`` so the fmt parse exists once
    (round-8 review fix: the walk and the fmt unpack had two copies)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        ctype = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if ctype == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctype == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return fmt, data


def _pcm_array(fmt, data):
    """Sample matrix from a parsed (fmt, data) pair."""
    import numpy as np

    tag, channels, _rate, _byte_rate, _align, bits = fmt
    if tag != 1:
        raise ValueError(f"unsupported WAVE format tag {tag} (PCM only)")
    if bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
    elif bits == 16:
        arr = np.frombuffer(data, dtype="<i2")
    elif bits == 32:
        arr = np.frombuffer(data, dtype="<i4")
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    n = (len(arr) // channels) * channels
    return arr[:n].reshape(-1, channels)


def decode_wav(payload: bytes):
    """Decode a RIFF/WAVE PCM payload to an ``(n_samples, channels)``
    numpy array — pure stdlib + numpy, no codec libraries (the audio twin
    of ``decode_png``; reference point: RIFF spec + WAVEFORMAT).

    Supports integer PCM (format tag 1) at 8 bits (unsigned, rebased to
    signed — NOTE: returned as int16 in [-128, 127], so callers needing
    the full-scale value must use the BIT DEPTH from ``decode_wav_info``,
    never the array dtype) and 16/32 bits (little-endian signed). Chunks
    are walked by the declared sizes (word-aligned), so extra chunks
    (LIST, fact, cue) are skipped, not tripped over. Raises ValueError on
    anything that is not integer PCM — same contract as ``decode_png``'s
    unsupported color types.
    """
    fmt, data = _riff_pcm_chunks(payload)
    return _pcm_array(fmt, data)


def encode_wav(arr, sample_rate: int = 16_000) -> bytes:
    """Encode an ``(n_samples, channels)`` int16 array as 16-bit PCM
    RIFF/WAVE — the inverse of ``decode_wav``; round-trip identity is
    asserted in tests."""
    import struct

    import numpy as np

    arr = np.asarray(arr, dtype="<i2")
    n_samples, channels = arr.shape
    data = arr.tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_avi_frames(payload: bytes):
    """Decode an AVI payload to a list of ``(h, w, 3)`` uint8 arrays —
    the video leg of the pure-numpy codec family. RIFF chunk walk like
    ``decode_wav``: 'avih' gives (w, h); inside the 'movi' LIST,
    '00db'/'00dw' chunks are uncompressed bottom-up BGR24 rows (the DIB
    convention, flipped and reordered to top-down RGB) and '00dc'
    chunks holding a baseline JPEG (SOI magic) are MJPEG frames decoded
    by ``operators/jpeg.py`` — web/device AVIs are overwhelmingly one of
    these two. Any OTHER compressed stream ('00dc' without a JPEG
    signature: H.264, cinepak, …) raises ValueError — the documented
    quarantine hook; inter-frame codecs are a codebase, not a function.
    """
    import struct

    import numpy as np

    from .jpeg import decode_jpeg

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = None
    frames = []

    def walk(buf, pos, end):
        nonlocal width, height
        while pos + 8 <= end:
            ctype = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_start = pos + 8
            if ctype == b"LIST":
                walk(buf, body_start + 4, body_start + size)
            elif ctype == b"avih":
                w, h = struct.unpack("<II", buf[body_start + 32 : body_start + 40])
                width, height = int(w), int(h)
            elif ctype in (b"00db", b"00dw"):
                if width is None:
                    raise ValueError("frame chunk before avih header")
                raw = np.frombuffer(
                    buf, dtype=np.uint8, count=width * height * 3,
                    offset=body_start,
                ).reshape(height, width, 3)
                # DIB: bottom-up rows, BGR order → top-down RGB
                frames.append(raw[::-1, :, ::-1].copy())
            elif ctype == b"00dc":
                if width is None:
                    raise ValueError("frame chunk before avih header")
                body = buf[body_start : body_start + size]
                if body[:2] != b"\xff\xd8":
                    raise ValueError(
                        "compressed AVI stream is not MJPEG — inter-frame "
                        "codecs (H.264 etc.) unsupported"
                    )
                frame = decode_jpeg(bytes(body))
                if frame.shape[2] == 1:  # grayscale MJPEG → replicate
                    frame = np.repeat(frame, 3, axis=2)
                if frame.shape[:2] != (height, width):
                    raise ValueError(
                        f"MJPEG frame is {frame.shape[1]}x{frame.shape[0]}, "
                        f"avih declares {width}x{height}"
                    )
                frames.append(frame)
            pos = body_start + size + (size & 1)

    walk(payload, 12, len(payload))
    if width is None:
        raise ValueError("missing avih header")
    return frames


def encode_avi(
    frames, fps: int = 10, codec: str = "rgb24", quality: int = 90
) -> bytes:
    """Encode ``(h, w, 3)`` uint8 frames as an AVI — inverse of
    ``decode_avi_frames``. ``codec="rgb24"`` writes uncompressed '00db'
    DIB chunks (round-trip identity asserted in tests); ``codec="mjpg"``
    writes '00dc' chunks, each frame a baseline JPEG from
    ``operators/jpeg.py`` at ``quality`` (round-trip fidelity-bounded,
    like any lossy codec)."""
    import struct

    import numpy as np

    from .jpeg import encode_jpeg

    if codec not in ("rgb24", "mjpg"):
        raise ValueError(f"unsupported AVI codec {codec!r}")
    h, w, _ = frames[0].shape
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, w * h * 3 * fps, 0, 0, len(frames), 0, 1, 0, w, h,
        0, 0, 0, 0,
    )
    body = b"avih" + struct.pack("<I", len(avih)) + avih
    if codec == "mjpg":
        payloads = [
            (b"00dc", encode_jpeg(np.asarray(f, dtype=np.uint8), quality=quality))
            for f in frames
        ]
    else:
        payloads = [
            (b"00db", np.asarray(f, dtype=np.uint8)[::-1, :, ::-1].tobytes())
            for f in frames
        ]
    movi = b"LIST" + struct.pack(
        "<I",
        4 + sum(8 + len(c) + (len(c) & 1) for _, c in payloads),
    ) + b"movi"
    for fourcc, c in payloads:
        movi += fourcc + struct.pack("<I", len(c)) + c
        if len(c) & 1:
            movi += b"\x00"
    content = b"AVI " + body + movi
    return b"RIFF" + struct.pack("<I", len(content)) + content


def decode_wav_info(payload: bytes):
    """:func:`decode_wav` plus format facts: ``(array, sample_rate,
    bit_depth)`` — ONE chunk walk, shared with ``decode_wav``. Hz-scaled
    spectral features need the rate; full-scale normalization needs the
    BIT DEPTH (the array dtype cannot carry it: 8-bit audio decodes to an
    int16 array in [-128, 127])."""
    fmt, data = _riff_pcm_chunks(payload)
    return _pcm_array(fmt, data), int(fmt[2]), int(fmt[5])


def audio_features(
    media: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_fft: int = 512,
) -> DataFrame:
    """Real DSP features per audio payload — the signal statistics audio
    curation filters on (silence, clipping, spectral character), computed
    with numpy only (rfft) inside one Arrow-batched ``mapInPandas``:

    - ``rms`` — root-mean-square amplitude, full-scale normalized (the
      loudness / silence-detection signal);
    - ``zcr`` — zero-crossing rate per sample (noisiness proxy);
    - ``clipping_fraction`` — fraction of samples at ≥ 99% of full scale
      (recording-defect detector);
    - ``spectral_centroid_hz`` / ``spectral_rolloff_hz`` — magnitude-
      weighted mean frequency and the 95th-percentile frequency of the
      averaged ``n_fft``-frame power spectrum (timbre / bandwidth
      signals, the features librosa computes, here over the engine's own
      RIFF/PCM decode with no codec libraries).

    Mono-mixed before analysis (mean across channels, the usual
    convention). Undecodable payloads raise — the quarantine contract of
    every codec in this module. Deterministic: fixed frame grid, no
    windowing randomness; values are float64 of a fixed numpy op order.

    Scale: embarrassingly parallel over payloads; cost per row is
    O(samples + frames · n_fft log n_fft), entirely in the executor's
    numpy — the same pipelined shape as the image decode path.
    """

    def run(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                arr, rate, bits = decode_wav_info(bytes(payload))
                # full scale follows the DECLARED bit depth — 8-bit audio
                # decodes to an int16 array in [-128, 127], so the dtype
                # itemsize would normalize it 256x too small and classify
                # loud/clipped 8-bit audio as silence (round-8 review fix)
                full_scale = float(
                    {8: 127, 16: 32767, 32: 2147483647}[bits]
                )
                mono = arr.astype(np.float64).mean(axis=1) / full_scale
                n = len(mono)
                if n == 0:
                    raise ValueError("empty audio payload")
                rms = float(np.sqrt(np.mean(mono * mono)))
                zcr = (
                    float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    if n > 1
                    else 0.0
                )
                clip = float(np.mean(np.abs(mono) >= 0.99))
                n_frames = n // n_fft
                if n_frames == 0:
                    centroid = rolloff = 0.0
                else:
                    frames = mono[: n_frames * n_fft].reshape(n_frames, n_fft)
                    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
                    spectrum = power.mean(axis=0)
                    freqs = np.fft.rfftfreq(n_fft, d=1.0 / rate)
                    total = float(spectrum.sum())
                    if total <= 0:
                        centroid = rolloff = 0.0
                    else:
                        centroid = float((freqs * spectrum).sum() / total)
                        cum = np.cumsum(spectrum)
                        rolloff = float(
                            freqs[int(np.searchsorted(cum, 0.95 * total))]
                        )
                rows.append(
                    (
                        mid, n, int(arr.shape[1]), int(rate),
                        n / rate, rms, zcr, clip, centroid, rolloff,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_samples", "channels", "sample_rate",
                    "duration_s", "rms", "zcr", "clipping_fraction",
                    "spectral_centroid_hz", "spectral_rolloff_hz",
                ],
            )

    schema = (
        f"{id_col} long, n_samples long, channels int, sample_rate int, "
        "duration_s double, rms double, zcr double, "
        "clipping_fraction double, spectral_centroid_hz double, "
        "spectral_rolloff_hz double"
    )
    return media.select(id_col, payload_col).mapInPandas(run, schema)


def video_motion_features(
    media: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Motion/temporal statistics per video payload — the video analog of
    :func:`audio_features`, over the engine's own AVI decode (RGB24 DIB or
    MJPEG via the internal JPEG codec; anything else raises — the module's
    quarantine contract):

    - ``n_frames``, ``height``, ``width``;
    - ``motion_energy`` — mean absolute luma difference between
      consecutive frames, full-scale normalized (0 = static clip; the
      static-content / slideshow detector video curation filters on);
    - ``motion_peak`` — the largest single frame-to-frame difference
      (scene-cut indicator);
    - ``luma_mean`` / ``luma_std`` — whole-clip exposure statistics
      (black/blank-clip detector).

    Single-frame clips score zero motion by definition. Deterministic
    float64 numpy arithmetic; embarrassingly parallel over payloads.
    """

    def run(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                frames = decode_avi_frames(bytes(payload))
                if not frames:
                    raise ValueError("AVI payload contains no frames")
                lumas = [
                    0.299 * f[:, :, 0].astype(np.float64)
                    + 0.587 * f[:, :, 1]
                    + 0.114 * f[:, :, 2]
                    for f in frames
                ]
                h, w = lumas[0].shape
                stack = np.stack(lumas) / 255.0
                if len(lumas) > 1:
                    diffs = np.abs(stack[1:] - stack[:-1]).mean(axis=(1, 2))
                    energy = float(diffs.mean())
                    peak = float(diffs.max())
                else:
                    energy = peak = 0.0
                rows.append(
                    (
                        mid, len(frames), int(h), int(w),
                        energy, peak,
                        float(stack.mean()), float(stack.std()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_frames", "height", "width",
                    "motion_energy", "motion_peak", "luma_mean", "luma_std",
                ],
            )

    schema = (
        f"{id_col} long, n_frames int, height int, width int, "
        "motion_energy double, motion_peak double, "
        "luma_mean double, luma_std double"
    )
    return media.select(id_col, payload_col).mapInPandas(run, schema)
