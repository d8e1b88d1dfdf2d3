"""Pure-python/numpy GIF codec (GIF87a/89a) — decode + fixture encoder.

Completes the web-image codec family (PNG: multimodal.decode_png, JPEG
baseline+progressive: operators/jpeg.py): GIF is the remaining major
crawl-data raster format, and its animation form is the lightweight
"video" a curation pipeline actually meets far more often than real
codecs.  Public-spec implementation (CompuServe GIF89a specification):

- logical screen descriptor + global/local color tables;
- LZW decompression with variable code width (up to 12 bits), CLEAR /
  END codes and dictionary growth — the deferred-clear behavior real
  encoders emit;
- 4-pass interlacing;
- GIF89a extension blocks: graphic control (transparency index, frame
  delay, disposal), application / comment / plain-text skipped by
  sub-block walking;
- multi-frame animation with compositing: disposal 1 (leave) draws each
  frame over the previous canvas, disposal 2 restores the background.

Quarantine contract (same as operators/jpeg.py): any structural problem —
bad signature, truncated sub-blocks, LZW code referencing an absent
dictionary entry, missing trailer data — raises ValueError so pipelines
route the payload to quarantine instead of crashing the task.

The encoder exists for deterministic test fixtures: palette-exact RGB
(≤256 distinct colors), optional interlace, optional multi-frame with
per-frame delays; output decodes bit-identically by construction.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_gif", "decode_gif_frames", "encode_gif"]


def _read_sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(buf):
            raise ValueError("truncated GIF (unterminated sub-blocks)")
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(buf):
            raise ValueError("truncated GIF (short sub-block)")
        out += buf[pos : pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    dict_base = [(i,) for i in range(clear)] + [None, None]
    table = list(dict_base)
    out: list[int] = []
    prev: tuple[int, ...] | None = None

    bitpos = 0
    total_bits = len(data) * 8

    def read_code() -> int | None:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return None
        byte = bitpos >> 3
        shift = bitpos & 7
        val = int.from_bytes(data[byte : byte + 3], "little")
        code = (val >> shift) & ((1 << width) - 1)
        bitpos += width
        return code

    while len(out) < n_pixels:
        code = read_code()
        if code is None:
            raise ValueError("truncated GIF (LZW stream ended early)")
        if code == clear:
            table = list(dict_base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise ValueError("corrupt GIF (bad initial LZW code)")
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError("corrupt GIF (LZW code out of range)")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError("truncated GIF (not enough pixels)")
    return np.asarray(out[:n_pixels], dtype=np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    out = np.empty((h, w), dtype=np.uint8)
    src = 0
    for start, step in _INTERLACE_PASSES:
        rows = range(start, h, step)
        for r in rows:
            out[r] = idx[src]
            src += 1
    return out


def decode_gif_frames(payload: bytes):
    """Decode all frames: returns (list of (h, w, 3) uint8 arrays, delays_cs).

    Frames are composited per the disposal method, so each returned array
    is the full canvas as a viewer would show it.
    """
    buf = payload
    if len(buf) < 13 or buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad signature)")
    w = int.from_bytes(buf[6:8], "little")
    h = int.from_bytes(buf[8:10], "little")
    packed = buf[10]
    bg_index = buf[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(buf):
            raise ValueError("truncated GIF (global color table)")
        gct = np.frombuffer(buf[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:] = gct[bg_index]
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay_cs = 0

    while True:
        if pos >= len(buf):
            raise ValueError("truncated GIF (missing trailer)")
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(buf):
                raise ValueError("truncated GIF (extension label)")
            label = buf[pos]
            pos += 1
            data, pos = _read_sub_blocks(buf, pos)
            if label == 0xF9 and len(data) >= 4:
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                delay_cs = int.from_bytes(data[1:3], "little")
                transparent = data[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF (unknown block 0x{block:02x})")
        if pos + 9 > len(buf):
            raise ValueError("truncated GIF (image descriptor)")
        left = int.from_bytes(buf[pos : pos + 2], "little")
        top = int.from_bytes(buf[pos + 2 : pos + 4], "little")
        fw = int.from_bytes(buf[pos + 4 : pos + 6], "little")
        fh = int.from_bytes(buf[pos + 6 : pos + 8], "little")
        fpacked = buf[pos + 8]
        pos += 9
        if left + fw > w or top + fh > h or fw == 0 or fh == 0:
            raise ValueError("corrupt GIF (frame exceeds canvas)")
        ct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            if pos + 3 * n > len(buf):
                raise ValueError("truncated GIF (local color table)")
            ct = np.frombuffer(
                buf[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("corrupt GIF (no color table)")
        if pos >= len(buf):
            raise ValueError("truncated GIF (missing LZW size)")
        min_code = buf[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"corrupt GIF (LZW min code {min_code})")
        data, pos = _read_sub_blocks(buf, pos)
        idx = _lzw_decode(data, min_code, fw * fh)
        if np.any(idx >= len(ct)):
            raise ValueError("corrupt GIF (palette index out of range)")
        if fpacked & 0x40:
            idx = _deinterlace(idx.reshape(fh, fw), fh, fw)
        else:
            idx = idx.reshape(fh, fw)

        if disposal > 3:  # 4-7 are undefined in GIF89a — quarantine, never
            raise ValueError(  # composite subsequent frames on a guess
                f"corrupt GIF (undefined disposal method {disposal})"
            )
        prev_region = canvas[top : top + fh, left : left + fw].copy()
        rgb = ct[idx]
        if transparent is not None:
            mask = idx == transparent
            rgb = np.where(mask[:, :, None], prev_region, rgb)
        canvas[top : top + fh, left : left + fw] = rgb
        frames.append(canvas.copy())
        delays.append(delay_cs)
        if disposal == 2:
            # Restore-to-background, spec-literal (GIF89a §23: "the area
            # used by the graphic must be restored to the background
            # color").  NOTE: browsers restore to TRANSPARENT instead; an
            # RGB canvas cannot represent that, so this decoder follows the
            # spec text — deterministic either way.
            bg = (
                gct[bg_index]
                if gct is not None and bg_index < len(gct)
                else np.zeros(3, dtype=np.uint8)
            )
            canvas[top : top + fh, left : left + fw] = bg
        elif disposal == 3:
            # Restore-to-previous: put back the pre-draw snapshot so the
            # next frame composites onto the canvas as it was BEFORE this
            # frame (round-7 advice fix — previously silently treated as
            # disposal 1, corrupting any animation that uses it).
            canvas[top : top + fh, left : left + fw] = prev_region
        transparent = None
        disposal = 0
        delay_cs = 0
    if not frames:
        raise ValueError("corrupt GIF (no image data)")
    return frames, delays


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the FIRST frame to an (h, w, 3) uint8 array."""
    frames, _ = decode_gif_frames(payload)
    return frames[0]


# ------------------------------------------------------------------ #
# encoder (fixtures)
# ------------------------------------------------------------------ #


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[tuple[int, ...], int] = {
        (i,): i for i in range(clear)
    }
    next_code = end + 1
    width = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev: tuple[int, ...] = ()
    for v in map(int, indices.ravel()):
        cur = prev + (v,)
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= (1 << 12):
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prev = (v,)
    if prev:
        emit(table[prev])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _interlace_rows(h: int) -> list[int]:
    rows: list[int] = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


def encode_gif(
    frames,
    *,
    delays_cs: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode RGB uint8 frame(s) (≤256 distinct colors overall) as GIF89a."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share (h, w, 3)")
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames]), axis=0
    )
    if len(colors) > 256:
        raise ValueError(f"palette overflow: {len(colors)} distinct colors")
    n = max(2, int(2 ** np.ceil(np.log2(max(len(colors), 2)))))
    palette = np.zeros((n, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    size_field = int(np.log2(n)) - 1
    out.append(0x80 | size_field)  # GCT present
    out += b"\x00\x00"  # bg index, aspect
    out += palette.tobytes()
    delays = delays_cs or [0] * len(frames)
    min_code = max(2, int(np.log2(n)))
    for frame, delay in zip(frames, delays):
        out += b"\x21\xf9\x04"  # GCE
        out.append(0x04)  # disposal 1, no transparency
        out += int(delay).to_bytes(2, "little")
        out += b"\x00\x00"  # transparent idx, terminator
        out += b"\x2c" + b"\x00\x00\x00\x00"
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out.append(0x40 if interlace else 0x00)
        idx = np.array(
            [lut[tuple(p)] for p in frame.reshape(-1, 3)], dtype=np.uint8
        ).reshape(h, w)
        if interlace:
            idx = idx[_interlace_rows(h)]
        out.append(min_code)
        data = _lzw_encode(idx, min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
