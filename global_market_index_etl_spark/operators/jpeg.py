"""Pure-numpy baseline JPEG codec — the compressed-image leg of the
dependency-free codec family (PNG/WAV/AVI live in ``multimodal.py``).

Real crawl corpora are overwhelmingly JPEG, so the multimodal tier needs a
real decode path without PIL/libjpeg in the container. Everything here is
the public ITU-T T.81 baseline process: marker segment walk (DQT / SOF0 /
DHT / DRI / SOS), canonical Huffman tables, byte-stuffed entropy-coded
segment, per-MCU block decode with DC prediction + restart intervals,
dequantize → batched 8×8 IDCT (one numpy einsum per component, no
per-pixel Python), nearest-neighbor chroma upsample, BT.601 YCbCr→RGB.

Scope (raises ValueError outside it, so pipelines can quarantine):
baseline sequential DCT (SOF0), 8-bit samples, 1 or 3 components,
sampling factors 1–2 (covers 4:4:4 / 4:2:2 / 4:2:0 — the encodings that
dominate real data). Progressive (SOF2), arithmetic coding, 12-bit, and
hierarchical modes are out — the standard quarantine contract, same as
``decode_png``'s unsupported color types.

The encoder exists so tests can build fixtures and assert decode fidelity
without any third-party codec: 4:4:4, quality-scaled Annex-K quantization,
Annex-K luminance Huffman tables for all components (legal — DHT tables
are whatever the stream declares).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position → raster index (T.81 Figure 5)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K Table K.1 luminance quantization (raster order)
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

# Annex K Tables K.3/K.5: luminance DC and AC Huffman specs
DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# DCT-II basis: C[k, n] = a(k) cos((2n+1)kπ/16); spatial = C.T @ coef @ C
_DCT = np.array([
    [
        (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
        * np.cos((2 * n + 1) * k * np.pi / 16)
        for n in range(8)
    ]
    for k in range(8)
])


def _build_huffman(bits: list[int], vals: list[int]) -> dict:
    """(code_length, code) → symbol, canonical assignment (T.81 C.2)."""
    table, code, idx = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = vals[idx]
            code += 1
            idx += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-stuffing removal; stops (and remembers) at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.marker = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("entropy data exhausted at marker")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                self.marker = nxt
                self.pos += 1
                b = 0  # pad bits past the marker (only EOB tails land here)
        self.buf = b
        self.nbits = 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huffman(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0
        if self.marker is None:
            while self.data[self.pos] != 0xFF:
                self.pos += 1
            self.marker = self.data[self.pos + 1]
            self.pos += 2
        if not (0xD0 <= self.marker <= 0xD7):
            raise ValueError(f"expected restart marker, got {self.marker:#x}")
        self.marker = None


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an ``(h, w, channels)`` uint8 array
    (channels = 3 RGB, or 1 for grayscale streams).

    Raises ValueError on anything outside the supported scope — including
    payloads truncated mid-segment or mid-entropy-stream, the most common
    corrupt shape in crawl data — so pipelines can quarantine uniformly.
    """
    try:
        return _decode_jpeg(payload)
    except (IndexError, struct.error) as exc:
        # a read past the end of the buffer anywhere in the marker walk or
        # entropy decode means the stream stopped early
        raise ValueError(f"truncated JPEG: {exc}") from exc


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (height, width, components)
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                      0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process SOF{marker - 0xC0} (baseline "
                f"SOF0 only)"
            )
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quantization unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(
                    body[o + 1 : o + 65], dtype=np.uint8
                ).astype(np.int64)
                quant[tq] = tbl.reshape(8, 8)
                o += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            if any(not 1 <= c["h"] <= 2 or not 1 <= c["v"] <= 2 for c in comps):
                raise ValueError("sampling factors beyond 2 unsupported")
            frame = (h, w, comps)
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                bits = [0] + list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(
                    bits, vals
                )
                o += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan = {}
            for i in range(ns):
                cs, tables = body[1 + 2 * i : 3 + 2 * i]
                scan[cs] = (tables >> 4, tables & 0xF)
            return _decode_scan(
                payload, pos + 2 + seglen, frame, scan, quant,
                huff_dc, huff_ac, restart_interval,
            )
        pos += 2 + seglen
    raise ValueError("truncated JPEG (no SOS)")


def _decode_scan(data, pos, frame, scan, quant, huff_dc, huff_ac, dri):
    height, width, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    for c in comps:
        td, ta = scan[c["id"]]
        c["dc"] = huff_dc[td]
        c["ac"] = huff_ac[ta]
        c["q"] = quant[c["tq"]]
        c["pred"] = 0
        c["coefs"] = np.zeros(
            (mcus_y * c["v"] * mcus_x * c["h"], 8, 8), dtype=np.int64
        )
        c["bw"] = mcus_x * c["h"]  # blocks per row

    r = _BitReader(data, pos)
    for mcu in range(mcus_x * mcus_y):
        if dri and mcu and mcu % dri == 0:
            r.restart()
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(mcu, mcus_x)
        for c in comps:
            for v in range(c["v"]):
                for u in range(c["h"]):
                    blk = np.zeros(64, dtype=np.int64)
                    t = r.huffman(c["dc"])
                    diff = _extend(r.receive(t), t)
                    c["pred"] += diff
                    blk[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = r.huffman(c["ac"])
                        run, size = rs >> 4, rs & 0xF
                        if size == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError("AC run past block end")
                        blk[ZIGZAG[k]] = _extend(r.receive(size), size)
                        k += 1
                    by = my * c["v"] + v
                    bx = mx * c["h"] + u
                    c["coefs"][by * c["bw"] + bx] = blk.reshape(8, 8) * c["q"]

    # batched IDCT per component, then reassemble planes
    planes = []
    for c in comps:
        spatial = np.einsum(
            "ij,njk,kl->nil", _DCT.T, c["coefs"].astype(np.float64), _DCT
        )
        blocks_y = mcus_y * c["v"]
        plane = (
            spatial.reshape(blocks_y, c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(blocks_y * 8, c["bw"] * 8)
        )
        plane = np.clip(np.round(plane) + 128, 0, 255)
        # nearest-neighbor upsample to full resolution, then crop
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(
            hmax // c["h"], axis=1
        )
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        return planes[0].astype(np.uint8)[..., None]
    y, cb, cr = planes
    r_ = y + 1.402 * (cr - 128)
    g_ = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b_ = y + 1.772 * (cb - 128)
    return np.clip(
        np.stack([r_, g_, b_], axis=-1).round(), 0, 255
    ).astype(np.uint8)


# --- encoder (fixture/tooling path: 4:4:4, Annex-K tables) -----------------


def _quality_table(quality: int) -> np.ndarray:
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((QUANT_LUM * scale + 50) // 100, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-pad


def _encode_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol → (code, length) for the encoder side."""
    return {
        sym: (code, length)
        for (length, code), sym in _build_huffman(bits, vals).items()
    }


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """Encode an ``(h, w, 3)`` RGB or ``(h, w, 1)`` gray uint8 array as a
    baseline JPEG — 4:4:4 by default, 4:2:0 (box-averaged chroma, the web
    default) with ``subsample=True``. Lossy by nature — tests assert
    fidelity bounds, not identity (unlike the PNG/WAV/AVI round-trips)."""
    h, w, nch = arr.shape
    if nch not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    if not isinstance(quality, int) or not 1 <= quality <= 100:
        raise ValueError(f"quality must be an int in [1, 100], got {quality!r}")
    arr = arr.astype(np.float64)
    if nch == 3:
        r_, g_, b_ = arr[..., 0], arr[..., 1], arr[..., 2]
        planes = [
            0.299 * r_ + 0.587 * g_ + 0.114 * b_,
            -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128,
            0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128,
        ]
        factors = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    else:
        planes = [arr[..., 0]]
        factors = [(1, 1)]
    hmax = max(fh for fh, _ in factors)
    vmax = max(fv for _, fv in factors)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    padded = []
    for (fh, fv), plane in zip(factors, planes):
        sy, sx = vmax // fv, hmax // fh
        if (sy, sx) != (1, 1):  # box-downsample chroma
            ph, pw = -(-h // sy) * sy, -(-w // sx) * sx
            p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
            plane = p.reshape(ph // sy, sy, pw // sx, sx).mean(axis=(1, 3))
        th, tw = mcus_y * 8 * fv, mcus_x * 8 * fh
        padded.append(
            np.pad(
                plane,
                ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
                mode="edge",
            )
        )

    qtbl = _quality_table(quality).reshape(8, 8)
    dc_codes = _encode_codes(DC_BITS, DC_VALS)
    ac_codes = _encode_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    preds = [0] * len(planes)
    for mcu in range(mcus_y * mcus_x):
        my, mx = divmod(mcu, mcus_x)
        for ci, (fh, fv) in enumerate(factors):
            for v in range(fv):
                for u in range(fh):
                    y0, x0 = (my * fv + v) * 8, (mx * fh + u) * 8
                    block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                    coef = _DCT @ (block - 128.0) @ _DCT.T
                    q = (
                        np.round(coef / qtbl)
                        .astype(np.int64)
                        .reshape(-1)[ZIGZAG]
                    )
                    diff = int(q[0]) - preds[ci]
                    preds[ci] = int(q[0])
                    t = _category(diff)
                    code, length = dc_codes[t]
                    bw.write(code, length)
                    if t:
                        bw.write(
                            diff if diff >= 0 else diff + (1 << t) - 1, t
                        )
                    run = 0
                    for k in range(1, 64):
                        val = int(q[k])
                        if val == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, length = ac_codes[0xF0]
                            bw.write(code, length)
                            run -= 16
                        s = _category(val)
                        code, length = ac_codes[(run << 4) | s]
                        bw.write(code, length)
                        bw.write(val if val >= 0 else val + (1 << s) - 1, s)
                        run = 0
                    if run:
                        code, length = ac_codes[0x00]
                        bw.write(code, length)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    zz_q = np.zeros(64, dtype=np.uint8)
    zz_q[np.arange(64)] = qtbl.reshape(-1)[ZIGZAG]
    dqt = seg(0xDB, bytes([0x00]) + zz_q.tobytes())
    sof_comps = b"".join(
        struct.pack(">BBB", i + 1, (fh << 4) | fv, 0)
        for i, (fh, fv) in enumerate(factors)
    )
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, len(planes)) + sof_comps,
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(DC_BITS[1:]) + bytes(DC_VALS)
    ) + seg(
        0xC4,
        bytes([0x10]) + bytes(AC_BITS[1:]) + bytes(AC_VALS)
    )
    sos_comps = b"".join(
        struct.pack(">BB", i + 1, 0x00) for i in range(len(planes))
    )
    sos = seg(
        0xDA, bytes([len(planes)]) + sos_comps + b"\x00\x3f\x00"
    )
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"
    )
