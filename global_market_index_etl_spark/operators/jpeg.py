"""Pure-numpy JPEG codec — the compressed-image leg of the
dependency-free codec family (PNG/WAV/AVI live in ``multimodal.py``).

Real crawl corpora are overwhelmingly JPEG, so the multimodal tier needs a
real decode path without PIL/libjpeg in the container. Everything here is
the public ITU-T T.81 DCT processes:

- **baseline sequential (SOF0)**: marker segment walk (DQT / SOF0 / DHT /
  DRI / SOS), canonical Huffman tables, byte-stuffed entropy-coded
  segment, per-MCU block decode with DC prediction + restart intervals;
- **progressive (SOF2, T.81 Annex G)**: multi-scan coefficient
  accumulation with spectral selection AND successive approximation —
  interleaved/non-interleaved DC first + refinement scans, per-component
  AC band scans with EOB-run coding, AC refinement with zero-history run
  counting and correction bits;

then, shared by both paths: dequantize → batched 8×8 IDCT (one numpy
einsum per component, no per-pixel Python), nearest-neighbor chroma
upsample, BT.601 YCbCr→RGB.

Scope (raises ValueError outside it, so pipelines can quarantine):
SOF0/SOF2, 8-bit samples, 1 or 3 components, sampling factors 1–2
(covers 4:4:4 / 4:2:2 / 4:2:0 — the encodings that dominate real data).
Arithmetic coding, 12-bit, lossless, and hierarchical modes are out —
the standard quarantine contract, same as ``decode_png``'s unsupported
color types.

The encoder exists so tests can build fixtures and assert decode fidelity
without any third-party codec: quality-scaled Annex-K quantization,
Annex-K luminance Huffman tables for all components (legal — DHT tables
are whatever the stream declares), baseline or a full progressive scan
script (``progressive=True``). Baseline and progressive quantize
identically, so their decodes are asserted pixel-IDENTICAL in tests —
each mode's entropy layer is an exact check on the other's.
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
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG to an
    ``(h, w, channels)`` uint8 array (channels = 3 RGB, or 1 for
    grayscale streams).

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
    progressive = False
    prog_state = None  # per-component coefficient accumulators (SOF2)
    restart_interval = 0
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI — all progressive scans accumulated
            break
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                      0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process SOF{marker - 0xC0} (baseline "
                f"SOF0 and progressive SOF2 only)"
            )
        if pos + 4 > len(payload):
            break
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
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
            progressive = marker == 0xC2
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
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = {}
            scan_order = []
            for i in range(ns):
                cs, tables = body[1 + 2 * i : 3 + 2 * i]
                scan[cs] = (tables >> 4, tables & 0xF)
                scan_order.append(cs)
            if not progressive:
                return _decode_scan(
                    payload, pos + 2 + seglen, frame, scan, quant,
                    huff_dc, huff_ac, restart_interval,
                )
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ah = body[3 + 2 * ns] >> 4
            al = body[3 + 2 * ns] & 0xF
            if prog_state is None:
                prog_state = _init_progressive_state(frame)
            pos = _decode_scan_progressive(
                payload, pos + 2 + seglen, frame, prog_state,
                scan_order, scan, ss, se, ah, al,
                huff_dc, huff_ac, restart_interval,
            )
            continue  # pos now sits at the marker that ended the scan
        pos += 2 + seglen
    if progressive and prog_state is not None:
        return _finish_progressive(frame, prog_state, quant)
    raise ValueError("truncated JPEG (no SOS)")


def _init_progressive_state(frame) -> dict:
    """Per-component coefficient accumulators for a SOF2 stream.

    Coefficients live in ZIGZAG index space (``coefs[by, bx, k]``) because
    progressive scans address spectral bands Ss..Se — raster conversion and
    dequantization happen once, at ``_finish_progressive``.
    """
    height, width, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    state: dict = {"mcus_x": mcus_x, "mcus_y": mcus_y,
                   "hmax": hmax, "vmax": vmax, "eobrun": 0}
    for c in comps:
        cw = -(-width * c["h"] // hmax)   # component's true sample dims
        ch = -(-height * c["v"] // vmax)
        state[c["id"]] = {
            "coefs": np.zeros(
                (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int64
            ),
            "pred": 0,
            "nb_x": -(-cw // 8),  # non-interleaved scans cover only the
            "nb_y": -(-ch // 8),  # component's own blocks, not MCU padding
        }
    return state


def _decode_scan_progressive(
    data, pos, frame, state, scan_order, scan, ss, se, ah, al,
    huff_dc, huff_ac, dri,
):
    """Accumulate one progressive scan (T.81 G.2) into ``state``; returns
    the stream position of the marker that terminated the scan's entropy
    data."""
    height, width, comps = frame
    by_id = {c["id"]: c for c in comps}
    r = _BitReader(data, pos)
    state["eobrun"] = 0

    def dc_first(st, comp_id):
        td, _ = scan[comp_id]
        t = r.huffman(huff_dc[td])
        st["pred"] += _extend(r.receive(t), t)
        return st["pred"] << al

    if ss == 0:  # DC scan (spec: Se must be 0 here)
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        mcus_x, mcus_y = state["mcus_x"], state["mcus_y"]
        if len(scan_order) > 1:  # interleaved over full MCUs
            for cid in scan_order:
                state[cid]["pred"] = 0
            for mcu in range(mcus_x * mcus_y):
                if dri and mcu and mcu % dri == 0:
                    r.restart()
                    for cid in scan_order:
                        state[cid]["pred"] = 0
                my, mx = divmod(mcu, mcus_x)
                for cid in scan_order:
                    c = by_id[cid]
                    st = state[cid]
                    for v in range(c["v"]):
                        for u in range(c["h"]):
                            by, bx = my * c["v"] + v, mx * c["h"] + u
                            if ah == 0:
                                st["coefs"][by, bx, 0] = dc_first(st, cid)
                            elif r.bit():
                                st["coefs"][by, bx, 0] |= 1 << al
        else:  # single component — non-interleaved block raster
            cid = scan_order[0]
            st = state[cid]
            st["pred"] = 0
            n = 0
            for by in range(st["nb_y"]):
                for bx in range(st["nb_x"]):
                    if dri and n and n % dri == 0:
                        r.restart()
                        st["pred"] = 0
                    n += 1
                    if ah == 0:
                        st["coefs"][by, bx, 0] = dc_first(st, cid)
                    elif r.bit():
                        st["coefs"][by, bx, 0] |= 1 << al
    else:  # AC scan — spec mandates exactly one component
        if len(scan_order) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        cid = scan_order[0]
        st = state[cid]
        _, ta = scan[cid]
        table = huff_ac[ta]
        p1, m1 = 1 << al, -1 << al
        n = 0
        for by in range(st["nb_y"]):
            for bx in range(st["nb_x"]):
                if dri and n and n % dri == 0:
                    r.restart()
                    state["eobrun"] = 0
                n += 1
                blk = st["coefs"][by, bx]
                if ah == 0:  # first pass over this band
                    if state["eobrun"] > 0:
                        state["eobrun"] -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = r.huffman(table)
                        run, size = rs >> 4, rs & 0xF
                        if size == 0:
                            if run < 15:  # EOBn
                                state["eobrun"] = (1 << run) - 1
                                if run:
                                    state["eobrun"] += r.receive(run)
                                break
                            k += 16  # ZRL
                            continue
                        k += run
                        if k > se:
                            raise ValueError("AC run past band end")
                        blk[k] = _extend(r.receive(size), size) << al
                        k += 1
                else:  # refinement pass (T.81 G.1.2.3)
                    k = ss
                    if state["eobrun"] == 0:
                        while k <= se:
                            rs = r.huffman(table)
                            run, size = rs >> 4, rs & 0xF
                            newval = 0
                            if size == 0:
                                if run < 15:  # EOBn — correct the rest
                                    state["eobrun"] = (1 << run)
                                    if run:
                                        state["eobrun"] += r.receive(run)
                                    break
                                # ZRL: pass 16 zero-history coefficients
                            else:
                                if size != 1:
                                    raise ValueError(
                                        "invalid refinement magnitude"
                                    )
                                newval = p1 if r.bit() else m1
                            while k <= se:
                                if blk[k] != 0:
                                    if r.bit() and not blk[k] & p1:
                                        blk[k] += p1 if blk[k] > 0 else m1
                                else:
                                    if run == 0:
                                        # the target zero-history slot is
                                        # consumed whether a new value
                                        # lands (s=1) or not (ZRL)
                                        if newval:
                                            blk[k] = newval
                                        k += 1
                                        break
                                    run -= 1
                                k += 1
                    if state["eobrun"] > 0:
                        while k <= se:
                            if blk[k] != 0 and r.bit() and not blk[k] & p1:
                                blk[k] += p1 if blk[k] > 0 else m1
                            k += 1
                        state["eobrun"] -= 1

    # the reader stopped at (or must now find) the next marker
    if r.marker is not None:
        return r.pos - 2
    p = r.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] not in (0x00,):
            return p
        p += 1
    return len(data)


def _finish_progressive(frame, state, quant) -> np.ndarray:
    """Dequantize the accumulated zigzag coefficients and run the same
    batched-IDCT output stage as the baseline path."""
    height, width, comps = frame
    hmax, vmax = state["hmax"], state["vmax"]
    mcus_x, mcus_y = state["mcus_x"], state["mcus_y"]
    for c in comps:
        st = state[c["id"]]
        zz = st["coefs"]  # (by, bx, 64) zigzag order
        raster = np.zeros_like(zz)
        raster[:, :, ZIGZAG] = zz
        c["coefs"] = (
            raster.reshape(-1, 8, 8) * quant[c["tq"]][None, :, :]
        )
        c["bw"] = mcus_x * c["h"]
    return _idct_output(comps, mcus_x, mcus_y, hmax, vmax, height, width)


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

    return _idct_output(comps, mcus_x, mcus_y, hmax, vmax, height, width)


def _idct_output(comps, mcus_x, mcus_y, hmax, vmax, height, width):
    """Batched IDCT per component, upsample, color-convert — the shared
    output stage of the baseline and progressive paths (each component
    carries dequantized raster-order ``coefs`` and ``bw``)."""
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

    def restart(self, idx: int) -> None:
        """Byte-align and emit RSTn (markers are raw — never stuffed)."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (idx % 8)])


def _encode_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol → (code, length) for the encoder side."""
    return {
        sym: (code, length)
        for (length, code), sym in _build_huffman(bits, vals).items()
    }


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    progressive: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an ``(h, w, 3)`` RGB or ``(h, w, 1)`` gray uint8 array as a
    JPEG — baseline SOF0 by default; ``progressive=True`` emits a SOF2
    stream with a full spectral-selection + successive-approximation scan
    script (DC first at Al=1, DC refinement, per-component AC bands 1-5
    and 6-63 at Al=1 with EOB runs, then the two matching AC refinement
    passes). Chroma layout: 4:4:4 by default; ``subsample=True`` or
    ``"420"`` for 4:2:0 (box-averaged, the web default), ``"422"`` for
    horizontal-only halving (the broadcast/camera default). Lossy by
    nature — tests assert fidelity bounds, not identity, EXCEPT
    progressive-vs-baseline: both modes quantize identically, so their
    decodes are pixel-identical."""
    h, w, nch = arr.shape
    if nch not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    if not isinstance(quality, int) or not 1 <= quality <= 100:
        raise ValueError(f"quality must be an int in [1, 100], got {quality!r}")
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise ValueError(
            f"restart_interval must be in [0, 65535], got {restart_interval}"
        )
    arr = arr.astype(np.float64)
    if nch == 3:
        r_, g_, b_ = arr[..., 0], arr[..., 1], arr[..., 2]
        planes = [
            0.299 * r_ + 0.587 * g_ + 0.114 * b_,
            -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128,
            0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128,
        ]
        if subsample in (False, None, "444"):
            factors = [(1, 1)] * 3
        elif subsample in (True, "420"):
            factors = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "422":  # horizontal-only chroma halving
            factors = [(2, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(
                f"subsample must be False/True or '444'/'420'/'422', "
                f"got {subsample!r}"
            )
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

    # quantized zigzag coefficient blocks per component (padded MCU grid),
    # one batched forward DCT per component — both scan layouts read from
    # these, which is what makes progressive-vs-baseline decode identity
    # testable (identical coefficients, different entropy ordering)
    comp_blocks = []
    for (fh, fv), plane in zip(factors, padded):
        by, bx = plane.shape[0] // 8, plane.shape[1] // 8
        cells = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
        coefs = np.einsum("ij,ybjk,kl->ybil", _DCT, cells, _DCT.T)
        q = np.round(coefs / qtbl).astype(np.int64).reshape(by, bx, 64)
        comp_blocks.append(q[:, :, ZIGZAG])

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
        0xC2 if progressive else 0xC0,
        struct.pack(">BHHB", 8, h, w, len(planes)) + sof_comps,
    )
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    if progressive:
        body = _encode_progressive_scans(
            comp_blocks, factors, mcus_x, mcus_y, hmax, vmax, h, w, seg,
            restart_interval,
        )
    else:
        body = _encode_baseline_scan(
            comp_blocks, factors, mcus_x, mcus_y, seg, restart_interval
        )
    return b"\xff\xd8" + dqt + sof + dri + body + b"\xff\xd9"


def _encode_baseline_scan(
    comp_blocks, factors, mcus_x, mcus_y, seg, dri=0
) -> bytes:
    """DHT + single interleaved SOS covering the full spectrum (SOF0)."""
    dc_codes = _encode_codes(DC_BITS, DC_VALS)
    ac_codes = _encode_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    preds = [0] * len(comp_blocks)
    for mcu in range(mcus_y * mcus_x):
        if dri and mcu and mcu % dri == 0:
            bw.restart(mcu // dri - 1)
            preds = [0] * len(comp_blocks)
        my, mx = divmod(mcu, mcus_x)
        for ci, (fh, fv) in enumerate(factors):
            for v in range(fv):
                for u in range(fh):
                    q = comp_blocks[ci][my * fv + v, mx * fh + u]
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
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(DC_BITS[1:]) + bytes(DC_VALS)
    ) + seg(
        0xC4,
        bytes([0x10]) + bytes(AC_BITS[1:]) + bytes(AC_VALS)
    )
    sos_comps = b"".join(
        struct.pack(">BB", i + 1, 0x00) for i in range(len(comp_blocks))
    )
    sos = seg(
        0xDA, bytes([len(comp_blocks)]) + sos_comps + b"\x00\x3f\x00"
    )
    return dht + sos + bytes(bw.out)


# Progressive AC scans use EOBn symbols (r<<4, r=0..14) that Annex K's
# baseline AC table does not define, so the progressive encoder declares
# its own table: every symbol 0x00..0xFE at 9 bits — canonically valid
# (255 codes < 2^9), trivially correct, and compression is not the
# fixture encoder's job.
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = list(range(0xFF))


def _encode_progressive_scans(
    comp_blocks, factors, mcus_x, mcus_y, hmax, vmax, h, w, seg, dri=0
) -> bytes:
    """The SOF2 scan script: DHT + 2 DC scans + 4·ncomp AC band scans.

    Successive approximation per T.81 G.1.2: the DC first pass sends
    arithmetic-shifted diffs (point transform ``>> Al``), the DC
    refinement one raw bit per block; AC first passes send
    magnitude-shifted (toward zero) coefficients with EOB-run coding,
    AC refinement passes send newly-significant coefficients as
    (zero-history-run, sign) plus buffered correction bits for the
    already-significant ones crossed on the way.
    """
    dc_codes = _encode_codes(DC_BITS, DC_VALS)
    ac_codes = _encode_codes(PROG_AC_BITS, PROG_AC_VALS)
    ncomp = len(comp_blocks)
    # non-interleaved scans cover only the component's true block grid
    nb = []
    for fh, fv in factors:
        cw, ch = -(-w * fh // hmax), -(-h * fv // vmax)
        nb.append((-(-ch // 8), -(-cw // 8)))

    def sos_header(comp_ids, ss, se, ah, al):
        comps = b"".join(
            struct.pack(">BB", cid, 0x00) for cid in comp_ids
        )
        return seg(
            0xDA,
            bytes([len(comp_ids)]) + comps + bytes([ss, se, (ah << 4) | al]),
        )

    out = seg(
        0xC4, bytes([0x00]) + bytes(DC_BITS[1:]) + bytes(DC_VALS)
    ) + seg(
        0xC4, bytes([0x10]) + bytes(PROG_AC_BITS[1:]) + bytes(PROG_AC_VALS)
    )

    # --- scan 1: DC first, interleaved, Al=1 ---
    al = 1
    bw = _BitWriter()
    preds = [0] * ncomp
    for mcu in range(mcus_y * mcus_x):
        if dri and mcu and mcu % dri == 0:
            bw.restart(mcu // dri - 1)
            preds = [0] * ncomp
        my, mx = divmod(mcu, mcus_x)
        for ci, (fh, fv) in enumerate(factors):
            for v in range(fv):
                for u in range(fh):
                    dc = int(comp_blocks[ci][my * fv + v, mx * fh + u, 0])
                    val = dc >> al  # arithmetic shift (T.81 G.1.2.1)
                    diff = val - preds[ci]
                    preds[ci] = val
                    t = _category(diff)
                    code, length = dc_codes[t]
                    bw.write(code, length)
                    if t:
                        bw.write(
                            diff if diff >= 0 else diff + (1 << t) - 1, t
                        )
    bw.flush()
    out += sos_header(range(1, ncomp + 1), 0, 0, 0, al) + bytes(bw.out)

    # --- scan 2: DC refinement, Ah=1 → Al=0: one raw bit per block ---
    bw = _BitWriter()
    for mcu in range(mcus_y * mcus_x):
        if dri and mcu and mcu % dri == 0:
            bw.restart(mcu // dri - 1)
        my, mx = divmod(mcu, mcus_x)
        for ci, (fh, fv) in enumerate(factors):
            for v in range(fv):
                for u in range(fh):
                    dc = int(comp_blocks[ci][my * fv + v, mx * fh + u, 0])
                    bw.write(dc & 1, 1)
    bw.flush()
    out += sos_header(range(1, ncomp + 1), 0, 0, 1, 0) + bytes(bw.out)

    # --- AC band scans, first pass at Al=1 then refinement to Al=0 ---
    bands = [(1, 5), (6, 63)]
    for ss, se in bands:
        for ci in range(ncomp):
            out += sos_header([ci + 1], ss, se, 0, 1) + _ac_first_scan(
                comp_blocks[ci], nb[ci], ss, se, 1, ac_codes, dri
            )
    for ss, se in bands:
        for ci in range(ncomp):
            out += sos_header([ci + 1], ss, se, 1, 0) + _ac_refine_scan(
                comp_blocks[ci], nb[ci], ss, se, 0, ac_codes, dri
            )
    return out


def _ac_first_scan(blocks, nb, ss, se, al, ac_codes, dri=0) -> bytes:
    """AC first pass over one band (T.81 G.1.2.2): magnitude-shifted
    coefficients, zero runs, EOB runs aggregated across blocks."""
    bw = _BitWriter()
    eobrun = 0

    def emit_eobrun():
        nonlocal eobrun
        if eobrun:
            rbits = eobrun.bit_length() - 1
            code, length = ac_codes[rbits << 4]
            bw.write(code, length)
            if rbits:
                bw.write(eobrun - (1 << rbits), rbits)
            eobrun = 0

    nb_y, nb_x = nb
    n = 0
    for by in range(nb_y):
        for bx in range(nb_x):
            if dri and n and n % dri == 0:
                emit_eobrun()
                bw.restart(n // dri - 1)
            n += 1
            blk = blocks[by, bx]
            vals = []
            for k in range(ss, se + 1):
                c = int(blk[k])
                mag = (c if c >= 0 else -c) >> al  # toward-zero shift
                vals.append(mag if c >= 0 else -mag)
            if not any(vals):
                eobrun += 1
                if eobrun == 0x7FFF:
                    emit_eobrun()
                continue
            emit_eobrun()
            run = 0
            last_nz = max(i for i, v in enumerate(vals) if v)
            for i, v in enumerate(vals):
                if i > last_nz:
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]
                    bw.write(code, length)
                    run -= 16
                s = _category(v)
                code, length = ac_codes[(run << 4) | s]
                bw.write(code, length)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < len(vals) - 1:
                eobrun += 1
    emit_eobrun()
    bw.flush()
    return bytes(bw.out)


def _ac_refine_scan(blocks, nb, ss, se, al, ac_codes, dri=0) -> bytes:
    """AC refinement pass over one band (T.81 G.1.2.3): runs count only
    zero-history positions, already-significant coefficients contribute
    buffered correction bits flushed after each emitted symbol."""
    bw = _BitWriter()
    eobrun = 0
    # two buffers, as the interchange format requires (T.81 G.1.2.3 /
    # the standard two-buffer encoder structure): ``be`` holds correction
    # bits belonging to the pending EOB run (emitted right after the EOB
    # symbol), ``br`` holds the CURRENT block's correction bits since the
    # last symbol (emitted right after the NEXT symbol — a merged buffer
    # would put them before a following ZRL, which the decoder reads
    # after it)
    be: list[int] = []
    br: list[int] = []

    def flush(buf):
        for b in buf:
            bw.write(b, 1)
        buf.clear()

    def emit_eobrun():
        nonlocal eobrun
        if eobrun:
            rbits = eobrun.bit_length() - 1
            code, length = ac_codes[rbits << 4]
            bw.write(code, length)
            if rbits:
                bw.write(eobrun - (1 << rbits), rbits)
            flush(be)
            eobrun = 0

    nb_y, nb_x = nb
    n = 0
    for by in range(nb_y):
        for bx in range(nb_x):
            if dri and n and n % dri == 0:
                emit_eobrun()
                bw.restart(n // dri - 1)
            n += 1
            blk = blocks[by, bx]
            absvals = []
            last_new = -1
            for i, k in enumerate(range(ss, se + 1)):
                c = int(blk[k])
                t = (c if c >= 0 else -c) >> al
                absvals.append(t)
                if t == 1:
                    last_new = i
            run = 0
            for i, k in enumerate(range(ss, se + 1)):
                t = absvals[i]
                if t == 0:
                    run += 1
                    continue
                while run > 15 and i <= last_new:
                    emit_eobrun()
                    code, length = ac_codes[0xF0]
                    bw.write(code, length)
                    run -= 16
                    flush(br)
                if t > 1:  # already significant: buffer its correction bit
                    br.append(t & 1)
                    continue
                emit_eobrun()
                code, length = ac_codes[(run << 4) | 1]
                bw.write(code, length)
                bw.write(1 if int(blk[k]) >= 0 else 0, 1)
                flush(br)
                run = 0
            if run > 0 or br:
                eobrun += 1
                be.extend(br)
                br.clear()
                if eobrun == 0x7FFF or len(be) > 900:
                    emit_eobrun()
    emit_eobrun()
    bw.flush()
    return bytes(bw.out)
