"""Baseline JPEG (ITU-T T.81 sequential DCT) decoder — stdlib + numpy.

Closes the last image-decode gap in ml/multimodal.py without an external
image library: Huffman entropy decode (with byte stuffing and restart
markers), dequantization, 8x8 IDCT as two matrix products, chroma
upsampling, and JFIF YCbCr→RGB. Progressive (SOF2), arithmetic-coded
and hierarchical JPEGs raise NotImplementedError — baseline covers the
overwhelming share of crawled web images.

Correctness is cross-checked in tests against the JVM's ImageIO decoder
(via Spark's `image` data source) on real JPEG fixtures — two
independent decoders agreeing within IDCT rounding tolerance.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# 8-point DCT-III basis: block = C.T @ coeff @ C reconstructs samples
_C = np.array([
    [np.cos((2 * x + 1) * u * np.pi / 16) * (np.sqrt(0.5) if u == 0 else 1.0) / 2
     for x in range(8)]
    for u in range(8)
])


def _idct2(coeffs: np.ndarray) -> np.ndarray:
    """2-D inverse DCT over the last two axes (..., 8, 8)."""
    return np.einsum("ux,...uv,vy->...xy", _C, coeffs, _C)


class _HuffTable:
    """Canonical JPEG Huffman table with a flat (code, length) lookup."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 stuffing
    removed and RSTn markers consumed on demand."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                self.pos += 1  # consume the marker; caller resyncs
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker in entropy stream")
        # mask to live bits so the accumulator never grows unboundedly
        self.bits = ((self.bits & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker and reset bit state."""
        self.nbits = 0
        while True:
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 array (h, w) for grayscale or (h, w, 3)
    RGB. Raises NotImplementedError for progressive/arithmetic modes."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None

    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:
                    tbl = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                else:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                table = _HuffTable(counts, seg[i + 17 : i + 17 + n])
                (huff_ac if tc else huff_dc)[th] = table
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline(+ext seq)
            precision, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if precision != 8:
                raise NotImplementedError(f"JPEG precision {precision}")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF{marker - 0xC0} (non-baseline) unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cs] = (tt >> 4, tt & 0xF)
            return _decode_scan(
                payload, pos + seg_len, frame, scan_tables, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seg_len
    raise ValueError("no SOS marker found")


def _decode_scan(data, start, frame, scan_tables, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float32))

    reader = _BitReader(data, start)
    pred = [0] * len(comps)
    mcu_index = 0
    truncated = False
    for my in range(mcus_y):
        if truncated:
            break
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.sync_restart()
                pred = [0] * len(comps)
            # a restart marker may also surface mid-decode when leftover
            # padding bits ran out exactly at the segment boundary: reset
            # DC predictors + bit state and RETRY the same MCU (it is the
            # first of the next restart segment)
            for _attempt in (0, 1):
                try:
                    for ci, c in enumerate(comps):
                        dc_t, ac_t = scan_tables[c["id"]]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                block = _decode_block(
                                    reader, huff_dc[dc_t], huff_ac[ac_t], qt[c["tq"]], pred, ci
                                )
                                y0 = (my * c["v"] + by) * 8
                                x0 = (mx * c["h"] + bx) * 8
                                planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
                    break
                except _RestartMarker:
                    pred = [0] * len(comps)
                    reader.bits = 0
                    reader.nbits = 0
                    continue  # retry this MCU from just past the marker
                except (EOFError, IndexError):
                    truncated = True  # truncated stream: keep what decoded
                    break
            mcu_index += 1
            if truncated:
                break

    out = []
    for ci, c in enumerate(comps):
        plane = planes[ci] + 128.0
        # upsample to full resolution (nearest neighbor, the JFIF default)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out.append(plane[:h, :w])

    if len(out) == 1:
        return np.clip(out[0], 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_table, ac_table, quant, pred, ci):
    coeffs = np.zeros(64, dtype=np.int32)
    t = reader.decode_symbol(dc_table)
    diff = _extend(reader.read_bits(t), t)
    pred[ci] += diff
    coeffs[0] = pred[ci]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            break
        coeffs[k] = _extend(reader.read_bits(s), s)
        k += 1
    dq = np.zeros(64, dtype=np.float32)
    dq[ZIGZAG] = coeffs * quant
    return _idct2(dq.reshape(8, 8))
