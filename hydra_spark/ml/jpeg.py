"""JPEG decoder (ITU-T T.81) — stdlib + numpy, no image library.

Supports baseline sequential DCT (SOF0/SOF1) AND progressive DCT (SOF2:
spectral selection + successive approximation, DC/AC first and
refinement scans, EOB runs, restart markers). Arithmetic-coded,
hierarchical and lossless modes raise NotImplementedError.

Architecture: every SOS scan decodes into per-component zigzag
coefficient arrays (baseline is simply the one scan that carries
DC+AC at full precision); reconstruction — dequantize, 8x8 IDCT as two
matrix products, nearest-neighbor chroma upsample, JFIF YCbCr→RGB —
runs once at the end over the accumulated coefficients.

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

# 8-point DCT basis: samples = C.T @ coeff @ C
_C = np.array([
    [np.cos((2 * x + 1) * u * np.pi / 16) * (np.sqrt(0.5) if u == 0 else 1.0) / 2
     for x in range(8)]
    for u in range(8)
])


def _idct2(coeffs: np.ndarray) -> np.ndarray:
    """2-D inverse DCT over the last two axes (..., 8, 8)."""
    return np.einsum("ux,...uv,vy->...xy", _C, coeffs, _C)


class _HuffTable:
    """Canonical JPEG Huffman table with a flat (length, code) lookup."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _RestartMarker(Exception):
    pass


class _BitReader:
    """MSB-first bit reader over entropy-coded data; un-stuffs 0xFF00
    and surfaces RSTn markers as exceptions."""

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
                self.pos += 1  # consume marker; caller resets state
                raise _RestartMarker()
            else:
                self.pos -= 1  # leave the marker for the segment parser
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

    def reset(self) -> None:
        self.bits = 0
        self.nbits = 0

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker and reset bit state."""
        self.reset()
        while True:
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG → uint8 array (h, w) grayscale or (h, w, 3) RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None
    state = None  # per-component coefficient arrays + geometry

    while pos < len(payload) - 1:
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
                    qt[tq] = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                else:
                    qt[tq] = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                (huff_ac if tc else huff_dc)[th] = _HuffTable(counts, seg[i + 17 : i + 17 + n])
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if precision != 8:
                raise NotImplementedError(f"JPEG precision {precision}")
            comps = []
            for c in range(nc):
                comps.append({
                    "id": seg[6 + 3 * c],
                    "h": seg[7 + 3 * c] >> 4,
                    "v": seg[7 + 3 * c] & 0xF,
                    "tq": seg[8 + 3 * c],
                })
            if h * w > 64_000_000:  # decode-bomb guard (multimodal.MAX_DECODE_PIXELS)
                raise ValueError(f"JPEG {w}x{h} exceeds the decode-bomb guard")
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
            state = _init_state(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF{marker - 0xC0} unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                ci = next(i for i, cc in enumerate(frame["comps"]) if cc["id"] == cs)
                scan_comps.append((ci, tt >> 4, tt & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0xF
            if not frame["progressive"]:
                ss, se, ah, al = 0, 63, 0, 0
            pos = _decode_scan(
                payload, pos + seg_len, frame, state, scan_comps, ss, se, ah, al,
                huff_dc, huff_ac, restart_interval,
            )
            continue
        pos += seg_len

    if frame is None or state is None:
        raise ValueError("no frame decoded")
    return _reconstruct(frame, state, qt)


def _init_state(frame):
    """Per-component zigzag coefficient arrays, MCU-padded."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    state = {"hmax": hmax, "vmax": vmax, "mcus_x": mcus_x, "mcus_y": mcus_y, "coefs": []}
    for c in comps:
        # true (non-interleaved) block grid vs MCU-padded allocation
        bw = -(-(-(-frame["w"] * c["h"] // hmax)) // 8)
        bh = -(-(-(-frame["h"] * c["v"] // vmax)) // 8)
        c["bw"], c["bh"] = bw, bh
        state["coefs"].append(
            np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
        )
    return state


def _decode_scan(data, start, frame, state, scan_comps, ss, se, ah, al,
                 huff_dc, huff_ac, restart_interval):
    comps = frame["comps"]
    coefs = state["coefs"]
    reader = _BitReader(data, start)
    pred = [0] * len(comps)
    eobrun = [0]  # boxed: shared across blocks within a restart segment

    if len(scan_comps) > 1:
        # interleaved: MCU walk over all scan components
        units = []
        for ci, dc_t, ac_t in scan_comps:
            c = comps[ci]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    units.append((ci, dc_t, ac_t, by, bx))
        total_mcus = state["mcus_y"] * state["mcus_x"]

        def block_iter():
            for m in range(total_mcus):
                my, mx = divmod(m, state["mcus_x"])
                for ci, dc_t, ac_t, by, bx in units:
                    c = comps[ci]
                    yield ci, dc_t, ac_t, my * c["v"] + by, mx * c["h"] + bx
        n_units = total_mcus
    else:
        ci, dc_t, ac_t = scan_comps[0]
        c = comps[ci]

        def block_iter():
            for by in range(c["bh"]):
                for bx in range(c["bw"]):
                    yield ci, dc_t, ac_t, by, bx
        n_units = c["bh"] * c["bw"]

    mcu_of_block = None  # restart bookkeeping runs on scan units
    it = block_iter()
    unit_idx = 0
    done = False
    # group blocks by scan unit (MCU or single block) for restart handling
    blocks_per_unit = len(units) if len(scan_comps) > 1 else 1
    pending = []
    restart_consumed = False  # a RSTn eaten mid-unit already serves the next boundary
    while not done:
        if restart_interval and unit_idx and unit_idx % restart_interval == 0:
            if restart_consumed:
                # the retry path consumed this boundary's marker already;
                # scanning forward would silently drop one whole interval
                restart_consumed = False
            else:
                try:
                    reader.sync_restart()
                except IndexError:
                    break
            pred = [0] * len(comps)
            eobrun[0] = 0
        for _attempt in (0, 1):
            try:
                taken = []
                for _ in range(blocks_per_unit):
                    try:
                        taken.append(next(it))
                    except StopIteration:
                        done = True
                        break
                if not taken:
                    break
                for ci, dc_t, ac_t, by, bx in taken:
                    block = coefs[ci][by, bx]
                    if ss == 0:
                        _decode_dc(reader, block, huff_dc.get(dc_t), pred, ci, ah, al)
                    if se > 0:
                        _decode_ac(reader, block, huff_ac.get(ac_t), ss, se, ah, al, eobrun)
                break
            except _RestartMarker:
                # marker hit mid-unit: reset and retry this unit once
                pred = [0] * len(comps)
                eobrun[0] = 0
                reader.reset()
                it = _chain(taken, it)
                restart_consumed = True
                continue
            except (EOFError, IndexError):
                done = True
                break
        unit_idx += 1
    del pending, mcu_of_block
    # advance past any trailing entropy bytes to the next marker
    p = reader.pos
    while p < len(data) - 1 and not (data[p] == 0xFF and data[p + 1] != 0x00 and not (0xD0 <= data[p + 1] <= 0xD7)):
        p += 1
    return p


def _chain(taken, it):
    yield from taken
    yield from it


def _decode_dc(reader, block, table, pred, ci, ah, al):
    if ah == 0:  # first DC scan
        t = reader.decode_symbol(table)
        pred[ci] += _extend(reader.read_bits(t), t)
        block[0] = pred[ci] << al
    else:  # DC refinement: one bit
        if reader.read_bit():
            block[0] |= 1 << al


def _decode_ac(reader, block, table, ss, se, ah, al, eobrun):
    if ss == 0:  # AC part of a baseline scan (ss=0, se=63)
        k = 1
    else:
        k = ss
    if ah == 0:
        if eobrun[0] > 0:
            eobrun[0] -= 1
            return
        while k <= se:
            rs = reader.decode_symbol(table)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                eobrun[0] = (1 << r) - 1
                if r:
                    eobrun[0] += reader.read_bits(r)
                break
            k += r
            if k > se:
                break
            block[k] = _extend(reader.read_bits(s), s) << al
            k += 1
    else:
        _decode_ac_refine(reader, block, table, k, se, al, eobrun)


def _decode_ac_refine(reader, block, table, ss, se, al, eobrun):
    """T.81 G.1.2.3 AC successive-approximation refinement."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = reader.decode_symbol(table)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    # T.81 G.1.2.3: EOBRUN counts THIS block too — the
                    # tail section below still reads its correction bits
                    # before decrementing
                    eobrun[0] = 1 << r
                    if r:
                        eobrun[0] += reader.read_bits(r)
                    break
                newval = 0
            else:
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                coef = block[k]
                if coef != 0:
                    if reader.read_bit() and (coef & p1) == 0:
                        block[k] += p1 if coef > 0 else m1
                else:
                    if r == 0:
                        if newval:
                            block[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun[0] > 0:
        # correction bits for remaining nonzero coefficients in the band
        while k <= se:
            coef = block[k]
            if coef != 0 and reader.read_bit() and (coef & p1) == 0:
                block[k] += p1 if coef > 0 else m1
            k += 1
        eobrun[0] -= 1


def _reconstruct(frame, state, qt):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax, vmax = state["hmax"], state["vmax"]
    out = []
    for ci, c in enumerate(comps):
        zz = state["coefs"][ci] * qt[c["tq"]]  # dequant in zigzag order
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz
        by, bx = nat.shape[0], nat.shape[1]
        blocks = _idct2(nat.reshape(by, bx, 8, 8)) + 128.0
        plane = blocks.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
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
