"""Stdlib legacy .xls (BIFF8) codec — finishes S7.

Reference reads xls via xlrd and selects ``sheet_name`` from the
inspection (utils/reader.py:31-43); xlrd does not ship in this
container, so this is a bounded from-scratch BIFF8 reader over the
stdlib: the OLE2/CFB container (FAT + miniFAT chains), the Workbook
stream's globals substream (BOUNDSHEET + SST with CONTINUE handling),
and the cell records that carry strings and numbers (LABELSST, LABEL,
RSTRING, NUMBER, RK, MULRK, BOOLERR, FORMULA+STRING). BIFF5/7 ('Book'
streams, Excel 5.0/95) is read too: no SST, inline codepage byte
strings (CODEPAGE record honored, cp1252 default), version detected
from the BOF record. Styles, dates, charts and rich-text formatting
runs are out of scope — cells degrade to "" rather than erroring;
date cells stay raw serials, which matches the reference engine: xlrd
yields the serial float as Cell.value (the typed result after smart
cast is the same number).

``xls_bytes`` is the deterministic writer twin (fixtures/datagen), like
``xlsx_bytes`` for xlsx: a minimal single-FAT OLE2 container holding a
BIFF8 Workbook stream.

Number rendering matches the xlsx codec's ``_num_str`` view (integers
stay integer strings) so both Excel paths feed identical strings into
the shared smart-cast pipeline; xlrd itself would yield ``3.0`` — the
typed result after casting is the same.
"""

from __future__ import annotations

import struct

XLS_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
XLS_MIME = "application/vnd.ms-excel"

_FREE = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD


# ---------------------------------------------------------------- CFB/OLE2


def _u32s(data: bytes) -> list[int]:
    return list(struct.unpack(f"<{len(data) // 4}I", data[: len(data) // 4 * 4]))


def _read_chain(data: bytes, fat: list[int], start: int, sec_size: int, header: int) -> bytes:
    out = []
    sid = start
    seen = 0
    while sid != _ENDOFCHAIN and sid != _FREE:
        off = header + sid * sec_size
        out.append(data[off : off + sec_size])
        sid = fat[sid] if sid < len(fat) else _ENDOFCHAIN
        seen += 1
        if seen > len(fat) + 1:
            raise ValueError("xls: cyclic FAT chain")
    return b"".join(out)


def _cfb_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Extract the first directory stream whose name is in ``names``
    ('Workbook' for BIFF8, 'Book' for BIFF5-named files)."""
    if data[:8] != XLS_MAGIC:
        raise ValueError("not an OLE2 compound file")
    sector_shift = struct.unpack_from("<H", data, 30)[0]
    mini_shift = struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    first_dir = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    first_minifat = struct.unpack_from("<I", data, 60)[0]
    n_minifat = struct.unpack_from("<I", data, 64)[0]
    first_difat = struct.unpack_from("<I", data, 68)[0]
    sec = 1 << sector_shift
    mini = 1 << mini_shift
    header = 512  # sector 0 starts after the 512-byte header for v3 AND v4

    # FAT sector list: 109 header DIFAT entries + DIFAT chain
    difat = [s for s in _u32s(data[76:512]) if s not in (_FREE, _ENDOFCHAIN)]
    sid = first_difat
    while sid not in (_ENDOFCHAIN, _FREE):
        block = data[header + sid * sec : header + (sid + 1) * sec]
        entries = _u32s(block)
        difat += [s for s in entries[:-1] if s not in (_FREE, _ENDOFCHAIN)]
        sid = entries[-1]
    fat: list[int] = []
    for s in difat[:n_fat] if n_fat else difat:
        fat += _u32s(data[header + s * sec : header + (s + 1) * sec])

    directory = _read_chain(data, fat, first_dir, sec, header)
    root_start = root_size = None
    target = None
    for off in range(0, len(directory), 128):
        ent = directory[off : off + 128]
        if len(ent) < 128:
            break
        name_len = struct.unpack_from("<H", ent, 64)[0]
        obj_type = ent[66]
        name = ent[: max(0, name_len - 2)].decode("utf-16-le", "replace")
        start = struct.unpack_from("<I", ent, 116)[0]
        size = struct.unpack_from("<Q", ent, 120)[0]
        if obj_type == 5:  # root: holds the ministream
            root_start, root_size = start, size
        elif obj_type == 2 and name in names and target is None:
            target = (start, size)
    if target is None:
        raise ValueError(f"xls: no {'/'.join(names)} stream")
    start, size = target
    if size >= mini_cutoff:
        return _read_chain(data, fat, start, sec, header)[:size]
    # ministream: 64-byte sectors inside the root entry's stream
    ministream = _read_chain(data, fat, root_start, sec, header)[:root_size]
    minifat: list[int] = []
    sid = first_minifat
    n = 0
    while sid not in (_ENDOFCHAIN, _FREE) and n < max(n_minifat, 1):
        minifat += _u32s(data[header + sid * sec : header + (sid + 1) * sec])
        sid = fat[sid] if sid < len(fat) else _ENDOFCHAIN
        n += 1
    out = []
    sid = start
    while sid not in (_ENDOFCHAIN, _FREE):
        out.append(ministream[sid * mini : (sid + 1) * mini])
        sid = minifat[sid] if sid < len(minifat) else _ENDOFCHAIN
    return b"".join(out)[:size]


# ---------------------------------------------------------------- BIFF8 read


class _Records:
    """Record cursor over a BIFF stream with CONTINUE-aware payloads."""

    def __init__(self, stream: bytes, pos: int = 0):
        self.stream = stream
        self.pos = pos

    def __iter__(self):
        while self.pos + 4 <= len(self.stream):
            op, ln = struct.unpack_from("<HH", self.stream, self.pos)
            data = self.stream[self.pos + 4 : self.pos + 4 + ln]
            self.pos += 4 + ln
            yield op, data


def _short_unistr(data: bytes, off: int) -> str:
    """BIFF8 short unicode string (8-bit length) — sheet names."""
    cch = data[off]
    grbit = data[off + 1]
    if grbit & 0x01:
        return data[off + 2 : off + 2 + 2 * cch].decode("utf-16-le", "replace")
    return data[off + 2 : off + 2 + cch].decode("latin-1")


class _SSTCursor:
    """Reads XLUnicodeRichExtendedString values across SST+CONTINUE
    fragment boundaries (a continued string restarts with a fresh grbit
    byte — [MS-XLS] 2.5.293)."""

    def __init__(self, fragments: list[bytes]):
        self.frags = fragments
        self.fi = 0
        self.off = 0

    def _remaining(self) -> int:
        return len(self.frags[self.fi]) - self.off

    def _advance(self):
        while self.fi < len(self.frags) and self.off >= len(self.frags[self.fi]):
            self.fi += 1
            self.off = 0

    def take(self, n: int) -> bytes:
        out = b""
        while n > 0:
            self._advance()
            chunk = self.frags[self.fi][self.off : self.off + n]
            self.off += len(chunk)
            n -= len(chunk)
            out += chunk
        return out

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.take(2))[0]
        grbit = self.take(1)[0]
        n_runs = struct.unpack("<H", self.take(2))[0] if grbit & 0x08 else 0
        ext = struct.unpack("<i", self.take(4))[0] if grbit & 0x04 else 0
        chars: list[str] = []
        need = cch
        wide = bool(grbit & 0x01)
        while need:
            self._advance()
            avail = self._remaining() // (2 if wide else 1)
            if avail == 0:
                # fragment boundary mid-string: next fragment leads with grbit
                wide = bool(self.take(1)[0] & 0x01)
                continue
            n = min(need, avail)
            raw = self.take(n * (2 if wide else 1))
            chars.append(raw.decode("utf-16-le" if wide else "latin-1", "replace"))
            need -= n
        self.take(4 * n_runs + max(ext, 0))  # skip formatting runs/ext
        return "".join(chars)


def _num_str(d: float) -> str:
    if d == int(d) and abs(d) < 2**53:
        return str(int(d))
    return repr(d)


def _rk_value(rk: int) -> float:
    v: float
    if rk & 0x02:  # 30-bit signed int
        v = float(struct.unpack("<i", struct.pack("<I", rk & 0xFFFFFFFC))[0] >> 2)
    else:  # high 30 bits of an IEEE double (low 34 bits zeroed)
        v = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    if rk & 0x01:
        v /= 100
    return v


def _codec_for(codepage: int) -> str:
    """BIFF CODEPAGE → python codec (xlrd's encoding_from_codepage)."""
    special = {10000: "mac_roman", 1200: "utf-16-le", 367: "ascii", 32768: "mac_roman"}
    if codepage in special:
        return special[codepage]
    try:
        b"".decode(f"cp{codepage}")
        return f"cp{codepage}"
    except LookupError:
        return "latin-1"


def _parse_globals(stream: bytes) -> tuple[list[tuple[str, int]], list[str], int, str]:
    """→ ([(sheet_name, stream_offset)], shared_strings, biff_version,
    codec). BIFF5 ('Book' streams, Excel 5.0/95 — the reference reads
    them via xlrd) has no SST and stores names/labels as codepage byte
    strings; the BOF version field (0x0500 vs 0x0600) disambiguates."""
    sheets: list[tuple[str, int]] = []
    sst: list[str] = []
    pending_sst: list[bytes] | None = None
    biff = 8
    codec = "latin-1"
    first = True

    def flush_sst():
        nonlocal pending_sst
        if pending_sst is None:
            return
        cur = _SSTCursor(pending_sst)
        n_unique = struct.unpack("<I", cur.take(8)[4:])[0]
        for _ in range(n_unique):
            sst.append(cur.read_string())
        pending_sst = None

    for op, data in _Records(stream):
        if first:
            first = False
            if op == 0x0809 and len(data) >= 2:  # BOF: vers 0x0500 = BIFF5/7
                vers = struct.unpack_from("<H", data, 0)[0]
                if vers and vers < 0x0600:
                    biff, codec = 5, "cp1252"
        if op == 0x0042 and len(data) >= 2:  # CODEPAGE
            codec = _codec_for(struct.unpack_from("<H", data, 0)[0])
        elif op == 0x0085:  # BOUNDSHEET
            pos = struct.unpack_from("<I", data, 0)[0]
            if biff >= 8:
                name = _short_unistr(data, 6)
            else:  # byte string: cch + codepage chars
                name = data[7 : 7 + data[6]].decode(codec, "replace")
            sheets.append((name, pos))
        elif op == 0x00FC:  # SST (BIFF8 only)
            pending_sst = [data]
            continue
        elif op == 0x003C and pending_sst is not None:  # CONTINUE
            pending_sst.append(data)
            continue
        elif op == 0x000A:  # EOF of globals
            break
        flush_sst()
    flush_sst()
    return sheets, sst, biff, codec


def _parse_sheet(
    stream: bytes, pos: int, sst: list[str], biff: int = 8, codec: str = "latin-1"
) -> list[list[str]]:
    cells: dict[int, dict[int, str]] = {}

    def put(r: int, c: int, v: str):
        cells.setdefault(r, {})[c] = v

    last_formula: tuple[int, int] | None = None
    for op, data in _Records(stream, pos):
        if op == 0x000A:  # EOF — end of this sheet substream
            break
        if op == 0x00FD:  # LABELSST
            r, c, _, isst = struct.unpack_from("<HHHI", data)
            put(r, c, sst[isst] if isst < len(sst) else "")
        elif op == 0x0203:  # NUMBER
            r, c, _ = struct.unpack_from("<HHH", data)
            put(r, c, _num_str(struct.unpack_from("<d", data, 6)[0]))
        elif op == 0x027E:  # RK
            r, c, _, rk = struct.unpack_from("<HHHI", data)
            put(r, c, _num_str(_rk_value(rk)))
        elif op == 0x00BD:  # MULRK
            r, c0 = struct.unpack_from("<HH", data)
            n = (len(data) - 6) // 6
            for i in range(n):
                rk = struct.unpack_from("<I", data, 4 + 6 * i + 2)[0]
                put(r, c0 + i, _num_str(_rk_value(rk)))
        elif op == 0x0204:  # LABEL (BIFF8 unicode / BIFF5 byte string cell)
            r, c, _ = struct.unpack_from("<HHH", data)
            cch = struct.unpack_from("<H", data, 6)[0]
            if biff >= 8:
                grbit = data[8]
                raw = data[9 : 9 + cch * (2 if grbit & 1 else 1)]
                put(r, c, raw.decode("utf-16-le" if grbit & 1 else "latin-1", "replace"))
            else:
                put(r, c, data[8 : 8 + cch].decode(codec, "replace"))
        elif op == 0x00D6:  # RSTRING (legacy rich string cell)
            r, c, _ = struct.unpack_from("<HHH", data)
            cch = struct.unpack_from("<H", data, 6)[0]
            put(r, c, data[8 : 8 + cch].decode(codec, "replace"))
        elif op == 0x0205:  # BOOLERR
            r, c, _, val, is_err = struct.unpack_from("<HHHBB", data)
            # xlrd yields int 1/0 for BIFF bool cells (str → '1'/'0');
            # openpyxl's bool→'True'/'False' applies only to the xlsx path
            put(r, c, "" if is_err else str(val))
        elif op == 0x0006:  # FORMULA: cached numeric result or string marker
            r, c, _ = struct.unpack_from("<HHH", data)
            result = data[6:14]
            if result[6:8] == b"\xff\xff":
                if result[0] == 0:  # string result: value in following STRING
                    last_formula = (r, c)
                    continue
                if result[0] == 1:  # bool
                    put(r, c, str(result[2]))
                else:  # error / blank
                    put(r, c, "")
            else:
                put(r, c, _num_str(struct.unpack("<d", result)[0]))
        elif op == 0x0207 and last_formula is not None:  # STRING
            cch, grbit = struct.unpack_from("<HB", data)
            raw = data[3 : 3 + cch * (2 if grbit & 1 else 1)]
            put(*last_formula, raw.decode("utf-16-le" if grbit & 1 else "latin-1", "replace"))
        last_formula = None

    if not cells:
        return []
    rows = []
    for r in range(max(cells) + 1):
        row = cells.get(r, {})
        width = max(row) + 1 if row else 0
        rows.append([row.get(i, "") for i in range(width)])
    return rows


def xls_sheet_names(data: bytes) -> list[str]:
    stream = _cfb_stream(data, ("Workbook", "Book"))
    return [name for name, _ in _parse_globals(stream)[0]]


def xls_biff_version(data: bytes) -> int:
    """5 for BIFF5/7 (Excel 5.0/95), 8 for BIFF8 (Excel 97+)."""
    return _parse_globals(_cfb_stream(data, ("Workbook", "Book")))[2]


def xls_rows(data: bytes, sheet_name: str | None = None) -> list[list[str]]:
    """Legacy .xls → rows of strings; ``sheet_name`` selects like the
    reference's inspection-driven ``wb[sheet_name]`` (utils/reader.py:41),
    default first sheet in workbook order."""
    stream = _cfb_stream(data, ("Workbook", "Book"))
    sheets, sst, biff, codec = _parse_globals(stream)
    if not sheets:
        raise ValueError("xls: no BOUNDSHEET records")
    if sheet_name is None:
        pos = sheets[0][1]
    else:
        match = [p for n, p in sheets if n == sheet_name]
        if not match:
            raise ValueError(f"xls: no sheet named {sheet_name!r}")
        pos = match[0]
    return _parse_sheet(stream, pos, sst, biff, codec)


# --------------------------------------------------------------- BIFF8 write


def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _biff_workbook(sheets: list[tuple[str, list[list]]], biff: int = 8) -> bytes:
    """Minimal BIFF stream: globals (BOUNDSHEETs + SST for BIFF8) + one
    substream per sheet. BIFF8 string cells are LABELSST; BIFF5 has no
    SST — strings are inline LABEL byte strings (cp1252)."""
    vers = 0x0600 if biff >= 8 else 0x0500
    # shared string table over all string cells, in first-seen order
    sst_index: dict[str, int] = {}
    total_refs = 0
    if biff >= 8:
        for _, rows in sheets:
            for row in rows:
                for v in row:
                    if not (isinstance(v, (int, float)) and not isinstance(v, bool)):
                        total_refs += 1
                        sst_index.setdefault(str(v), len(sst_index))

    def unistr(s: str) -> bytes:
        wide = any(ord(ch) > 0xFF for ch in s)
        enc = s.encode("utf-16-le") if wide else s.encode("latin-1")
        return struct.pack("<HB", len(s), 0x01 if wide else 0x00) + enc

    sst_payload = struct.pack("<II", total_refs, len(sst_index)) + b"".join(
        unistr(s) for s in sst_index
    )
    if len(sst_payload) > 8190:
        raise ValueError("fixture SST exceeds one record; keep fixtures small")

    sheet_streams = []
    for _, rows in sheets:
        body = [_rec(0x0809, struct.pack("<HHHHII", vers, 0x0010, 0x0DBB, 0x07CC, 0, 0))]
        nrows = len(rows)
        ncols = max((len(r) for r in rows), default=0)
        body.append(_rec(0x0200, struct.pack("<IIHHH", 0, nrows, 0, ncols, 0)))
        for ri, row in enumerate(rows):
            for ci, v in enumerate(row):
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    body.append(_rec(0x0203, struct.pack("<HHHd", ri, ci, 0, float(v))))
                elif biff >= 8:
                    body.append(
                        _rec(0x00FD, struct.pack("<HHHI", ri, ci, 0, sst_index[str(v)]))
                    )
                else:  # BIFF5 LABEL: inline codepage byte string
                    enc = str(v).encode("cp1252", "replace")
                    body.append(
                        _rec(0x0204, struct.pack("<HHHH", ri, ci, 0, len(enc)) + enc)
                    )
        body.append(_rec(0x000A, b""))
        sheet_streams.append(b"".join(body))

    def globals_stream(offsets: list[int]) -> bytes:
        out = [_rec(0x0809, struct.pack("<HHHHII", vers, 0x0005, 0x0DBB, 0x07CC, 0, 0))]
        if biff < 8:
            out.append(_rec(0x0042, struct.pack("<H", 1252)))  # CODEPAGE
        for (name, _), off in zip(sheets, offsets):
            enc = name.encode("cp1252" if biff < 8 else "latin-1", "replace")
            if biff >= 8:
                out.append(_rec(0x0085, struct.pack("<IHBB", off, 0, len(enc), 0x00) + enc))
            else:  # byte-string name, no unicode grbit
                out.append(_rec(0x0085, struct.pack("<IHB", off, 0, len(enc)) + enc))
        if biff >= 8:
            out.append(_rec(0x00FC, sst_payload))
        out.append(_rec(0x000A, b""))
        return b"".join(out)

    # BOUNDSHEET offsets depend on globals length — fixed point in 2 passes
    offsets = [0] * len(sheets)
    for _ in range(2):
        g = globals_stream(offsets)
        pos = len(g)
        offsets = []
        for s in sheet_streams:
            offsets.append(pos)
            pos += len(s)
    return globals_stream(offsets) + b"".join(sheet_streams)


def xls_bytes(
    rows: list[list],
    sheet_name: str = "Sheet1",
    extra_sheets: list | None = None,
    biff: int = 8,
) -> bytes:
    """Deterministic minimal .xls: OLE2 container (one FAT sector, no
    ministream — the workbook stream is padded past the 4096-byte mini
    cutoff) holding the BIFF workbook. ``extra_sheets`` = list of
    (name, rows) appended after the first sheet; ``biff=5`` writes an
    Excel 5.0/95 file (inline LABEL strings, 'Book' stream name)."""
    stream = _biff_workbook([(sheet_name, rows)] + list(extra_sheets or []), biff)
    size = len(stream)
    padded = max(4096, (size + 511) // 512 * 512)
    stream = stream + b"\x00" * (padded - size)
    n_stream_sectors = padded // 512
    total = 2 + n_stream_sectors  # FAT + directory + stream
    if total > 128:
        raise ValueError("fixture workbook exceeds one FAT sector")

    fat = [_FATSECT, _ENDOFCHAIN]  # sector 0 = FAT itself, sector 1 = directory
    fat += [2 + i + 1 for i in range(n_stream_sectors - 1)] + [_ENDOFCHAIN]
    fat += [_FREE] * (128 - len(fat))

    def dirent(name: str, typ: int, start: int, sz: int, child: int = _FREE) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        ent = raw + b"\x00" * (64 - len(raw))
        ent += struct.pack("<HBB", len(raw), typ, 1)  # name len, type, black
        ent += struct.pack("<iii", -1, -1, child if child != _FREE else -1)
        ent += b"\x00" * 16 + b"\x00" * 4 + b"\x00" * 16  # clsid, state, times
        ent += struct.pack("<IQ", start, sz)
        return ent

    # size must be the padded size: the stream lives in the FAT chain
    # (readers route sizes < the 4096 mini cutoff to the ministream).
    # Trailing zero bytes parse as harmless empty records after the EOF.
    directory = (
        dirent("Root Entry", 5, _ENDOFCHAIN, 0, child=1)
        + dirent("Workbook" if biff >= 8 else "Book", 2, 2, padded)
        + b"\x00" * 256
    )

    header = XLS_MAGIC + b"\x00" * 16
    header += struct.pack("<HHHHH", 0x003E, 0x0003, 0xFFFE, 9, 6)
    header += b"\x00" * 6
    header += struct.pack("<IIII", 0, 1, 1, 0)  # ndir(v4), nfat, firstdir, trans
    header += struct.pack("<IIIII", 4096, _ENDOFCHAIN, 0, _ENDOFCHAIN, 0)
    difat = [0] + [_FREE] * 108
    header += struct.pack("<109I", *difat)
    assert len(header) == 512
    return header + struct.pack("<128I", *fat) + directory + stream
