"""Stdlib xlsx codec — zip + sheet XML + sharedStrings.

xlsx is just a zip of XML parts; `xlsx_rows` parses the first sheet into
rows of strings (the shape hydra's reader produces via openpyxl,
reference utils/reader.py:31-43) with zero dependencies, and
`xlsx_bytes` is its deterministic writer twin for fixtures/datagen.

Date-styled numeric cells render the way str(openpyxl's value) would —
openpyxl resolves styles.xml number formats and yields datetime/date/
time (or timedelta for elapsed [h]:mm:ss formats), so serial numbers
must not leak through as raw digits: builtin ids 14-22/45-47, custom
formats probed for date letters after stripping quoted/locale/color
blocks, the 1900-system phantom-leap-day adjustment under serial 60,
and the workbookPr date1904 epoch are all honored.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

XLSX_MAGIC = b"PK\x03\x04"
XLSX_MIME = "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'AB3' → 27 (zero-based column from the letter part)."""
    n = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def _cell_text(elem) -> str:
    """All <t> text under a cell/si node (handles rich-text runs)."""
    return "".join(t.text or "" for t in elem.iter(f"{_NS}t"))


def _num_str(v: str) -> str:
    """Render a numeric cell the way `str(openpyxl_value)` would:
    an integer literal stays an int ('3' → '3'), anything with a
    decimal point / exponent is a float ('3.0' → '3.0', '2.5e1' →
    '25.0') — openpyxl types cells the same way, so the stdlib and
    openpyxl paths extract identical strings."""
    try:
        f = float(v)
    except ValueError:
        return v
    if "e" not in v.lower() and "." not in v:
        return v  # integer literal, openpyxl yields int
    return repr(f)  # float literal, openpyxl yields float (str(3.0)='3.0')


_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"

# ------------------------------------------------------------- date styles
#
# openpyxl (the reference's xlsx engine, utils/reader.py:31-43) resolves
# each numeric cell's number format and yields datetime/date/time objects
# for date-styled cells — so "byte-identical extracted text per url"
# requires the stdlib codec to render those cells the way
# str(openpyxl_value) would, not as raw serial numbers.

# ECMA-376 §18.8.30 implied number formats that openpyxl treats as dates
_BUILTIN_DATE_IDS = frozenset(range(14, 23)) | {45, 46, 47}
# [h]/[mm]/[ss] elapsed-duration formats yield timedelta in openpyxl
_TIMEDELTA_RE = re.compile(r"\[(h+|m+|s+)\]", re.IGNORECASE)
# strip color tags, quoted literals and locale/currency [$-409] blocks
# (but NOT elapsed [h]/[mm]/[ss]) before probing for date letters —
# the same normalization openpyxl's is_date_format applies
_FMT_STRIP_RE = re.compile(
    r"\[(BLACK|BLUE|CYAN|GREEN|MAGENTA|RED|WHITE|YELLOW)\]"
    r'|"[^"]*"'
    r"|\[(?!hh?\]|mm?\]|ss?\])[^\]]*\]"
    r"|\\.",
    re.IGNORECASE,
)
_SECS_PER_DAY = 86400


def _is_date_format(fmt: str) -> bool:
    first = fmt.split(";")[0]
    return re.search(r"[dmhys]", _FMT_STRIP_RE.sub("", first), re.IGNORECASE) is not None


def _load_date_styles(zf: zipfile.ZipFile, names: list[str]) -> tuple[list[str], bool]:
    """Per-cellXf date kind ('' | 'date' | 'timedelta') and the workbook's
    date1904 flag (workbookPr, ECMA-376 §18.2.28)."""
    date1904 = False
    if "xl/workbook.xml" in names:
        root = ElementTree.fromstring(zf.read("xl/workbook.xml"))
        pr = root.find(f"{_NS}workbookPr")
        if pr is not None and pr.get("date1904", "0").lower() in ("1", "true"):
            date1904 = True
    kinds: list[str] = []
    if "xl/styles.xml" in names:
        root = ElementTree.fromstring(zf.read("xl/styles.xml"))
        custom: dict[int, str] = {}
        for nf in root.iter(f"{_NS}numFmt"):
            try:
                custom[int(nf.get("numFmtId", "-1"))] = nf.get("formatCode", "")
            except ValueError:
                pass
        xfs = root.find(f"{_NS}cellXfs")
        for xf in (xfs.iter(f"{_NS}xf") if xfs is not None else ()):
            try:
                fmt_id = int(xf.get("numFmtId", "0"))
            except ValueError:
                fmt_id = 0
            fmt = custom.get(fmt_id)
            if fmt is not None:
                is_date = _is_date_format(fmt)
                is_td = is_date and _TIMEDELTA_RE.search(fmt.split(";")[0]) is not None
            else:
                is_date = fmt_id in _BUILTIN_DATE_IDS
                is_td = fmt_id == 46  # builtin '[h]:mm:ss'
            kinds.append("timedelta" if is_td else ("date" if is_date else ""))
    return kinds, date1904


def _serial_str(v: str, kind: str, date1904: bool) -> str:
    """Render a date-styled serial the way str(openpyxl's from_excel)
    would: 1899-12-30 epoch with the +1-day adjustment under serial 60
    (Excel's phantom 1900-02-29), 1904-01-01 epoch when date1904,
    0<v<1 → time-of-day, elapsed formats → timedelta."""
    import datetime as _dt

    try:
        value = float(v)
    except ValueError:
        return v
    try:
        day, fraction = divmod(value, 1)
        # millisecond precision, like openpyxl's from_excel rounding
        usec = round(fraction * _SECS_PER_DAY * 1000) * 1000
        delta = _dt.timedelta(days=day, microseconds=usec)
        if kind == "timedelta":
            return str(delta)
        if not date1904:
            if 0 < value < 1:
                return str((_dt.datetime(1900, 1, 1) + delta).time())
            if 0 <= value < 60:
                delta += _dt.timedelta(days=1)
            return str(_dt.datetime(1899, 12, 30) + delta)
        if 0 < value < 1:
            return str((_dt.datetime(1904, 1, 1) + delta).time())
        return str(_dt.datetime(1904, 1, 1) + delta)
    except (OverflowError, ValueError):  # out of datetime range / NaN / inf:
        return _num_str(v)  # raw number view, untrusted bytes must not raise


def _workbook_sheets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, zip part path)] in WORKBOOK order (what openpyxl's
    wb.sheetnames reflects), resolved through workbook.xml.rels."""
    names = zf.namelist()
    if "xl/workbook.xml" not in names:
        return []
    rels: dict[str, str] = {}
    if "xl/_rels/workbook.xml.rels" in names:
        root = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in root.iter(f"{_REL_NS}Relationship"):
            target = rel.get("Target", "")
            part = target.lstrip("/") if target.startswith("/") else f"xl/{target}"
            rels[rel.get("Id", "")] = part
    out = []
    root = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    for sheet in root.iter(f"{_NS}sheet"):
        part = rels.get(sheet.get(f"{_R_NS}id", ""))
        if part and part in names:
            out.append((sheet.get("name", ""), part))
    return out


def xlsx_sheet_names(data: bytes) -> list[str]:
    return [n for n, _ in _workbook_sheets(zipfile.ZipFile(io.BytesIO(data)))]


def xlsx_rows(data: bytes, sheet_name: str | None = None) -> list[list[str]]:
    """Stdlib xlsx → rows of strings, the shape utils/reader.py:31-43
    produces via openpyxl iter_rows. ``sheet_name`` selects like the
    reference's inspection-driven ``wb[sheet_name]`` (utils/reader.py:36),
    default first sheet in workbook order. Sparse rows are densified from
    cell refs; trailing missing cells are left out (matching openpyxl's
    used-range behavior closely enough for the tabular files hydra
    ingests)."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    names = zf.namelist()

    shared: list[str] = []
    if "xl/sharedStrings.xml" in names:
        root = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
        shared = [_cell_text(si) for si in root.iter(f"{_NS}si")]

    sheets = _workbook_sheets(zf)
    if sheet_name is not None:
        part = next((p for n, p in sheets if n == sheet_name), None)
        if part is None:
            raise ValueError(f"xlsx: no sheet named {sheet_name!r}")
    elif sheets:
        part = sheets[0][1]
    else:  # no/odd workbook.xml: fall back to lowest-numbered sheet part
        part = next(
            (n for n in sorted(names) if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)), None
        )
    if part is None:
        raise ValueError("xlsx has no worksheet XML")
    xf_kinds, date1904 = _load_date_styles(zf, names)
    root = ElementTree.fromstring(zf.read(part))

    rows: list[list[str]] = []
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, str] = {}
        width = 0
        for c in row.iter(f"{_NS}c"):
            idx = _col_index(c.get("r", "")) if c.get("r") else width
            t = c.get("t", "n")
            if t == "s":
                v = c.find(f"{_NS}v")
                text = shared[int(v.text)] if v is not None else ""
            elif t == "inlineStr":
                is_el = c.find(f"{_NS}is")
                text = _cell_text(is_el) if is_el is not None else ""
            elif t == "b":  # openpyxl yields bool: str(True) = 'True'
                v = c.find(f"{_NS}v")
                raw = (v.text or "").strip() if v is not None else ""
                text = "" if not raw else str(raw not in ("0", "false", "FALSE"))
            elif t in ("str", "e"):
                v = c.find(f"{_NS}v")
                text = v.text or "" if v is not None else ""
            else:  # numeric; date-styled serials render as openpyxl datetimes
                v = c.find(f"{_NS}v")
                s_idx = c.get("s")
                kind = ""
                if s_idx is not None:
                    try:
                        kind = xf_kinds[int(s_idx)]
                    except (ValueError, IndexError):
                        kind = ""
                if v is not None and v.text:
                    text = _serial_str(v.text, kind, date1904) if kind else _num_str(v.text)
                else:
                    text = ""
            cells[idx] = text
            width = max(width, idx + 1)
        rows.append([cells.get(i, "") for i in range(width)])
    return rows


def xlsx_bytes(
    rows: list[list],
    sheet_name: str = "Sheet1",
    extra_sheets: list | None = None,
) -> bytes:
    """Deterministic minimal xlsx writer (fixtures/datagen): inline
    strings for non-numeric cells, fixed zip timestamps so equal rows →
    equal bytes. ``extra_sheets`` = [(name, rows)] appended after the
    first sheet."""

    def esc(s: str) -> str:
        return (
            str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    # date-styled cells: minimal cellXfs [general, builtin-14 date,
    # builtin-22 datetime, builtin-21 time]; styles.xml is only emitted
    # when a date value appears, so date-free fixtures stay byte-identical
    import datetime as _dt

    used_styles = [False]

    def _to_serial(v) -> float:
        if isinstance(v, _dt.datetime):
            delta = v - _dt.datetime(1899, 12, 30)
        elif isinstance(v, _dt.date):
            delta = _dt.datetime.combine(v, _dt.time()) - _dt.datetime(1899, 12, 30)
        else:  # time-of-day: pure day fraction
            return (v.hour * 3600 + v.minute * 60 + v.second + v.microsecond / 1e6) / _SECS_PER_DAY
        serial = delta.days + delta.seconds / _SECS_PER_DAY + delta.microseconds / (_SECS_PER_DAY * 1e6)
        return serial - 1 if serial < 61 else serial  # inverse leap-bug shift

    def cell_xml(ref: str, v) -> str:
        if isinstance(v, _dt.datetime):
            used_styles[0] = True
            return f'<c r="{ref}" s="2"><v>{_to_serial(v)}</v></c>'
        if isinstance(v, _dt.date):
            used_styles[0] = True
            return f'<c r="{ref}" s="1"><v>{int(_to_serial(v))}</v></c>'
        if isinstance(v, _dt.time):
            used_styles[0] = True
            return f'<c r="{ref}" s="3"><v>{_to_serial(v)}</v></c>'
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{esc(v)}</t></is></c>'

    def col_letters(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            out = chr(ord("A") + r) + out
        return out

    def sheet_xml(sheet_rows: list[list]) -> str:
        body = "".join(
            f'<row r="{ri + 1}">'
            + "".join(cell_xml(f"{col_letters(ci)}{ri + 1}", v) for ci, v in enumerate(row))
            + "</row>"
            for ri, row in enumerate(sheet_rows)
        )
        return (
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{_NS[1:-1]}"><sheetData>{body}</sheetData></worksheet>'
        )

    ns = _NS[1:-1]
    sheets = [(sheet_name, rows)] + list(extra_sheets or [])
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(len(sheets))
    )
    sheet_decls = "".join(
        f'<sheet name="{esc(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, (n, _) in enumerate(sheets)
    )
    sheet_rels = "".join(
        f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
        for i in range(len(sheets))
    )
    files = {
        "[Content_Types].xml": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            f"{overrides}"
            "</Types>"
        ),
        "_rels/.rels": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>"
        ),
        "xl/workbook.xml": (
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{ns}" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_decls}</sheets></workbook>"
        ),
        "xl/_rels/workbook.xml.rels": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f"{sheet_rels}"
            "</Relationships>"
        ),
    }
    for i, (_, sheet_rows) in enumerate(sheets):
        files[f"xl/worksheets/sheet{i + 1}.xml"] = sheet_xml(sheet_rows)
    if used_styles[0]:
        files["xl/styles.xml"] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<styleSheet xmlns="{ns}"><cellXfs count="4">'
            '<xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/>'
            '<xf numFmtId="22" applyNumberFormat="1"/>'
            '<xf numFmtId="21" applyNumberFormat="1"/>'
            "</cellXfs></styleSheet>"
        )
        files["[Content_Types].xml"] = files["[Content_Types].xml"].replace(
            "</Types>",
            '<Override PartName="/xl/styles.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/></Types>',
        )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in files.items():
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, content)
    return buf.getvalue()
