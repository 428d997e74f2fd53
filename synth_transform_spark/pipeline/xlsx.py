"""Stdlib .xlsx reader/writer (no openpyxl) for the workbook source (S6).

An .xlsx file is a ZIP of ECMA-376 SpreadsheetML XML parts, so the 4-sheet
access_request_rebuild workbook the reference loads via pandas/openpyxl
(reference resources.py:141-143) parses fine with ``zipfile`` +
``xml.etree`` — the same gate-removal move the stdlib ``html.parser`` tier
made for F1's clean_string. This keeps the Excel source first-class in
containers without openpyxl; ``pipeline.resources.load_workbook`` uses it
as the primary .xlsx path (the CSV-sheet-directory fallback remains).

Supported cell types (everything the workbook shape needs, per spec
§18.3.1.4): shared strings (``t="s"``), inline strings (``t="inlineStr"``),
cached formula strings (``t="str"``), booleans (``t="b"``), errors
(``t="e"`` → null), and numbers (default). Sheet order and names come from
``xl/workbook.xml`` resolved through its relationships part. Column dtypes
mirror ``pd.read_excel``: all-integral numeric columns without blanks load
as int64, numeric with blanks as float64 (blank → NaN), text as object.

The writer emits a minimal valid workbook (shared-strings table included,
so round-trips exercise the reader's sharedStrings path); tests build real
fixtures with it instead of shipping an opaque binary.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd

_MAIN = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_ATTR = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)
_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_index(cell_ref: str) -> int:
    """'B3' → 1 (0-based column index from the letter prefix)."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall(f"{_MAIN}si"):
        # a run-formatted <si> holds several <r><t>..</t></r> fragments
        out.append("".join(t.text or "" for t in si.iter(f"{_MAIN}t")))
    return out


def _sheet_targets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """Ordered (sheet_name, zip_member) pairs from workbook.xml + rels."""
    rels = {}
    for rel in ET.fromstring(zf.read("xl/_rels/workbook.xml.rels")).findall(
        f"{_PKG_REL}Relationship"
    ):
        target = rel.get("Target")
        if target.startswith("/"):
            target = target.lstrip("/")
        else:
            target = "xl/" + target
        rels[rel.get("Id")] = target
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    out = []
    for sheet in wb.find(f"{_MAIN}sheets").findall(f"{_MAIN}sheet"):
        out.append((sheet.get("name"), rels[sheet.get(_REL_ATTR)]))
    return out


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_MAIN}is")
        if is_el is None:
            return None
        return "".join(tt.text or "" for tt in is_el.iter(f"{_MAIN}t"))
    v = c.find(f"{_MAIN}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return v.text in ("1", "true", "TRUE")
    if t == "e":
        return None
    num = float(v.text)
    return int(num) if num.is_integer() else num


def _rows(sheet_xml: bytes, shared: list[str]) -> list[list]:
    root = ET.fromstring(sheet_xml)
    data = root.find(f"{_MAIN}sheetData")
    rows = []
    for row in data.findall(f"{_MAIN}row") if data is not None else []:
        cells: dict[int, object] = {}
        for pos, c in enumerate(row.findall(f"{_MAIN}c")):
            ref = c.get("r")
            j = _col_index(ref) if ref else pos
            cells[j] = _cell_value(c, shared)
        width = max(cells) + 1 if cells else 0
        rows.append([cells.get(j) for j in range(width)])
    return rows


def _frame(rows: list[list]) -> pd.DataFrame:
    """First row = header; pd.read_excel-compatible column dtypes."""
    if not rows:
        return pd.DataFrame()
    header = [str(h) for h in rows[0]]
    width = len(header)
    body = [r + [None] * (width - len(r)) for r in rows[1:]]
    df = pd.DataFrame(body, columns=header, dtype=object)
    for col in df.columns:
        vals = df[col]
        non_null = vals.dropna()
        if len(non_null) and all(
            isinstance(v, (int, float)) and not isinstance(v, bool)
            for v in non_null
        ):
            if len(non_null) == len(vals) and all(
                isinstance(v, int) for v in non_null
            ):
                df[col] = vals.astype("int64")
            else:
                df[col] = vals.astype("float64")
        elif len(non_null) and all(isinstance(v, bool) for v in non_null):
            if len(non_null) == len(vals):
                df[col] = vals.astype(bool)
        else:
            # text column: blanks surface as NaN, matching pd.read_excel
            df[col] = vals.where(vals.notna(), other=float("nan"))
    return df


def read_xlsx(path: str) -> dict[str, pd.DataFrame]:
    """Every sheet of an .xlsx workbook as {name: DataFrame}, stdlib-only."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        return {
            name: _frame(_rows(zf.read(member), shared))
            for name, member in _sheet_targets(zf)
        }


# ---------------------------------------------------------------------------
# writer (minimal valid ECMA-376 package; used by tests to build real
# fixtures and available as a small workbook sink)
# ---------------------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _cell_xml(ref: str, value, strings: dict[str, int]) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        num = repr(int(value)) if float(value).is_integer() else repr(value)
        return f'<c r="{ref}"><v>{num}</v></c>'
    s = str(value)
    if s not in strings:
        strings[s] = len(strings)
    return f'<c r="{ref}" t="s"><v>{strings[s]}</v></c>'


def _col_letter(j: int) -> str:
    out = ""
    j += 1
    while j:
        j, rem = divmod(j - 1, 26)
        out = chr(65 + rem) + out
    return out


def write_xlsx(path: str, sheets: dict[str, list[list]]) -> None:
    """Write {sheet_name: rows (first row = header)} as a valid .xlsx."""
    strings: dict[str, int] = {}
    sheet_parts = []
    for rows in sheets.values():
        body = []
        for i, row in enumerate(rows, start=1):
            cells = "".join(
                _cell_xml(f"{_col_letter(j)}{i}", v, strings)
                for j, v in enumerate(row)
            )
            body.append(f'<row r="{i}">{cells}</row>')
        sheet_parts.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            + "".join(body)
            + "</sheetData></worksheet>"
        )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/'
        f'main" count="{len(strings)}" uniqueCount="{len(strings)}">'
        + "".join(
            f"<si><t xml:space=\"preserve\">{escape(s)}</t></si>"
            for s in strings
        )
        + "</sst>"
    )
    names = list(sheets)
    wb_sheets = "".join(
        f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        '2006/main" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/worksheet"
            f'" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + f'<Relationship Id="rId{len(names) + 1}" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/sharedStrings"
        '" Target="sharedStrings.xml"/>'
        + "</Relationships>"
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/>'
        for i in range(len(names))
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(sheet_overrides=overrides),
        )
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        for i, part in enumerate(sheet_parts):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", part)
