"""Minimal pure-stdlib XLSX codec (zip + SpreadsheetML XML).

The container ships no Excel library (openpyxl), but the reference's
first-class input is a workbook (petl.fromxlsx, etl/ccdi/c3dc_etl.py:
374-413) and its pivoter writes one (etl/mci/data_pivoter.py:150-170).
An .xlsx file is a zip of small XML parts, so a dependency-free codec
covering the subset the ETL needs is ~200 lines:

Reader: sheet discovery via workbook.xml + its rels, shared strings,
inline strings, numeric cells (raw text preserved — no float
round-trip), boolean cells, cached formula values, sparse cells/rows
(A1 references). Everything is returned as ``str | None`` — source
scans are untyped by contract (S1), typing happens in the mapping layer.

Writer: one worksheet per (headers, rows) pair, inline-string cells for
strings and bare ``<v>`` cells for ints/floats. Only used driver-side
for per-study workbooks (megabytes), never on the data path.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

_M = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_P = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)", re.IGNORECASE)


def _col_index(ref: str) -> int | None:
    """'BC12' -> 0-based column 54; None when the cell has no r attr."""
    m = _CELL_REF.match(ref or "")
    if not m:
        return None
    idx = 0
    for ch in m.group(1).upper():
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def _col_ref(idx: int) -> str:
    """0-based column -> 'A', 25 -> 'Z', 26 -> 'AA'."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _text_of(elem: ET.Element) -> str:
    """Concatenated <t> descendants (rich-text runs collapse)."""
    return "".join(t.text or "" for t in elem.iter(f"{_M}t"))


def _sheet_targets(zf: zipfile.ZipFile) -> dict[str, str]:
    """sheet name -> archive member path, in workbook declaration order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    by_id = {
        rel.get("Id"): rel.get("Target") for rel in rels.iter(f"{_P}Relationship")
    }
    targets: dict[str, str] = {}
    for sheet in wb.iter(f"{_M}sheet"):
        target = by_id.get(sheet.get(f"{_R}id"), "")
        if target.startswith("/"):
            target = target.lstrip("/")
        elif not target.startswith("xl/"):
            target = f"xl/{target}"
        targets[sheet.get("name", "")] = target
    return targets


def sheet_names(path: str) -> list[str]:
    with zipfile.ZipFile(path) as zf:
        return list(_sheet_targets(zf))


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    return [_text_of(si) for si in root.iter(f"{_M}si")]


def _cell_value(cell: ET.Element, shared: list[str]) -> str | None:
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        is_elem = cell.find(f"{_M}is")
        return _text_of(is_elem) if is_elem is not None else None
    v = cell.find(f"{_M}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "b":
        return "TRUE" if v.text.strip() == "1" else "FALSE"
    # 'n' numeric (raw text, no float round-trip), 'str' cached formula
    return v.text


def read_rows(path: str, sheet: str) -> list[list[str | None]]:
    """One worksheet -> dense row-major grid of ``str | None``, padded
    to the widest row. Sparse cells/rows (per their A1 refs) land in the
    right slots."""
    with zipfile.ZipFile(path) as zf:
        targets = _sheet_targets(zf)
        if sheet not in targets:
            raise KeyError(f"worksheet {sheet!r} not in {list(targets)}")
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(targets[sheet]))
    grid: dict[int, dict[int, str | None]] = {}
    next_row = 0
    for row in root.iter(f"{_M}row"):
        r_attr = row.get("r")
        ridx = int(r_attr) - 1 if r_attr else next_row
        next_row = ridx + 1
        cells = grid.setdefault(ridx, {})
        next_col = 0
        for cell in row.iter(f"{_M}c"):
            cidx = _col_index(cell.get("r", ""))
            if cidx is None:
                cidx = next_col
            next_col = cidx + 1
            cells[cidx] = _cell_value(cell, shared)
    if not grid:
        return []
    n_rows = max(grid) + 1
    n_cols = max((max(c) + 1 for c in grid.values() if c), default=0)
    return [
        [grid.get(r, {}).get(c) for c in range(n_cols)] for r in range(n_rows)
    ]


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>{overrides}'
    "</Types>"
)
_SHEET_OVERRIDE = (
    '<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
    'worksheet+xml"/>'
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns='
    '"http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/></Relationships>'
)


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(value))}</t></is></c>'


def write_workbook(
    path: str, sheets: dict[str, tuple[list[str], list[list]]]
) -> None:
    """Write ``{sheet_name: (headers, rows)}`` as a minimal valid .xlsx.
    Header cells and str values become inline strings; int/float values
    numeric cells; None an omitted cell."""
    names = list(sheets)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        overrides = "".join(_SHEET_OVERRIDE.format(i=i + 1) for i in range(len(names)))
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES.format(overrides=overrides))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        sheet_tags = "".join(
            f'<sheet name={quoteattr(n)} sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{_M[1:-1]}" xmlns:r="{_R[1:-1]}">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        rel_tags = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/worksheet"
            f'" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_P[1:-1]}">{rel_tags}</Relationships>',
        )
        for i, name in enumerate(names):
            headers, rows = sheets[name]
            parts = ["<sheetData>"]
            for ridx, row in enumerate([list(headers)] + [list(r) for r in rows]):
                cells = "".join(
                    _cell_xml(f"{_col_ref(c)}{ridx + 1}", v)
                    for c, v in enumerate(row)
                )
                parts.append(f'<row r="{ridx + 1}">{cells}</row>')
            parts.append("</sheetData>")
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<worksheet xmlns="{_M[1:-1]}">{"".join(parts)}</worksheet>',
            )
