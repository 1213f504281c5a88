"""Minimal xlsx support for the ETL test harness — stdlib only.

The reference's primary user-facing test format is xlsx
(easy_sql/sql_tester.py:617-710: ``suit*`` sheets scanned for ``CASE``
blocks with VARS / INCLUDES / INPUT / OUTPUT / UDFS / FUNCS labels).  This
container has no openpyxl, so this module implements the small subset of
OOXML needed to read and write those workbooks directly with ``zipfile`` +
``xml.etree``: shared strings, inline strings, booleans, numbers, and
Excel serial dates (sql_tester.py:442-459 — days since 1899-12-30).

Reader returns sheets as plain ``list[list[Any]]`` cell grids; the case
parser (:func:`parse_xlsx_cases`) mirrors the reference's block semantics
(sql_tester.py:370-559, 644-710) and produces the same
:class:`~easy_sql_spark.testing.sql_tester.TestCase` objects the JSON
harness runs, so one runner serves both formats.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import re
import zipfile
from typing import Any
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_EXCEL_EPOCH = dt.datetime(1899, 12, 30)
_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")

CASE_LABELS = ("CASE", "VARS", "INCLUDES", "INPUT", "OUTPUT", "UDFS", "FUNCS")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int:
    """Cell reference column letters → 0-based index (``A``→0, ``AA``→26)."""
    m = _CELL_REF_RE.match(ref)
    if not m:
        raise ValueError(f"bad cell reference: {ref!r}")
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _text_of(elem: ET.Element) -> str:
    """Concatenate every <t> descendant (handles rich-text <r> runs)."""
    return "".join(t.text or "" for t in elem.iter() if _local(t.tag) == "t")


def excel_serial_to_datetime(value: float) -> dt.datetime:
    """Excel-for-Windows day serial → datetime (sql_tester.py:451-455)."""
    return _EXCEL_EPOCH + dt.timedelta(days=value)


def read_xlsx(path: str) -> dict[str, list[list[Any]]]:
    """Read a workbook into ``{sheet_name: rows}`` cell grids.

    Cell typing: shared/inline strings → ``str``, ``t="b"`` → ``bool``,
    numerics → ``int`` when integral else ``float``.  Date formatting is
    NOT resolved from styles.xml — date-typed columns receive the raw day
    serial and the case parser converts it, exactly where the reference
    funnels every date cell through ``parse_cell_value_as_date``.
    Missing/empty cells are ``None``; rows are padded to equal width.
    """
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            shared = [_text_of(si) for si in root if _local(si.tag) == "si"]

        # sheet name -> target path, via workbook.xml + its rels
        rels = {}
        rel_root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rel_root:
            target = rel.get("Target", "")
            if target.startswith("/"):
                target = target[1:]
            elif not target.startswith("xl/"):
                target = "xl/" + target
            rels[rel.get("Id")] = target
        wb_root = ET.fromstring(zf.read("xl/workbook.xml"))
        rid_attr = (
            "{http://schemas.openxmlformats.org/officeDocument/2006/"
            "relationships}id"
        )
        sheets: dict[str, list[list[Any]]] = {}
        for elem in wb_root.iter():
            if _local(elem.tag) != "sheet":
                continue
            name = elem.get("name", "")
            target = rels.get(elem.get(rid_attr), "")
            sheets[name] = _read_sheet(zf, target, shared)
        return sheets


def _read_sheet(
    zf: zipfile.ZipFile, target: str, shared: list[str]
) -> list[list[Any]]:
    root = ET.fromstring(zf.read(target))
    rows: list[list[Any]] = []
    max_w = 0
    for row_el in root.iter():
        if _local(row_el.tag) != "row":
            continue
        cells: list[Any] = []
        for c in row_el:
            if _local(c.tag) != "c":
                continue
            ref = c.get("r")
            idx = _col_index(ref) if ref else len(cells)
            while len(cells) < idx:
                cells.append(None)
            cells.append(_cell_value(c, shared))
        max_w = max(max_w, len(cells))
        rows.append(cells)
    for r in rows:
        r.extend([None] * (max_w - len(r)))
    return rows


def _cell_value(c: ET.Element, shared: list[str]) -> Any:
    ctype = c.get("t", "n")
    v_el = next((ch for ch in c if _local(ch.tag) == "v"), None)
    if ctype == "inlineStr":
        is_el = next((ch for ch in c if _local(ch.tag) == "is"), None)
        return _text_of(is_el) if is_el is not None else None
    if v_el is None or v_el.text is None:
        return None
    text = v_el.text
    if ctype == "s":
        return shared[int(text)]
    if ctype == "b":
        return text == "1"
    if ctype == "str":  # cached formula result
        return text
    f = float(text)
    return int(f) if f.is_integer() else f


# ------------------------------------------------------------------ writer
def write_xlsx(path: str, sheets: dict[str, list[list[Any]]]) -> str:
    """Write ``{sheet_name: rows}`` grids as a minimal valid workbook.

    Strings are stored inline (no sharedStrings part), numbers/bools
    natively, datetimes as Excel day serials (numeric) so a round-trip
    exercises the same serial-date path real Excel files hit.
    """
    sheet_entries = list(sheets.items())
    ct = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">',
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>',
        '<Default Extension="xml" ContentType="application/xml"/>',
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>',
    ]
    for i in range(len(sheet_entries)):
        ct.append(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
        )
    ct.append("</Types>")

    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )

    wb_sheets = "".join(
        f'<sheet name="{escape(name, {chr(34): "&quot;"})}" '
        f'sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, (name, _) in enumerate(sheet_entries)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.'
        'org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            f'worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheet_entries))
        )
        + "</Relationships>"
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", "".join(ct))
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, (_, rows) in enumerate(sheet_entries):
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(rows)
            )
    return path


def _sheet_xml(rows: list[list[Any]]) -> str:
    out = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>',
    ]
    for r_idx, row in enumerate(rows, start=1):
        out.append(f'<row r="{r_idx}">')
        for c_idx, value in enumerate(row):
            if value is None or value == "":
                continue
            ref = f"{_col_letters(c_idx)}{r_idx}"
            if isinstance(value, bool):
                out.append(f'<c r="{ref}" t="b"><v>{int(value)}</v></c>')
            elif isinstance(value, (int, float)):
                out.append(f'<c r="{ref}"><v>{value}</v></c>')
            elif isinstance(value, (dt.datetime, dt.date)):
                if not isinstance(value, dt.datetime):
                    value = dt.datetime(value.year, value.month, value.day)
                serial = (value - _EXCEL_EPOCH) / dt.timedelta(days=1)
                serial = int(serial) if float(serial).is_integer() else serial
                out.append(f'<c r="{ref}"><v>{serial}</v></c>')
            else:
                out.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space='
                    f'"preserve">{escape(str(value))}</t></is></c>'
                )
        out.append("</row>")
    out.append("</sheetData></worksheet>")
    return "".join(out)


def _col_letters(idx: int) -> str:
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return letters


# ------------------------------------------------------------- case parser
def _cell_str(value: Any) -> str | None:
    if value is None:
        return None
    s = str(value).strip()
    return s or None


def parse_date_cell(value: Any) -> dt.datetime | None:
    """Reference ``parse_cell_value_as_date`` (sql_tester.py:442-459)."""
    if value is None or (isinstance(value, str) and value.strip() == ""):
        return None
    if isinstance(value, str):
        value = value.strip()
        if len(value) not in (len("2000-01-01"), len("2000-01-01 00:00:00")):
            raise AssertionError(
                "date column must be of format `yyyy-MM-dd` or "
                "`yyyy-MM-dd HH:mm:ss`"
            )
        fmt = "%Y-%m-%d" if len(value) == len("2000-01-01") else "%Y-%m-%d %H:%M:%S"
        return dt.datetime.strptime(value, fmt)
    if isinstance(value, (int, float)):
        return excel_serial_to_datetime(value)
    if isinstance(value, dt.datetime):
        return value
    raise AssertionError(f"unknown date cell value: {value!r}")


def parse_xlsx_cases(
    path: str,
    default_col_type: str = "string",
    sql_file_path: str | None = None,
) -> list:
    """Parse every CASE block of every ``suit*`` sheet into
    :class:`TestCase` objects (sql_tester.py:644-710).

    ``sql_file_path`` defaults to the xlsx path with a ``.sql`` extension
    (the reference's same-name convention, sql_tester.py:684-687).
    """
    from .sql_tester import TestCase

    if sql_file_path is None:
        sql_file_path = path[: path.rindex(".")] + ".sql"

    cases: list[TestCase] = []
    for sheet_name, rows in read_xlsx(path).items():
        if not sheet_name.lower().startswith("suit"):
            continue
        # split the sheet into CASE blocks (sql_tester.py:654-671)
        blocks: list[list[list[Any]]] = []
        for row in rows:
            label = _cell_str(row[0] if row else None)
            if label == "CASE":
                blocks.append([row])
            elif blocks:
                blocks[-1].append(row)
        for block in blocks:
            cases.append(
                _parse_case_block(block, sql_file_path, default_col_type)
            )
    return cases


def _parse_case_block(
    block: list[list[Any]], sql_file_path: str, default_col_type: str
):
    from .sql_tester import TestCase

    case = TestCase(name="unnamed case", sql_file_path=sql_file_path)
    # group consecutive rows under their leading label (sql_tester.py:688-705)
    sections: list[tuple[str, list[list[Any]]]] = []
    for row in block:
        label = _cell_str(row[0] if row else None)
        if label in CASE_LABELS:
            sections.append((label, [row]))
        elif sections:
            sections[-1][1].append(row)
    for label, rows in sections:
        if label == "CASE":
            case.name = _cell_str(rows[0][1]) or "unnamed case"
        elif label == "VARS":
            _parse_vars(case, rows)
        elif label == "INCLUDES":
            for row in rows:
                name = _cell_str(row[1]) if len(row) > 1 else None
                if name:
                    value = _cell_str(row[2]) if len(row) > 2 else None
                    if not value:
                        raise AssertionError(
                            f"there must be value set for INCLUDES `{name}`"
                        )
                    case.includes[name] = value
        elif label == "UDFS":
            case.udf_file_paths.extend(
                p for p in (_cell_str(c) for c in rows[0][1:]) if p
            )
        elif label == "FUNCS":
            case.func_file_paths.extend(
                p for p in (_cell_str(c) for c in rows[0][1:]) if p
            )
        elif label in ("INPUT", "OUTPUT"):
            table = _parse_table_block(label, rows, default_col_type)
            (case.inputs if label == "INPUT" else case.outputs).append(table)
    if not case.inputs or not case.outputs:
        missed = [
            f
            for f, ok in (("inputs", case.inputs), ("outputs", case.outputs))
            if not ok
        ]
        raise AssertionError(
            f"parse test case failed, got incomplete case, missed fields: "
            f"{missed}"
        )
    return case


def _parse_vars(case, rows: list[list[Any]]) -> None:
    if len(rows) < 2:
        raise AssertionError("there must be value set for VARS, found None")
    for name_cell, value_cell in zip(rows[0][1:], rows[1][1:]):
        name = _cell_str(name_cell)
        if not name:
            continue
        if name.lower() == "data_date":  # sql_tester.py:433-440
            d = parse_date_cell(value_cell)
            case.vars[name] = d.strftime("%Y-%m-%d") if d else None
        else:
            case.vars[name] = value_cell


def _parse_table_block(
    label: str, rows: list[list[Any]], default_col_type: str
):
    from .sql_tester import TableData

    header = rows[0]
    name = _cell_str(header[1]) if len(header) > 1 else None
    if not name:
        raise AssertionError(f"there must be table name set for {label}")

    columns: list[str] = []
    column_types: list[str] = []
    for cell in header[2:]:
        col = _cell_str(cell)
        if not col:
            break
        if ":" in col:
            cname, ctype = col.split(":", 1)
            columns.append(cname.strip())
            column_types.append(ctype.strip())
        else:
            columns.append(col)
            column_types.append(default_col_type)
    if not columns:
        raise AssertionError(
            f"there must be at least one column set for {label}, found 0"
        )

    values: list[list[Any]] = []
    descriptions: list[str] = []
    for row in rows[1:]:
        cells = row[2 : 2 + len(columns)]
        cells.extend([None] * (len(columns) - len(cells)))
        has_values = any(v not in (None, "") for v in cells)
        desc = _cell_str(row[1]) if len(row) > 1 else None
        if desc:
            descriptions.append(desc)
            values.append(_convert_row(cells, column_types))
        elif label == "INPUT" and has_values:
            # rows of input data must carry a description (sql_tester.py:520-526)
            raise AssertionError(f"no description for table({name}) data row")
        elif label == "OUTPUT" and has_values:
            values.append(_convert_row(cells, column_types))
    return TableData(
        name=name,
        columns=columns,
        column_types=column_types,
        values=values,
        value_descriptions=descriptions,
    )


def _convert_row(cells: list[Any], column_types: list[str]) -> list[Any]:
    """Normalize xlsx cell values for :meth:`TableData.typed_rows`: date
    columns funnel through the serial-date converter; everything else is
    passed raw to the shared ``cast_value`` type system."""
    out = []
    for value, ctype in zip(cells, column_types):
        base = ctype.strip().lower()
        if base in ("date", "timestamp", "datetime") and not (
            isinstance(value, str) and value.strip() == "null"
        ):
            out.append(parse_date_cell(value))
        else:
            out.append(value)
    return out


# -------------------------------------------------------------- conversion
def convert_xlsx_to_json(path: str, out_path: str | None = None) -> str:
    """xlsx test file → the JSON twin format (sql_tester.py:1003-1011)."""
    cases = parse_xlsx_cases(path)
    out_path = out_path or path[: -len(".xlsx")] + ".json"

    def default(o: Any) -> Any:
        if isinstance(o, dt.datetime):
            return o.strftime("%Y-%m-%d %H:%M:%S")
        if isinstance(o, dt.date):
            return o.strftime("%Y-%m-%d")
        raise TypeError(f"not JSON-serializable: {o!r}")

    data = []
    for c in cases:
        data.append(
            {
                "name": c.name,
                "sql_file_path": c.sql_file_path,
                "sql_file_content": c.sql_file_content,
                "vars": c.vars,
                "includes": c.includes,
                "inputs": [t.__dict__ for t in c.inputs],
                "outputs": [t.__dict__ for t in c.outputs],
                "udf_file_paths": c.udf_file_paths,
                "func_file_paths": c.func_file_paths,
            }
        )
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(
            data, f, default=default, ensure_ascii=False, indent=2,
            sort_keys=True,
        )
    return out_path
