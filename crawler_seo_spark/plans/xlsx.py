"""Minimal driver-side .xlsx writer (stdlib only — zipfile + XML).

The reference's user-facing deliverable is a formatted Excel workbook with
one sheet per report tab (reports/excel_generator.py:18-211: sheet-per-tab,
auto-sized columns). No Excel library ships in this container, and an
engine should not depend on one anyway — OOXML's spreadsheet format is a
zip of small XML parts, so this module emits it directly:

* one ``xl/worksheets/sheetN.xml`` per tab, cells as inline strings or
  numbers (no shared-string table — report tabs are small and inline
  strings keep the writer single-pass);
* auto-sized columns (reference ``:194-211``): width = clamped max cell
  text length per column;
* a frozen header row (pane at A2), mirroring the reference's header
  emphasis.

This is a presentation sink: it runs on the DRIVER over collected tab rows
(every tab is bounded — filters/top-k/summary — except the main tab, which
is capped by ``max_rows``; the scale path for full data is the parquet
sink in :mod:`crawler_seo_spark.plans.reports`).
"""

from __future__ import annotations

import math
import re
import zipfile
from xml.sax.saxutils import escape

# XML 1.0 cannot represent these control chars at all (even escaped) —
# strip them so a stray byte in crawled content can't corrupt the workbook
_XML_INVALID = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")

_XMLNS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_RELNS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKGRELNS = "http://schemas.openxmlformats.org/package/2006/relationships"
_CTNS = "http://schemas.openxmlformats.org/package/2006/content-types"


def _col_letter(i: int) -> str:
    """0-based column index → A, B, ..., Z, AA, ..."""
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell(col: int, row: int, value) -> str:
    ref = f"{_col_letter(col)}{row}"
    if value is None:
        return ""
    if isinstance(value, bool):  # before int: bool is an int subclass
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        # NaN/±inf have no OOXML numeric representation (<v>inf</v> corrupts
        # the cell for Excel readers) — emit an empty cell for all of them
        if isinstance(value, float) and not math.isfinite(value):
            return ""
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    text = escape(_XML_INVALID.sub("", str(value))).replace("\r", "")
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


# Conditional-format detection + rules mirror the reference's score/
# severity formatting (reports/excel_generator.py:213-339): score columns
# (name contains score/pontuação/nota) get >=80 green, 50-79 yellow, <50
# red cell rules plus a 3-color scale; severity columns (gravidade/
# crítico/médio) get contains-text CRÍTICO (red) / MÉDIO (orange) rules.
_SCORE_WORDS = ("score", "pontuação", "nota")
_SEVERITY_WORDS = ("gravidade", "crítico", "médio")
# dxf ids (order in <dxfs> below): 0 high/green, 1 mid/yellow, 2 low/red,
# 3 CRÍTICO (white on red), 4 MÉDIO (white on orange)
_DXFS = (
    '<dxfs count="5">'
    '<dxf><font><color rgb="FF006100"/></font>'
    '<fill><patternFill><bgColor rgb="FFC6EFCE"/></patternFill></fill></dxf>'
    '<dxf><font><color rgb="FF9C6500"/></font>'
    '<fill><patternFill><bgColor rgb="FFFFEB9C"/></patternFill></fill></dxf>'
    '<dxf><font><color rgb="FF9C0006"/></font>'
    '<fill><patternFill><bgColor rgb="FFFFC7CE"/></patternFill></fill></dxf>'
    '<dxf><font><color rgb="FFFFFFFF"/></font>'
    '<fill><patternFill><bgColor rgb="FFFF0000"/></patternFill></fill></dxf>'
    '<dxf><font><color rgb="FFFFFFFF"/></font>'
    '<fill><patternFill><bgColor rgb="FFFFA500"/></patternFill></fill></dxf>'
    '</dxfs>')


def _conditional_formatting(header: list[str], n_rows: int) -> str:
    """<conditionalFormatting> blocks for score/severity columns."""
    if n_rows == 0:
        return ""
    blocks = []
    for c, name in enumerate(header):
        low = str(name).lower()
        ref = f"{_col_letter(c)}2:{_col_letter(c)}{n_rows + 1}"
        first = f"{_col_letter(c)}2"
        if any(w in low for w in _SCORE_WORDS):
            blocks.append(
                f'<conditionalFormatting sqref="{ref}">'
                f'<cfRule type="cellIs" dxfId="0" priority="1" '
                f'operator="greaterThanOrEqual"><formula>80</formula></cfRule>'
                f'<cfRule type="cellIs" dxfId="1" priority="2" '
                f'operator="between"><formula>50</formula>'
                f'<formula>79</formula></cfRule>'
                f'<cfRule type="cellIs" dxfId="2" priority="3" '
                f'operator="lessThan"><formula>50</formula></cfRule>'
                f'<cfRule type="colorScale" priority="4"><colorScale>'
                f'<cfvo type="min"/><cfvo type="percentile" val="50"/>'
                f'<cfvo type="max"/><color rgb="FFF8696B"/>'
                f'<color rgb="FFFFEB84"/><color rgb="FF63BE7B"/>'
                f'</colorScale></cfRule>'
                f'</conditionalFormatting>')
        elif any(w in low for w in _SEVERITY_WORDS):
            blocks.append(
                f'<conditionalFormatting sqref="{ref}">'
                f'<cfRule type="containsText" dxfId="3" priority="1" '
                f'operator="containsText" text="CRÍTICO">'
                f'<formula>NOT(ISERROR(SEARCH("CRÍTICO",{first})))</formula>'
                f'</cfRule>'
                f'<cfRule type="containsText" dxfId="4" priority="2" '
                f'operator="containsText" text="MÉDIO">'
                f'<formula>NOT(ISERROR(SEARCH("MÉDIO",{first})))</formula>'
                f'</cfRule>'
                f'</conditionalFormatting>')
    return "".join(blocks)


def _sheet_xml(header: list[str], rows: list[tuple]) -> str:
    widths = [len(str(h)) for h in header]
    body = []
    cells = "".join(_cell(c, 1, h) for c, h in enumerate(header))
    body.append(f'<row r="1">{cells}</row>')
    for r, row in enumerate(rows, start=2):
        cells = []
        for c, v in enumerate(row):
            if v is not None and c < len(widths):
                widths[c] = max(widths[c], min(len(str(v)), 80))
            cells.append(_cell(c, r, v))
        body.append(f'<row r="{r}">{"".join(cells)}</row>')
    cols = "".join(
        f'<col min="{i + 1}" max="{i + 1}" width="{min(w + 2, 60)}" '
        f'customWidth="1"/>' for i, w in enumerate(widths))
    return (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_XMLNS}">'
        f'<sheetViews><sheetView workbookViewId="0">'
        f'<pane ySplit="1" topLeftCell="A2" state="frozen"/>'
        f'</sheetView></sheetViews>'
        f'<cols>{cols}</cols>'
        f'<sheetData>{"".join(body)}</sheetData>'
        f'{_conditional_formatting(header, len(rows))}'
        f'</worksheet>')


_STYLES = (
    f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<styleSheet xmlns="{_XMLNS}">'
    '<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>'
    '<fills count="2"><fill><patternFill patternType="none"/></fill>'
    '<fill><patternFill patternType="gray125"/></fill></fills>'
    '<borders count="1"><border/></borders>'
    '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
    '<cellXfs count="1"><xf/></cellXfs>'
    f'{_DXFS}</styleSheet>')


def _sanitize_name(name: str, taken: set[str]) -> str:
    """Excel sheet names: ≤31 chars, no []:*?/\\ — and unique."""
    clean = "".join("_" if ch in "[]:*?/\\" else ch for ch in name)[:31]
    base, n = clean, 1
    while clean in taken:
        n += 1
        clean = f"{base[:28]}_{n}"
    taken.add(clean)
    return clean


def write_workbook(path: str,
                   sheets: list[tuple[str, list[str], list[tuple]]]) -> None:
    """Write ``sheets`` = [(name, header, rows), ...] as a valid .xlsx."""
    if not sheets:
        raise ValueError("workbook needs at least one sheet")
    taken: set[str] = set()
    names = [_sanitize_name(n, taken) for n, _, _ in sheets]
    n = len(sheets)
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        f'ContentType="application/vnd.openxmlformats-officedocument.'
        f'spreadsheetml.worksheet+xml"/>' for i in range(n))
    content_types = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Types xmlns="{_CTNS}">'
        f'<Default Extension="rels" ContentType="application/vnd.'
        f'openxmlformats-package.relationships+xml"/>'
        f'<Default Extension="xml" ContentType="application/xml"/>'
        f'<Override PartName="/xl/workbook.xml" ContentType="application/'
        f'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        f'{overrides}'
        f'<Override PartName="/xl/styles.xml" ContentType="application/vnd.'
        f'openxmlformats-officedocument.spreadsheetml.styles+xml"/></Types>')
    root_rels = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKGRELNS}">'
        f'<Relationship Id="rId1" Type="{_RELNS}/officeDocument" '
        f'Target="xl/workbook.xml"/></Relationships>')
    sheet_tags = "".join(
        f'<sheet name="{escape(names[i])}" sheetId="{i + 1}" '
        f'r:id="rId{i + 1}"/>' for i in range(n))
    workbook = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_XMLNS}" xmlns:r="{_RELNS}">'
        f'<sheets>{sheet_tags}</sheets></workbook>')
    wb_rels = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKGRELNS}">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="{_RELNS}/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>' for i in range(n))
        + f'<Relationship Id="rId{n + 1}" Type="{_RELNS}/styles" '
          f'Target="styles.xml"/></Relationships>')

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/styles.xml", _STYLES)
        for i, (_, header, rows) in enumerate(sheets):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml",
                       _sheet_xml(header, rows))
