"""Native DOCX/XLSX → markdown converters (SURVEY.md M24/M25) built on
stdlib ``zipfile`` + ``xml.etree`` — no python-docx/openpyxl (absent here).

Behavioral spec is the reference converters, replicated quirk-for-quirk:

- DOCX (/root/reference/services/converters/converters/docx_converter.py):
  * headings: style name startswith 'Heading', level = int(name[-1])
    (docx_converter.py:133-144);
  * the list state machine (docx_converter.py:246-288) with ALL its bugs
    kept as conformance quirks: a new item at a level POPS (and thereby
    DISCARDS) the un-flushed stack entry of the same level — so of N
    consecutive same-level items only the LAST survives; lists are flushed
    only by a regular paragraph or a list-id change — headings and tables
    do NOT flush; and a document that ENDS with a list drops it entirely
    (the reference never calls _close_current_list at end of body);
  * ordered-list detection is the reference's text heuristic
    ``^\\d+\\.?\\s`` (docx_converter.py:229-244), not the numbering XML;
  * run formatting wraps sequentially bold → italic → underline
    (docx_converter.py:297-310), so bold+italic renders ``***text***``;
    runs whose text is whitespace-only are skipped;
  * empty paragraphs are skipped BEFORE list handling, so they do not
    flush lists (docx_converter.py:126-127);
  * table cell text = ' '.join of non-empty paragraph texts
    (docx_converter.py:323-329), first row is assumed header;
  * equations counted by the literal substring 'math' in the paragraph XML
    (docx_converter.py:59-60); pages = number of w:sectPr (sections).
- XLSX (xlsx_converter.py):
  * per non-empty sheet: a level-2 heading ``Sheet: <name>`` + one table;
  * rows with any value kept, trailing empty cells trimmed, all rows
    padded to the max width (xlsx_converter.py:120-139);
  * cell formatting (xlsx_converter.py:154-167): integral floats render
    as ints; booleans via shared-string-free 'b' cells render TRUE/FALSE;
  * O5: rows per sheet capped at ``XLSX_MAX_ROWS`` = 10000 (reference
    core/config.py:57 CONVERTER_XLSX_MAX_ROWS).

Documented divergences (codec-free environment): embedded images are
base64 data-URIs of the ORIGINAL bytes (the reference re-encodes/resizes
via PIL, file_utils.py:38-75 — see ops/multimodal.py for the budget
arithmetic against a stand-in codec); date-styled XLSX cells render as
their raw serial numbers (style-table date detection needs openpyxl).
"""

from __future__ import annotations

import base64
import re
import zipfile
from io import BytesIO
from xml.etree import ElementTree as ET

from .convert import DocumentElement, DocumentStructure, ElementType

W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
CP = "{http://schemas.openxmlformats.org/package/2006/metadata/core-properties}"
DC = "{http://purl.org/dc/elements/1.1/}"
DCT = "{http://purl.org/dc/terms/}"
REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"
S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

XLSX_MAX_ROWS = 10000  # reference core/config.py:57

_ORDERED_RE = re.compile(r"^\d+\.?\s")


# ---------------------------------------------------------------------------
# DOCX
# ---------------------------------------------------------------------------

def _style_names(zf: zipfile.ZipFile) -> dict[str, str]:
    """styleId → display name from word/styles.xml (python-docx resolves
    names; the reference matches on the display name)."""
    out: dict[str, str] = {}
    try:
        root = ET.fromstring(zf.read("word/styles.xml"))
    except KeyError:
        return out
    for st in root.findall(f"{W}style"):
        sid = st.get(f"{W}styleId")
        name_el = st.find(f"{W}name")
        if sid:
            out[sid] = name_el.get(f"{W}val") if name_el is not None else sid
    return out


def _para_text(p: ET.Element) -> str:
    return "".join(t.text or "" for t in p.iter(f"{W}t"))


def _flag_on(rpr: "ET.Element | None", tag: str) -> bool:
    if rpr is None:
        return False
    el = rpr.find(f"{W}{tag}")
    if el is None:
        return False
    return el.get(f"{W}val", "true").lower() not in ("0", "false", "none")


class _DocxState:
    """The reference's mutable list-building state (docx_converter.py:28-31,
    246-288) — deliberately including its flush quirks."""

    def __init__(self, structure: DocumentStructure) -> None:
        self.structure = structure
        self.current_list_id: "str | None" = None
        self.list_stack: list[dict] = []

    def close_current_list(self) -> None:
        if self.list_stack:
            for info in self.list_stack:
                self.structure.add_element(DocumentElement(
                    type=ElementType.LIST, content=info["items"],
                    metadata={"ordered": info["ordered"],
                              "level": info["level"]}))
            self.list_stack = []
            self.current_list_id = None

    def handle_item(self, text: str, list_id: str, level: int,
                    is_ordered: bool) -> None:
        if self.current_list_id != list_id:
            self.close_current_list()
            self.current_list_id = list_id
            self.list_stack = []
        while self.list_stack and self.list_stack[-1]["level"] >= level:
            self.list_stack.pop()
        if not self.list_stack or self.list_stack[-1]["level"] < level:
            self.list_stack.append({"level": level, "ordered": is_ordered,
                                    "items": []})
        self.list_stack[-1]["items"].append(text.strip())


def convert_docx(content: bytes) -> tuple[str, dict]:
    zf = zipfile.ZipFile(BytesIO(content))
    body_xml = zf.read("word/document.xml")
    root = ET.fromstring(body_xml)
    body = root.find(f"{W}body")
    styles = _style_names(zf)
    structure = DocumentStructure()
    state = _DocxState(structure)
    tables_count = 0
    equations_count = 0
    images_count = 0

    _add_docx_metadata(zf, structure)

    for element in (body if body is not None else []):
        if element.tag == f"{W}p":
            # reference counts equations by the literal substring 'math'
            # in the paragraph's XML (docx_converter.py:59-60)
            if b"math" in ET.tostring(element):
                equations_count += 1
            _process_docx_paragraph(element, styles, structure, state)
        elif element.tag == f"{W}tbl":
            _process_docx_table(element, structure, state)
            tables_count += 1

    images_count = _process_docx_images(zf, root, structure)
    # NOTE: no final close_current_list() — reference parity (a document
    # ending in a list drops it; docx_converter.py:55-73)

    markdown = structure.to_markdown()
    meta = {
        "pages": len(root.findall(f".//{W}sectPr")),
        "tables_count": tables_count,
        "equations_count": equations_count,
        "images_count": images_count,
    }
    return markdown, meta


def _add_docx_metadata(zf: zipfile.ZipFile,
                       structure: DocumentStructure) -> None:
    try:
        core = ET.fromstring(zf.read("docProps/core.xml"))
    except KeyError:
        return
    fields = {
        "title": core.findtext(f"{DC}title"),
        "author": core.findtext(f"{DC}creator"),
        "comments": core.findtext(f"{DC}description"),
        "category": core.findtext(f"{CP}category"),
        "created": core.findtext(f"{DCT}created"),
        "modified": core.findtext(f"{DCT}modified"),
        "last_modified_by": core.findtext(f"{CP}lastModifiedBy"),
        "revision": core.findtext(f"{CP}revision"),
        "keywords": core.findtext(f"{CP}keywords"),
        "subject": core.findtext(f"{DC}subject"),
    }
    fields = {k: v for k, v in fields.items() if v is not None}
    if fields:
        structure.add_element(DocumentElement(
            type=ElementType.METADATA, content=fields,
            metadata={"source": "document_properties"}))


def _process_docx_paragraph(p: ET.Element, styles: dict[str, str],
                            structure: DocumentStructure,
                            state: _DocxState) -> None:
    text = _para_text(p)
    if not text.strip():
        return  # does NOT flush lists (reference parity)

    ppr = p.find(f"{W}pPr")
    style_id = None
    if ppr is not None:
        pstyle = ppr.find(f"{W}pStyle")
        if pstyle is not None:
            style_id = pstyle.get(f"{W}val")
    style_name = styles.get(style_id, style_id) if style_id else "Normal"

    if style_name and style_name.startswith("Heading"):
        try:
            level = int(style_name[-1])
            structure.add_element(DocumentElement(
                type=ElementType.HEADING, content=text, level=level,
                metadata={"name": style_name}))
            return  # heading does NOT flush lists (reference parity)
        except ValueError:
            pass

    num_pr = ppr.find(f"{W}numPr") if ppr is not None else None
    if num_pr is not None:
        ilvl = num_pr.find(f"{W}ilvl")
        num_id = num_pr.find(f"{W}numId")
        if ilvl is not None and num_id is not None:
            state.handle_item(
                text, num_id.get(f"{W}val"), int(ilvl.get(f"{W}val", "0")),
                bool(_ORDERED_RE.match(text.strip())))
            return

    # regular paragraph: flush lists, then wrap runs bold→italic→underline
    state.close_current_list()
    parts: list[str] = []
    for run in p.findall(f"{W}r"):
        rtext = "".join(t.text or "" for t in run.findall(f"{W}t"))
        if not rtext.strip():
            continue
        rpr = run.find(f"{W}rPr")
        if _flag_on(rpr, "b"):
            rtext = f"**{rtext}**"
        if _flag_on(rpr, "i"):
            rtext = f"*{rtext}*"
        if _flag_on(rpr, "u"):
            rtext = f"__{rtext}__"
        parts.append(rtext)
    if parts:
        structure.add_element(DocumentElement(
            type=ElementType.PARAGRAPH, content="".join(parts),
            metadata={"name": style_name}))


def _process_docx_table(tbl: ET.Element, structure: DocumentStructure,
                        state: _DocxState) -> None:
    # reference parity: tables do NOT flush open lists
    rows: list[list[str]] = []
    for tr in tbl.findall(f"{W}tr"):
        row = []
        for tc in tr.findall(f"{W}tc"):
            cell_paras = [_para_text(p).strip() for p in tc.findall(f"{W}p")]
            row.append(" ".join(t for t in cell_paras if t))
        rows.append(row)
    if rows:
        structure.add_element(DocumentElement(
            type=ElementType.TABLE, content=rows,
            metadata={"has_header": True}))


def _process_docx_images(zf: zipfile.ZipFile, root: ET.Element,
                         structure: DocumentStructure) -> int:
    """Embedded pictures → IMAGE elements with base64 data URIs of the
    original bytes (re-encode path needs a codec; see module docstring)."""
    try:
        rels = ET.fromstring(zf.read("word/_rels/document.xml.rels"))
    except KeyError:
        return 0
    targets = {rel.get("Id"): rel.get("Target")
               for rel in rels.findall(f"{REL}Relationship")}
    count = 0
    for blip in root.iter(f"{A}blip"):
        rid = blip.get(f"{R}embed")
        target = targets.get(rid)
        if not target:
            continue
        name = "word/" + target.lstrip("/")
        try:
            data = zf.read(name)
        except KeyError:
            continue
        count += 1
        ext = target.rsplit(".", 1)[-1].lower()
        mime = {"png": "image/png", "jpg": "image/jpeg",
                "jpeg": "image/jpeg", "gif": "image/gif"}.get(ext, "image/png")
        uri = f"data:{mime};base64,{base64.b64encode(data).decode()}"
        structure.add_element(DocumentElement(
            type=ElementType.IMAGE, content=uri,
            metadata={"alt": f"Image {count}", "image_number": count}))
    return count


# ---------------------------------------------------------------------------
# XLSX
# ---------------------------------------------------------------------------

_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'→0, 'B'→1, ..., 'AA'→26."""
    m = _CELL_REF_RE.match(ref or "")
    if not m:
        return 0
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _format_cell_value(value) -> str:
    """xlsx_converter.py:154-167."""
    if value is None:
        return ""
    if isinstance(value, float) and value.is_integer():
        return str(int(value))
    if isinstance(value, bool):
        return str(value)
    return str(value)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall(f"{S}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{S}t")))
    return out


def convert_xlsx(content: bytes, max_rows: int = XLSX_MAX_ROWS) -> tuple[str, dict]:
    zf = zipfile.ZipFile(BytesIO(content))
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    targets = {rel.get("Id"): rel.get("Target")
               for rel in rels.findall(f"{REL}Relationship")}
    shared = _shared_strings(zf)
    structure = DocumentStructure()
    total_tables = 0
    sheet_names: list[str] = []

    for sheet in wb.find(f"{S}sheets") or []:
        name = sheet.get("name")
        rid = sheet.get(f"{R}id")
        sheet_names.append(name)
        target = targets.get(rid)
        if not target:
            continue
        path = "xl/" + target.lstrip("/")
        try:
            ws = ET.fromstring(zf.read(path))
        except KeyError:
            continue
        table = _process_xlsx_sheet(ws, shared, max_rows)
        if table:
            structure.add_element(DocumentElement(
                type=ElementType.HEADING, content=f"Sheet: {name}",
                metadata={"sheet_name": name}, level=2))
            structure.add_element(DocumentElement(
                type=ElementType.TABLE, content=table,
                metadata={"has_headers": True,
                          "align": ["left"] * len(table[0]),
                          "sheet": name}))
            total_tables += 1

    markdown = structure.to_markdown()
    meta = {"pages": len(sheet_names), "tables_count": total_tables,
            "images_count": 0, "equations_count": 0}
    return markdown, meta


def _cell_value(c: ET.Element, shared: list[str]):
    ctype = c.get("t", "n")
    if ctype == "inlineStr":
        is_el = c.find(f"{S}is")
        return "".join(t.text or "" for t in is_el.iter(f"{S}t")) \
            if is_el is not None else None
    v = c.findtext(f"{S}v")
    if v is None:
        return None
    if ctype == "s":
        try:
            return shared[int(v)]
        except (ValueError, IndexError):
            return None
    if ctype == "str":
        return v
    if ctype == "b":
        return v == "1"
    # numeric: int when integral (reference renders integral floats as ints)
    try:
        f = float(v)
    except ValueError:
        return v
    return f


def _process_xlsx_sheet(ws: ET.Element, shared: list[str],
                        max_rows: int) -> list[list[str]]:
    """xlsx_converter.py:118-139 row loop + the O5 per-sheet row cap."""
    data = ws.find(f"{S}sheetData")
    if data is None:
        return []
    table: list[list[str]] = []
    max_cols = 0
    n_rows = 0
    for row in data.findall(f"{S}row"):
        if n_rows >= max_rows:
            break  # O5: CONVERTER_XLSX_MAX_ROWS cap
        cells: dict[int, object] = {}
        for c in row.findall(f"{S}c"):
            val = _cell_value(c, shared)
            if val is not None:
                cells[_col_index(c.get("r", ""))] = val
        if not cells:
            continue
        n_rows += 1
        width = max(cells) + 1
        expanded = [cells.get(i) for i in range(width)]
        while expanded and expanded[-1] is None:
            expanded.pop()
        if expanded:
            max_cols = max(max_cols, len(expanded))
            table.append([_format_cell_value(v) for v in expanded])
    for row in table:
        while len(row) < max_cols:
            row.append("")
    return table
