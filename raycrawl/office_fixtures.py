"""Deterministic in-memory DOCX/XLSX builders (stdlib zipfile + string XML).

Produce byte-stable office files for golden converter tests and for the
``convert_docx`` oracle query (documents-table rows → .docx files whose
expected markdown is a closed-form function of the row). All zip entries
use a fixed timestamp so repeated builds are byte-identical.
"""

from __future__ import annotations

import zipfile
from io import BytesIO
from xml.sax.saxutils import escape

_TS = (1980, 1, 1, 0, 0, 0)

_W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'

_CONTENT_TYPES_DOCX = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
<Override PartName="/word/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.styles+xml"/>
<Override PartName="/docProps/core.xml" ContentType="application/vnd.openxmlformats-package.core-properties+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/package/2006/relationships/metadata/core-properties" Target="docProps/core.xml"/>
</Relationships>"""

_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:styles %s>
<w:style w:type="paragraph" w:styleId="Heading1"><w:name w:val="Heading 1"/></w:style>
<w:style w:type="paragraph" w:styleId="Heading2"><w:name w:val="Heading 2"/></w:style>
<w:style w:type="paragraph" w:styleId="Heading3"><w:name w:val="Heading 3"/></w:style>
</w:styles>""" % _W


def _run_xml(text: str, bold: bool = False, italic: bool = False,
             underline: bool = False) -> str:
    props = ""
    if bold or italic or underline:
        props = ("<w:rPr>" + ("<w:b/>" if bold else "")
                 + ("<w:i/>" if italic else "")
                 + ('<w:u w:val="single"/>' if underline else "") + "</w:rPr>")
    return (f'<w:r>{props}<w:t xml:space="preserve">{escape(text)}</w:t></w:r>')


def docx_paragraph(runs, style: "str | None" = None,
                   num_id: "str | None" = None, ilvl: int = 0) -> str:
    """runs: str or list of (text, bold, italic, underline) tuples."""
    if isinstance(runs, str):
        runs = [(runs, False, False, False)]
    ppr_bits = []
    if style:
        ppr_bits.append(f'<w:pStyle w:val="{style}"/>')
    if num_id is not None:
        ppr_bits.append(f'<w:numPr><w:ilvl w:val="{ilvl}"/>'
                        f'<w:numId w:val="{num_id}"/></w:numPr>')
    ppr = f"<w:pPr>{''.join(ppr_bits)}</w:pPr>" if ppr_bits else ""
    body = "".join(_run_xml(*r) for r in runs)
    return f"<w:p>{ppr}{body}</w:p>"


def docx_table(rows: list[list[str]]) -> str:
    trs = []
    for row in rows:
        tcs = "".join(
            f"<w:tc><w:p><w:r><w:t>{escape(cell)}</w:t></w:r></w:p></w:tc>"
            for cell in row)
        trs.append(f"<w:tr>{tcs}</w:tr>")
    return f"<w:tbl>{''.join(trs)}</w:tbl>"


def build_docx(body_elements: list[str], title: "str | None" = None,
               author: "str | None" = None) -> bytes:
    """body_elements: XML snippets from docx_paragraph()/docx_table()."""
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f"<w:document {_W}><w:body>{''.join(body_elements)}"
        "<w:sectPr/></w:body></w:document>")
    core_bits = []
    if title:
        core_bits.append(f"<dc:title>{escape(title)}</dc:title>")
    if author:
        core_bits.append(f"<dc:creator>{escape(author)}</dc:creator>")
    core = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<cp:coreProperties '
        'xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/" '
        'xmlns:dcterms="http://purl.org/dc/terms/">'
        f"{''.join(core_bits)}</cp:coreProperties>")
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in (
            ("[Content_Types].xml", _CONTENT_TYPES_DOCX),
            ("_rels/.rels", _ROOT_RELS),
            ("word/document.xml", document),
            ("word/styles.xml", _STYLES),
            ("docProps/core.xml", core),
        ):
            zi = zipfile.ZipInfo(name, date_time=_TS)
            zf.writestr(zi, data)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# XLSX
# ---------------------------------------------------------------------------

_CONTENT_TYPES_XLSX_TMPL = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
%s
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS_XLSX = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def build_xlsx(sheets: dict[str, list[list]]) -> bytes:
    """sheets: name → rows; cell values may be str/int/float/bool/None."""
    shared: list[str] = []
    shared_idx: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in shared_idx:
            shared_idx[s] = len(shared)
            shared.append(s)
        return shared_idx[s]

    sheet_xmls = []
    for rows in sheets.values():
        row_xml = []
        for r, row in enumerate(rows, start=1):
            cells = []
            for ci, val in enumerate(row):
                if val is None:
                    continue
                ref = f"{_col_letter(ci)}{r}"
                if isinstance(val, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
                elif isinstance(val, (int, float)):
                    cells.append(f'<c r="{ref}"><v>{val}</v></c>')
                else:
                    cells.append(f'<c r="{ref}" t="s"><v>{sref(str(val))}</v></c>')
            if cells:
                row_xml.append(f'<row r="{r}">{"".join(cells)}</row>')
        sheet_xmls.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<sheetData>{''.join(row_xml)}</sheetData></worksheet>")

    names = list(sheets)
    wb_sheets = "".join(
        f'<sheet name="{escape(n)}" sheetId="{i+1}" r:id="rId{i+1}"/>'
        for i, n in enumerate(names))
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>")
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i+1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i+1}.xml"/>' for i in range(len(names)))
        + f'<Relationship Id="rId{len(names)+1}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" '
        'Target="sharedStrings.xml"/></Relationships>')
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        f'count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f'<si><t xml:space="preserve">{escape(s)}</t></si>'
                  for s in shared) + "</sst>")
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i+1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(len(names)))

    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        entries = [
            ("[Content_Types].xml", _CONTENT_TYPES_XLSX_TMPL % overrides),
            ("_rels/.rels", _ROOT_RELS_XLSX),
            ("xl/workbook.xml", workbook),
            ("xl/_rels/workbook.xml.rels", wb_rels),
            ("xl/sharedStrings.xml", sst),
        ]
        for i in range(len(names)):
            entries.append((f"xl/worksheets/sheet{i+1}.xml", sheet_xmls[i]))
        for name, data in entries:
            zi = zipfile.ZipInfo(name, date_time=_TS)
            zf.writestr(zi, data)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# PDF (minimal classic-xref builder for convert_pdf golden tests)
# ---------------------------------------------------------------------------

def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(pages: list[list[str]], title: "str | None" = None,
              compress: bool = False,
              images: "dict[int, list[tuple[int, int, bytes, str]]] | None"
              = None) -> bytes:
    """pages: each page is a list of paragraph strings (internal newlines
    become in-paragraph line advances of -14pt; paragraphs separated by a
    -28pt advance, which convert_pdf's extractor maps to a blank line).

    images: optional {page_index: [(width, height, payload, filter), ...]}
    — each entry becomes an XObject /Image on that page ('FlateDecode'
    payloads are deflated into the file; 'DCTDecode'/'JPXDecode'/
    'CCITTFaxDecode' are stored raw, as real JPEG/JP2/fax streams are)."""
    import zlib as _zlib

    images = images or {}
    objs: list[bytes] = []

    def content_stream(paras: list[str]) -> bytes:
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        first = True
        for para in paras:
            for li, line in enumerate(para.split("\n")):
                if not first:
                    ops.append(f"0 {-28 if li == 0 else -14} Td")
                ops.append(f"({_pdf_escape(line)}) Tj")
                first = False
        ops.append("ET")
        return "\n".join(ops).encode("latin-1")

    # allocate object ids: 1 catalog, 2 pages, 3 font, then per page the
    # page object + its content stream + that page's image XObjects
    n_pages = len(pages)
    next_id = 4
    layout: list[tuple[int, int, list[int]]] = []
    for i in range(n_pages):
        pid, cid = next_id, next_id + 1
        next_id += 2
        img_ids = list(range(next_id, next_id + len(images.get(i, ()))))
        next_id += len(img_ids)
        layout.append((pid, cid, img_ids))
    kids = " ".join(f"{pid} 0 R" for pid, _, _ in layout)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")                 # 1
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
                .encode())                                            # 2
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")  # 3
    for i, paras in enumerate(pages):
        pid, cid, img_ids = layout[i]
        data = content_stream(paras)
        filt = b""
        if compress:
            data = _zlib.compress(data)
            filt = b" /Filter /FlateDecode"
        xobj = ""
        if img_ids:
            names = " ".join(f"/Im{j + 1} {oid} 0 R"
                             for j, oid in enumerate(img_ids))
            xobj = f" /XObject << {names} >>"
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /Contents {cid} 0 R "
            f"/Resources << /Font << /F1 3 0 R >>{xobj} >> "
            "/MediaBox [0 0 612 792] >>".encode())
        objs.append(b"<< /Length " + str(len(data)).encode() + filt
                    + b" >>\nstream\n" + data + b"\nendstream")
        for (w, h, payload, img_filt), oid in zip(images.get(i, ()), img_ids):
            body = _zlib.compress(payload) if img_filt == "FlateDecode" \
                else payload
            objs.append(
                f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
                f"/BitsPerComponent 8 /ColorSpace /DeviceRGB "
                f"/Filter /{img_filt} /Length {len(body)} >>".encode()
                + b"\nstream\n" + body + b"\nendstream")
    info_id = next_id
    info = "<< /Producer (raycrawl-fixtures)"
    if title:
        info += f" /Title ({_pdf_escape(title)})"
    info += " /CreationDate (D:20250101120000+00'00') >>"
    objs.append(info.encode())

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs)+1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs)+1} /Root 1 0 R /Info {info_id} 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)
