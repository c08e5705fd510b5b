"""Native minimal PDF → markdown converter (SURVEY.md M23) — stdlib only
(zlib FlateDecode + content-stream text-operator scan); PyPDF2 is absent.

Behavioral spec is the reference PDF converter
(/root/reference/services/converters/converters/pdf_converter.py),
replicated on top of this module's own text extractor:

- per page: a level-2 ``Page N`` marker heading (pdf_converter.py:113-121);
- table sniffing over the page text with the reference's two regex
  patterns + cell splitting (pdf_converter.py:212-279);
- paragraph split on blank lines, heading/list heuristics and level rules
  (pdf_converter.py:281-447): numbered/ALL-CAPS/Chapter-Section patterns,
  list markers (bullets, numbers, letters, checkboxes, dashes), list-marker
  stripping, ordered detection from the first item;
- /Info metadata incl. the ``D:YYYYMMDDHHMMSS`` date conversion
  (pdf_converter.py:84-110);
- images: per-page XObject /Subtype /Image extraction (filter dispatch as
  pdf_converter.py:176-210) fed through the M26 KB-budget ``encode_image``
  (multimodal.py) into base64 data-URI IMAGE elements, reference metadata
  keys included (pdf_converter.py:145-160). FlateDecode images whose
  inflated payload is raw 8-bit pixels are re-encoded through the REAL
  stdlib PNG codec (ops/png.py); DCT/JPX streams use the declared
  deterministic stand-in (no JPEG codec offline). The budget/resize
  arithmetic and the data-URI shape are exact either way.

Text-extractor spec (this engine's PyPDF2-replacement, documented
contract): text-showing ops (Tj, ', ", TJ — numbers in TJ ignored) append
to the current line; Td/TD/T*/'/" start a new line; a Td/TD whose ty
descends more than ``PARA_DROP`` (20pt) emits a paragraph break (blank
line). Supports literal strings with octal/char escapes, hex strings, and
FlateDecode streams. Object resolution is a tolerant whole-file object
scan (no xref dependence), which also survives mildly damaged files.
"""

from __future__ import annotations

import re
import zlib
from datetime import datetime

from .convert import DocumentElement, DocumentStructure, ElementType
from .ops.multimodal import encode_image

PARA_DROP = 20.0

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_REF_RE = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)
_NUMREF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_INFO_ENTRY_RE = re.compile(rb"/(\w+)\s*\((.*?)(?<!\\)\)", re.DOTALL)


def _raw_stream(body: bytes) -> "bytes | None":
    """Raw stream payload of one object body. Sliced by /Length when
    present (a trailing 0x0D data byte would otherwise be eaten by the
    ``\\r?\\nendstream`` pattern — compressed streams hit this ~1/256 of
    the time); regex fallback for length-less damaged objects."""
    m = re.search(rb"stream\r?\n", body)
    if not m:
        return None
    start = m.end()
    lm = re.search(rb"/Length\s+(\d+)", body[: m.start()])
    if lm:
        n = int(lm.group(1))
        if start + n <= len(body):
            return body[start : start + n]
    em = _STREAM_RE.search(body)
    return em.group(1) if em else None


class _Pdf:
    def __init__(self, content: bytes) -> None:
        self.objects: dict[int, bytes] = {}
        for m in _OBJ_RE.finditer(content):
            self.objects[int(m.group(1))] = m.group(3)

    def dict_refs(self, body: bytes) -> dict[str, int]:
        return {k.decode(): int(v) for k, v in _REF_RE.findall(body)}

    def stream_of(self, body: bytes) -> bytes:
        data = _raw_stream(body)
        if data is None:
            return b""
        if b"/FlateDecode" in body.split(b"stream", 1)[0]:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                pass
        return data

    def page_nodes(self) -> list[bytes]:
        """Page object bodies in document order (walk Root→Pages→Kids)."""
        root_id = None
        for oid, body in self.objects.items():
            if b"/Type" in body and b"/Catalog" in body:
                root_id = oid
                break
        if root_id is None:
            return []
        pages_ref = self.dict_refs(self.objects[root_id]).get("Pages")
        out: list[bytes] = []

        def walk(oid: int) -> None:
            body = self.objects.get(oid, b"")
            if b"/Page" in body and b"/Pages" not in body:
                out.append(body)
                return
            km = _KIDS_RE.search(body)
            if km:
                for ref in _NUMREF_RE.findall(km.group(1)):
                    walk(int(ref))

        if pages_ref is not None:
            walk(pages_ref)
        return out

    def content_of(self, page_body: bytes) -> bytes:
        c = self.dict_refs(page_body).get("Contents")
        if c is None:
            return b""
        return self.stream_of(self.objects.get(c, b""))

    def pages(self) -> list[bytes]:
        """Page content streams in document order."""
        return [self.content_of(b) for b in self.page_nodes()]

    def page_image_objects(self, page_body: bytes) -> list[bytes]:
        """Resolved /XObject /Image bodies for one page (reference
        pdf_converter.py:123-133: per-page /Resources → /XObject walk).
        /Resources may be inline or an indirect ref."""
        src = page_body
        if b"/XObject" not in src:
            m = re.search(rb"/Resources\s+(\d+)\s+\d+\s+R", src)
            if not m:
                return []
            src = self.objects.get(int(m.group(1)), b"")
        xm = re.search(rb"/XObject\s*<<(.*?)>>", src, re.DOTALL)
        if not xm:
            return []
        out = []
        for oid in _NUMREF_RE.findall(xm.group(1)):
            body = self.objects.get(int(oid), b"")
            if b"/Subtype" in body and b"/Image" in body:
                out.append(body)
        return out

    def info(self) -> dict[str, str]:
        for body in self.objects.values():
            if b"/Title" in body or b"/Producer" in body or b"/Author" in body:
                if b"/Type" in body and b"/Page" in body:
                    continue
                entries = {}
                for k, v in _INFO_ENTRY_RE.findall(body):
                    entries[k.decode()] = _unescape_string(v).decode(
                        "latin-1", errors="replace")
                if entries:
                    return entries
        return {}


def _unescape_string(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i]
        if c == 0x5C and i + 1 < len(raw):  # backslash
            n = raw[i + 1 : i + 2]
            if n in (b"n", b"r", b"t", b"b", b"f"):
                out += {b"n": b"\n", b"r": b"\r", b"t": b"\t",
                        b"b": b"\b", b"f": b"\f"}[n]
                i += 2
            elif n in (b"(", b")", b"\\"):
                out += n
                i += 2
            elif n in b"01234567":
                # octal digits only — '\\8'/'\\9' are spec-invalid escapes
                # that tolerant parsers treat as literals, not ValueError
                j = i + 1
                digits = b""
                while (j < len(raw) and raw[j : j + 1] in
                       (b"0", b"1", b"2", b"3", b"4", b"5", b"6", b"7")
                       and len(digits) < 3):
                    digits += raw[j : j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
            else:
                i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out)


_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"      # literal string
    rb"|<[0-9A-Fa-f\s]*>"         # hex string
    rb"|\[|\]"
    rb"|[-+]?\d*\.?\d+"           # number
    rb"|/\w+"
    rb"|[A-Za-z'\"*]+")


def extract_page_text(stream: bytes) -> str:
    """The documented text-extractor contract (module docstring)."""
    lines: list[str] = [""]
    tokens = _TOKEN_RE.findall(stream)

    def show(raw: bytes) -> str:
        if raw.startswith(b"("):
            return _unescape_string(raw[1:-1]).decode("latin-1",
                                                      errors="replace")
        if raw.startswith(b"<"):
            hx = re.sub(rb"\s", b"", raw[1:-1])
            if len(hx) % 2:
                hx += b"0"
            return bytes.fromhex(hx.decode()).decode("latin-1",
                                                     errors="replace")
        return ""

    stack: list[bytes] = []
    in_array = False
    for tok in tokens:
        if tok == b"[":
            in_array = True
            continue
        if tok == b"]":
            in_array = False
            continue
        if tok.startswith((b"(", b"<")) :
            if in_array:
                lines[-1] += show(tok)  # TJ array element
            else:
                stack.append(tok)
            continue
        op = tok
        if op in (b"Tj",):
            if stack:
                lines[-1] += show(stack[-1])
            stack.clear()
        elif op in (b"'", b'"'):
            lines.append("")
            if stack:
                lines[-1] += show(stack[-1])
            stack.clear()
        elif op == b"TJ":
            stack.clear()  # array elements already appended
        elif op in (b"Td", b"TD"):
            # last two numbers on the stack are tx ty
            nums = [t for t in stack if re.fullmatch(rb"[-+]?\d*\.?\d+", t)]
            ty = float(nums[-1]) if nums else 0.0
            if lines[-1] != "" or len(lines) > 1:
                lines.append("")
                if ty <= -PARA_DROP:
                    lines.append("")
            stack.clear()
        elif op == b"T*":
            lines.append("")
            stack.clear()
        elif re.fullmatch(rb"[-+]?\d*\.?\d+", op):
            stack.append(op)
        elif op.startswith(b"/"):
            stack.append(op)
        else:
            stack.clear()
    return "\n".join(lines).strip("\n")


# ---------------------------------------------------------------------------
# reference heuristics (pdf_converter.py:281-447)
# ---------------------------------------------------------------------------

_IMG_FORMAT_MAP = {b"DCTDecode": "JPEG", b"JPXDecode": "JP2",
                   b"CCITTFaxDecode": "PNG", b"FlateDecode": "PNG"}


def _image_payload(body: bytes) -> "tuple[bytes, str] | None":
    """(decoded-or-raw bytes, format) per the reference's filter dispatch
    (pdf_converter.py:176-210): FlateDecode → inflated pixel data;
    DCT/JPX/CCITTFax → raw codec stream; missing/other filter → None
    (image skipped, matching the reference's exception→None path)."""
    fm = re.search(rb"/Filter\s*(?:\[\s*)?/(\w+)", body)
    if not fm:
        return None
    filt = fm.group(1)
    if filt not in _IMG_FORMAT_MAP:
        return None
    data = _raw_stream(body)
    if data is None:
        return None
    if filt == b"FlateDecode":
        try:
            data = zlib.decompress(data)
        except zlib.error:
            return None
    return data, _IMG_FORMAT_MAP[filt]


def _int_entry(body: bytes, key: bytes) -> "int | None":
    m = re.search(rb"/" + key + rb"\s+(\d+)", body)
    return int(m.group(1)) if m else None


_HEADING_PATTERNS = [r"^\d+[\.\)]\s", r"^[A-Z][^a-z]+$",
                     r"^(?:Chapter|Section|Part)\s+\d+", r"^\d+\.\d+\s"]
_LIST_PATTERNS = [r"^\s*[\-\*•]\s", r"^\s*\d+[\.\)]\s", r"^\s*[a-z][\.\)]\s",
                  r"^\s*\[[xX\s]\]", r"^\s*[-–—]\s"]
_TABLE_PATTERNS = [
    r"[\|\+][-\+]+[\|\+][\s\S]+?[\|\+][-\+]+[\|\+]",
    r"(\s{2,}\S+){3,}[\s\S]+?(\s{2,}\S+){3,}",
]


def _is_heading(text: str) -> bool:
    if len(text) > 100:
        return False
    text = text.strip()
    if not text or text[-1] in {".", "?", "!"}:
        return False
    return any(re.match(p, text) for p in _HEADING_PATTERNS)


def _heading_level(text: str) -> int:
    text = text.strip()
    if re.match(r"^(?:Chapter|Book)\s+\d+", text, re.I):
        return 1
    if re.match(r"^(?:Section|Part)\s+\d+", text, re.I):
        return 2
    if re.match(r"^\d+\.\d+\s", text):
        return 3
    if re.match(r"^\d+[\.\)]\s", text):
        return 3
    if text.isupper():
        return 2
    return 3


def _is_list_item(text: str) -> bool:
    text = text.strip()
    return bool(text) and any(re.match(p, text) for p in _LIST_PATTERNS)


def _parse_table_text(table_text: str) -> list[list[str]]:
    rows = []
    for line in table_text.split("\n"):
        if re.match(r"^[\|\+][-\+]+[\|\+]$", line):
            continue
        if "|" in line:
            cells = [c.strip() for c in line.split("|")]
            if cells and not cells[0]:
                cells = cells[1:]
            if cells and not cells[-1]:
                cells = cells[:-1]
        else:
            cells = [c.strip() for c in re.split(r"\s{2,}", line.strip())]
        if cells:
            rows.append(cells)
    return rows


def convert_pdf(content: bytes) -> tuple[str, dict]:
    pdf = _Pdf(content)
    structure = DocumentStructure()
    info = pdf.info()
    if info:
        meta_fields = dict(info)
        for key in ("CreationDate", "ModDate"):
            if key in meta_fields:
                try:
                    ds = meta_fields[key].strip("D:").split("+")[0]
                    meta_fields[key] = datetime.strptime(
                        ds, "%Y%m%d%H%M%S").isoformat()
                except (ValueError, AttributeError):
                    pass
        structure.add_element(DocumentElement(
            type=ElementType.METADATA, content=meta_fields,
            metadata={"source": "pdf_metadata"}))

    page_bodies = pdf.page_nodes()
    tables_found = 0
    images_found = 0
    image_counter = 0
    for page_num, page_body in enumerate(page_bodies, 1):
        structure.add_element(DocumentElement(
            type=ElementType.HEADING, content=f"Page {page_num}",
            metadata={"type": "page_marker", "page_number": page_num},
            level=2))

        # images first (reference order: images → tables → text,
        # pdf_converter.py:49-58); embedded via the M26 KB-budget encode
        for img_body in pdf.page_image_objects(page_body):
            payload = _image_payload(img_body)
            if payload is None:
                continue
            data, fmt = payload
            image_counter += 1
            width = _int_entry(img_body, b"Width")
            height = _int_entry(img_body, b"Height")
            cs = re.search(rb"/ColorSpace\s*/(\w+)", img_body)
            if (fmt == "PNG" and width and height and len(data) in
                    (width * height, width * height * 3,
                     width * height * 4)):
                # inflated FlateDecode payload IS raw 8-bit pixels →
                # REAL re-encode through the stdlib PNG codec (ops/png.py)
                from .ops.png import PngCodec, RawPixelDecoder
                encoded = encode_image(data, width, height, format=fmt,
                                       decoder=RawPixelDecoder(),
                                       codec=PngCodec())
            elif fmt == "JPEG":
                # DCTDecode stream IS a baseline JPEG → REAL decode +
                # re-encode through the stdlib codec (ops/jpeg.py, r4);
                # a width/height mismatch vs the image dict raises inside
                # the hook and yields None — the reference's
                # exception→None path (pdf_converter.py:176-210). Only
                # JPX/CCITTFax remain on the deterministic stand-in.
                from .ops.jpeg import JpegCodec, JpegDecoder
                encoded = encode_image(data, width, height, format=fmt,
                                       decoder=JpegDecoder(),
                                       codec=JpegCodec())
            else:
                encoded = encode_image(data, width or 16, height or 16,
                                       format=fmt)
            if encoded:
                structure.add_element(DocumentElement(
                    type=ElementType.IMAGE, content=encoded,
                    metadata={"page": page_num,
                              "image_number": image_counter,
                              "width": width, "height": height,
                              "bits": _int_entry(img_body,
                                                 b"BitsPerComponent"),
                              "color_space": cs.group(1).decode()
                              if cs else None,
                              "format": fmt}))
                images_found += 1

        stream = pdf.content_of(page_body)
        text = extract_page_text(stream)

        # table sniffing (reference order: tables first, then text flow)
        for pattern in _TABLE_PATTERNS:
            for match in re.finditer(pattern, text):
                rows = _parse_table_text(match.group())
                if rows and len(rows) > 1:
                    structure.add_element(DocumentElement(
                        type=ElementType.TABLE, content=rows,
                        metadata={"page": page_num, "has_header": True}))
                    tables_found += 1

        if not text.strip():
            continue
        current_list: list[str] = []

        def flush_list() -> None:
            nonlocal current_list
            if not current_list:
                return
            first = current_list[0].strip()
            is_ordered = bool(re.match(r"^\s*\d+[\.\)]\s", first))
            cleaned = []
            for item in current_list:
                if is_ordered:
                    item = re.sub(r"^\s*\d+[\.\)]\s*", "", item)
                else:
                    item = re.sub(r"^\s*(?:[\-\*•]|\[[xX\s]\]|[-–—])\s*", "",
                                  item)
                cleaned.append(item.strip())
            structure.add_element(DocumentElement(
                type=ElementType.LIST, content=cleaned,
                metadata={"ordered": is_ordered}))
            current_list = []

        for para in text.split("\n\n"):
            if not para.strip():
                continue
            if _is_heading(para):
                flush_list()
                structure.add_element(DocumentElement(
                    type=ElementType.HEADING, content=para.strip(),
                    level=_heading_level(para)))
            elif _is_list_item(para):
                current_list.append(para.strip())
            else:
                flush_list()
                structure.add_element(DocumentElement(
                    type=ElementType.PARAGRAPH, content=para.strip()))
        flush_list()

    markdown = structure.to_markdown()
    meta = {"pages": len(page_bodies), "tables_count": tables_found,
            "images_count": images_found, "equations_count": None}
    return markdown, meta
