"""Converter subsystem tests (SURVEY.md M20-M27, S7)."""

import pyarrow as pa
import pytest

from raycrawl.convert import (
    ConvertStage,
    DocumentElement,
    DocumentStructure,
    ElementType,
    clean_text,
    format_list,
    format_table,
    get_converter,
    register_converter,
)


def test_clean_text_control_chars_and_whitespace():
    assert clean_text("a\x00b\x07c") == "a b c"
    assert clean_text("a\tb") == "a b"  # tab kept by filter, collapsed by \s
    assert clean_text("x\n\n\n\ny") == "x\n\ny"
    assert clean_text("  line  \n  two  ") == "line\ntwo"
    assert clean_text("") == ""


def test_format_table_padded():
    md = format_table([["Name", "N"], ["alpha", "1"], ["b|c", "22"]])
    lines = md.split("\n")
    assert lines[0] == "| Name  | N  |"
    assert lines[1] == "|:-----:|:--:|"
    assert lines[2] == "| alpha | 1  |"
    assert lines[3] == "| b\\|c  | 22 |"


def test_format_list_nesting_and_ordering():
    assert format_list(["a", "b"]) == "- a\n- b"
    assert format_list(["a", "b"], ordered=True) == "1. a\n2. b"
    assert format_list(["a"], level=2) == "        - a"


def test_document_structure_hierarchy():
    doc = DocumentStructure()
    doc.add_element(DocumentElement(ElementType.HEADING, "Top", level=1))
    doc.add_element(DocumentElement(ElementType.PARAGRAPH, "intro"))
    doc.add_element(DocumentElement(ElementType.HEADING, "Sub", level=2))
    doc.add_element(DocumentElement(ElementType.LIST, ["x", "y"]))
    doc.add_element(DocumentElement(ElementType.HEADING, "Top2", level=1))
    doc.add_element(DocumentElement(ElementType.CODE, "print(1)",
                                    metadata={"language": "python"}))
    md = doc.to_markdown()
    assert "# Top" in md and "## Sub" in md and "# Top2" in md
    assert md.index("# Top") < md.index("intro") < md.index("## Sub")
    assert "```python\nprint(1)\n```" in md
    # reference quirk (document_structure.py:87): each part is .strip()ed,
    # so the FIRST list item loses its nesting indent while later items
    # keep theirs ("    " * recursion-level)
    assert "- x\n        - y" in md


def test_document_structure_math_separator_image():
    doc = DocumentStructure()
    doc.add_element(DocumentElement(ElementType.MATH, "e=mc^2",
                                    metadata={"inline": True}))
    doc.add_element(DocumentElement(ElementType.SEPARATOR, ""))
    doc.add_element(DocumentElement(ElementType.IMAGE, "/img.png",
                                    metadata={"alt": "A"}))
    md = doc.to_markdown()
    assert "$e=mc^2$" in md and "---" in md and "![A](/img.png)" in md


def test_registry_dispatch_and_unknown():
    assert get_converter("txt") is not None
    with pytest.raises(Exception):
        get_converter("exe")
    register_converter("custom", lambda b: ("custom!", {}))
    assert get_converter("custom")(b"x")[0] == "custom!"


def test_pdf_converter_is_native_now():
    # PDF is a real native converter (convert_pdf.py); an object-less file
    # converts to empty markdown with zero pages rather than raising
    md, meta = get_converter("pdf")(b"%PDF-1.4")
    assert md == "" and meta["pages"] == 0


def test_convert_stage_batch():
    batch = pa.table({
        "path": ["/a/doc.txt", "/b/slide.pdf", "/c/empty.txt", "/d/notes.md"],
        "bytes": [b"hello\n\nworld", b"%PDF", b"", b"# Title\n\nbody"],
    })
    out = ConvertStage()(batch)
    rows = out.to_pylist()
    assert rows[0]["status"] == "ok" and "hello" in rows[0]["markdown"]
    assert rows[1]["status"] == "ok" and rows[1]["markdown"] == ""
    assert rows[2]["status"] == "error"
    assert rows[3]["status"] == "ok" and rows[3]["markdown"].startswith("# Title")


def test_convert_stage_over_ray_dataset(tmp_path):
    import ray
    import ray.data as rd

    for name, content in [("a.txt", b"alpha beta"), ("b.md", b"# H\n\ntext")]:
        (tmp_path / name).write_bytes(content)
    ds = rd.read_binary_files(str(tmp_path), include_paths=True)
    out = ds.map_batches(ConvertStage, batch_format="pyarrow", concurrency=1)
    rows = sorted(out.to_pandas().to_dict("records"), key=lambda r: r["path"])
    assert [r["status"] for r in rows] == ["ok", "ok"]


def test_filename_and_encoding_utils():
    from raycrawl.convert import detect_encoding, normalize_filename, safe_extension

    assert normalize_filename("a<b>:c?.txt") == "abc.txt"
    assert normalize_filename("///") == "unnamed_file"
    assert len(normalize_filename("x" * 300 + ".txt")) <= 255
    assert safe_extension("doc.PDF") == "pdf"
    assert safe_extension("noext", b"%PDF-1.7") == "pdf"
    assert safe_extension("noext", b"PK\x03\x04") == "zip"
    assert detect_encoding("héllo".encode("utf-8")) == "utf-8"
    assert detect_encoding(b"\xef\xbb\xbfabc") == "utf-8-sig"
    assert detect_encoding(b"\xff\xfea\x00") == "utf-16-le"
    assert detect_encoding(b"\xff\x00\xfe") == "latin-1"


def test_convert_stage_corrupt_office_files_become_error_rows():
    """Truncated/garbage zip containers and damaged PDFs must produce
    error rows (the endpoint's per-file error shape), never crash the
    actor or poison the batch."""
    import zlib

    from raycrawl.office_fixtures import build_docx, build_pdf, docx_paragraph

    good_docx = build_docx([docx_paragraph("ok")])
    good_pdf = build_pdf([["ok body."]], compress=True)
    batch = pa.table({
        "path": ["/a/trunc.docx", "/b/garbage.xlsx", "/c/trunc.pdf",
                 "/d/ok.docx", "/e/ok.pdf", "/f/badstream.pdf"],
        "bytes": [good_docx[: len(good_docx) // 2],      # truncated zip
                  b"\x00\x01notazip" * 10,               # garbage container
                  good_pdf[: 40],                        # header-only pdf
                  good_docx, good_pdf,
                  good_pdf.replace(b"/FlateDecode", b"/FlateDecodX")],
    })
    out = ConvertStage()(batch).to_pylist()
    by = {r["path"].split("/")[-1]: r for r in out}
    assert by["trunc.docx"]["status"] == "error"
    assert by["garbage.xlsx"]["status"] == "error"
    # damaged PDFs degrade gracefully (tolerant object scan): ok status,
    # possibly-empty markdown, never an exception
    assert by["trunc.pdf"]["status"] == "ok"
    assert by["badstream.pdf"]["status"] == "ok"
    assert by["ok.docx"]["status"] == "ok" and "ok" in by["ok.docx"]["markdown"]
    assert by["ok.pdf"]["status"] == "ok" and "ok body." in by["ok.pdf"]["markdown"]
