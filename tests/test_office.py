"""Golden tests for the native DOCX/XLSX converters (convert_office.py) —
byte-compare markdown against hand-derived expectations, including the
reference quirks the module docstring documents."""

import pandas as pd
import pytest

from raycrawl.convert import get_converter
from raycrawl.convert_office import XLSX_MAX_ROWS, convert_docx, convert_xlsx
from raycrawl.office_fixtures import (
    build_docx,
    build_xlsx,
    docx_paragraph,
    docx_table,
)


def test_docx_headings_paragraphs_runs():
    doc = build_docx([
        docx_paragraph("Intro before any heading"),
        docx_paragraph("Title", style="Heading1"),
        docx_paragraph([("plain ", False, False, False),
                        ("bold", True, False, False)]),
        docx_paragraph("Sub", style="Heading2"),
        docx_paragraph([("both", True, True, False)]),
        docx_paragraph([("under", False, False, True)]),
    ], title="T", author="A")
    md, meta = convert_docx(doc)
    assert md == ("Intro before any heading\n\n"
                  "# Title\n\n"
                  "plain **bold**\n\n"
                  "## Sub\n\n"
                  "***both***\n\n"
                  "__under__")
    assert meta["pages"] == 1 and meta["tables_count"] == 0


def test_docx_lists_reference_quirks():
    """Conformance quirks (docx_converter.py:246-288, replicated exactly):
    a same-level item POPS-AND-DISCARDS its predecessor (only 'item two'
    survives), and a trailing list is dropped entirely (no close at end of
    body)."""
    doc = build_docx([
        docx_paragraph("item one", num_id="1"),
        docx_paragraph("item two", num_id="1"),
        docx_paragraph("after list"),
        docx_paragraph("1. ordered a", num_id="2"),
        docx_paragraph("2. ordered b", num_id="2"),
    ])
    md, _ = convert_docx(doc)
    assert md == "- item two\n\nafter list"


def test_docx_ordered_detection_and_id_change_flush():
    doc = build_docx([
        docx_paragraph("1. first", num_id="5"),
        docx_paragraph("2. second", num_id="5"),  # pops '1. first' (quirk)
        docx_paragraph("bullet now", num_id="6"),  # id change flushes list 5
        docx_paragraph("end paragraph"),
    ])
    md, _ = convert_docx(doc)
    assert md == ("1. 2. second\n\n"
                  "- bullet now\n\n"
                  "end paragraph")


def test_docx_nested_list_levels():
    # increasing levels stack cleanly; the flush emits outer then inner
    doc = build_docx([
        docx_paragraph("outer", num_id="1", ilvl=0),
        docx_paragraph("inner", num_id="1", ilvl=1),
        docx_paragraph("done"),
    ])
    md, _ = convert_docx(doc)
    assert md == "- outer\n\n- inner\n\ndone"


def test_docx_table_and_counts():
    doc = build_docx([
        docx_paragraph("Heading", style="Heading1"),
        docx_table([["k", "v"], ["a", "1"], ["b", "2"]]),
    ])
    md, meta = convert_docx(doc)
    assert meta["tables_count"] == 1
    assert "| k | v |" in md
    assert "|:-|:-|" in md  # width-1 columns → single-dash left-align seps
    assert "| a | 1 |" in md


def test_docx_empty_paragraph_does_not_flush_list():
    doc = build_docx([
        docx_paragraph("item a", num_id="9"),
        docx_paragraph(""),                      # empty: no flush (quirk)
        docx_paragraph("item b", num_id="9"),    # same level: pops 'item a'
        docx_paragraph("flush now"),
    ])
    md, _ = convert_docx(doc)
    assert md == "- item b\n\nflush now"


def test_xlsx_sheets_values_and_padding():
    x = build_xlsx({
        "Data": [["name", "qty", "note"],
                 ["ant", 3, None],
                 ["bee", 2.5, "x"]],
        "Empty": [],
        "Mixed": [["only"], ["a", "b"]],
    })
    md, meta = convert_xlsx(x)
    assert meta["pages"] == 3 and meta["tables_count"] == 2
    assert "## Sheet: Data" in md and "## Sheet: Mixed" in md
    assert "Sheet: Empty" not in md
    # integral float renders as int; 2.5 stays; missing cell padded to ''
    assert "| ant  | 3   |      |" in md
    assert "| bee  | 2.5 | x    |" in md
    # ragged sheet padded to max width
    assert "| only |   |" in md


def test_xlsx_row_cap_o5():
    rows = [["h"]] + [[i] for i in range(30)]
    x = build_xlsx({"Big": rows})
    md, _ = convert_xlsx(x, max_rows=10)
    assert md.count("\n") >= 10
    body_rows = [ln for ln in md.splitlines() if ln.startswith("|")]
    # header line + separator + 9 data rows (cap counts the header row)
    assert len(body_rows) == 11
    assert XLSX_MAX_ROWS == 10000


def test_registry_dispatches_office_types():
    md, meta = get_converter("docx")(build_docx([docx_paragraph("hi")]))
    assert md == "hi"
    md2, _ = get_converter("xlsx")(build_xlsx({"S": [["a"]]}))
    assert md2.startswith("## Sheet: S")


def test_convert_stage_end_to_end_docx(tmp_path):
    import ray.data as rd

    from raycrawl.convert import ConvertStage

    for i in range(6):
        blob = build_docx([docx_paragraph(f"Doc {i}", style="Heading1"),
                           docx_paragraph(f"body text {i}")])
        (tmp_path / f"f{i}.docx").write_bytes(blob)
    ds = rd.read_binary_files(str(tmp_path), include_paths=True)
    out = ds.map_batches(ConvertStage, batch_format="pyarrow",
                         concurrency=2).to_pandas()
    assert len(out) == 6
    assert (out["status"] == "ok").all()
    assert out["markdown"].str.startswith("# Doc").all()


def test_pdf_text_pages_and_metadata():
    from raycrawl.convert_pdf import convert_pdf
    from raycrawl.office_fixtures import build_pdf

    pdf = build_pdf([
        ["SECTION ONE", "This is the first paragraph.",
         "line a\nline b of same paragraph"],
        ["- bullet one\n- bullet two", "closing text."],
    ], title="My Doc")
    md, meta = convert_pdf(pdf)
    assert meta["pages"] == 2
    assert "## Page 1" in md and "## Page 2" in md
    # ALL-CAPS short line → level-2 heading (reference heuristic)
    assert "## SECTION ONE" in md
    assert "This is the first paragraph." in md
    assert "line a\nline b of same paragraph" in md
    assert "closing text." in md


def test_pdf_list_detection_and_marker_stripping():
    from raycrawl.convert_pdf import convert_pdf
    from raycrawl.office_fixtures import build_pdf

    pdf = build_pdf([[
        "1. first item.",   # trailing '.' defeats the heading heuristic,
        "2. second item.",  # so these hit the list path (reference order:
        "- bullet x.",      # heading check BEFORE list check)
        "after the list.",
    ]])
    md, _ = convert_pdf(pdf)
    # ordered detected from the first item; ordered markers stripped, and
    # the bullet in the same run keeps its dash only stripped for unordered
    # list is a child of the Page heading → renderer indents nested items
    # (and the joiner's strip() eats the first item's indent)
    assert "1. first item.\n    2. second item.\n    3. - bullet x." in md
    assert "after the list." in md
    # bare numbered lines WITHOUT punctuation are headings (reference quirk)
    pdf2 = build_pdf([["1. first item", "tail."]])
    md2, _ = convert_pdf(pdf2)
    assert "### 1. first item" in md2


def test_pdf_flate_compressed_stream():
    from raycrawl.convert_pdf import convert_pdf
    from raycrawl.office_fixtures import build_pdf

    plain = build_pdf([["Chapter 1", "compressed body text here"]])
    comp = build_pdf([["Chapter 1", "compressed body text here"]],
                     compress=True)
    md_p, _ = convert_pdf(plain)
    md_c, _ = convert_pdf(comp)
    assert md_p == md_c
    assert "# Chapter 1" in md_p  # Chapter → level 1 (reference rule)


def test_pdf_escapes_and_info_date():
    from raycrawl.convert_pdf import convert_pdf
    from raycrawl.office_fixtures import build_pdf

    pdf = build_pdf([["parens (kept) and back\\slash ok."]], title="T(x)")
    md, meta = convert_pdf(pdf)
    assert "parens (kept) and back\\slash ok." in md
    assert meta["pages"] == 1


def test_pdf_registry_and_convert_stage(tmp_path):
    import ray.data as rd

    from raycrawl.convert import ConvertStage
    from raycrawl.office_fixtures import build_pdf

    for i in range(4):
        (tmp_path / f"p{i}.pdf").write_bytes(
            build_pdf([[f"Section {i}", f"body of document {i}."]],
                      compress=(i % 2 == 0)))
    ds = rd.read_binary_files(str(tmp_path), include_paths=True)
    out = ds.map_batches(ConvertStage, batch_format="pyarrow",
                         concurrency=2).to_pandas()
    assert (out["status"] == "ok").all()
    assert out["markdown"].str.contains("## Page 1").all()


def test_pdf_images_embedded_with_kb_budget():
    """M23 image path (VERDICT r2 item 3): XObject /Image streams →
    filter dispatch → M26 encode_image (KB-budget + base64 data-URI),
    reference metadata keys; images_count counts EMBEDDED images
    (pdf_converter.py:145-168). Since r4 the DCTDecode leg is the REAL
    codec: the embedded stream must BE a JPEG, and the emitted data-URI
    round-trips through jpeg_decode."""
    import base64

    import numpy as np

    from raycrawl.convert_pdf import convert_pdf
    from raycrawl.office_fixtures import build_pdf
    from raycrawl.ops.jpeg import jpeg_decode, jpeg_encode

    small = b"smallpix " * 100          # non-pixel FlateDecode → stand-in
    y, x = np.mgrid[0:48, 0:64]
    img = np.stack([((x + y) * 2) % 256, (x * 3) % 256, (y * 5) % 256],
                   -1).astype(np.uint8)
    jpg = jpeg_encode(img, quality=90)  # a REAL JPEG stream, under budget
    pdf = build_pdf(
        [["Page one body text."], ["Page two body text."]],
        images={0: [(40, 30, small, "FlateDecode")],
                1: [(64, 48, jpg, "DCTDecode")]})
    md, meta = convert_pdf(pdf)
    assert meta["pages"] == 2
    assert meta["images_count"] == 2
    assert "![Image](data:image/png;base64," in md
    assert "![Image](data:image/jpeg;base64," in md
    # images precede the page's text (reference order: images→tables→text)
    assert md.index("image/png") < md.index("Page one body text.")

    # the jpeg URI is a genuine re-encode of the decoded stream
    uri = next(ln for ln in md.split("\n") if "image/jpeg" in ln)
    payload = base64.b64decode(uri.split("base64,")[1].rstrip(")"))
    decoded = jpeg_decode(payload)
    assert decoded.shape == (48, 64, 3)
    assert np.abs(decoded.astype(int) - img.astype(int)).mean() < 6.0


def test_pdf_dct_garbage_stream_skipped():
    """A DCTDecode stream that is not a valid JPEG raises in the real
    decoder → encode_image returns None → image skipped, the reference's
    exception→None path. (The old fake codec happily 'decoded' garbage —
    the real codec is stricter AND more reference-faithful.)"""
    from raycrawl.convert_pdf import convert_pdf
    from raycrawl.office_fixtures import build_pdf

    pdf = build_pdf([["text survives."]],
                    images={0: [(1000, 800, b"bigpixels " * 1000,
                                 "DCTDecode")]})
    md, meta = convert_pdf(pdf)
    assert meta["images_count"] == 0
    assert "image/jpeg" not in md
    assert "text survives." in md


def test_pdf_image_unknown_filter_skipped():
    """Missing/unsupported /Filter → image skipped (reference
    _extract_image_data exception→None path), not an error row."""
    from raycrawl.convert_pdf import convert_pdf
    from raycrawl.office_fixtures import build_pdf

    pdf = build_pdf([["text stays."]],
                    images={0: [(8, 8, b"x" * 64, "LZWDecode")]})
    md, meta = convert_pdf(pdf)
    assert meta["images_count"] == 0
    assert "![Image]" not in md
    assert "text stays." in md


def test_pdf_flate_image_real_png_roundtrip():
    """FlateDecode image whose inflated payload is raw 8-bit RGB pixels
    → REAL stdlib PNG re-encode (ops/png.py): the embedded data-URI
    decodes back to the exact pixel array (under budget → no resize)."""
    import base64

    import numpy as np

    from raycrawl.convert_pdf import convert_pdf
    from raycrawl.office_fixtures import build_pdf
    from raycrawl.ops.png import png_decode

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(30, 40, 3), dtype=np.uint8)
    pdf = build_pdf([["Body text."]],
                    images={0: [(40, 30, img.tobytes(), "FlateDecode")]})
    md, meta = convert_pdf(pdf)
    assert meta["images_count"] == 1
    uri = next(ln for ln in md.split("\n") if "image/png" in ln)
    payload = base64.b64decode(uri.split("base64,")[1].rstrip(")"))
    decoded = png_decode(payload)
    assert decoded.shape == (30, 40, 3)
    assert (decoded == img).all()
