"""Chunker tests (SURVEY.md C1-C3, including the reference quirks)."""

import os

import pyarrow.parquet as pq

from raycrawl.chunker import (
    ChunkStage,
    clean_markdown,
    semantic_chunk_markdown,
    sentence_chunk,
)
from raycrawl.gen_golden import GOLDEN_DIR


def test_headers_are_boundaries_and_dropped():
    md = "# Title\n\npara one\n\n## Sub\n\npara two"
    chunks = semantic_chunk_markdown(md)
    # truncated-header-handling quirk: header lines vanish, hierarchy empty
    contents = [c["content"] for c in chunks]
    assert contents == ["para one", "para two"]
    assert all(c["level"] == 0 and c["path"] == [] for c in chunks)


def test_blank_lines_do_not_flush():
    md = "# T\n\npara one\n\npara two"
    chunks = semantic_chunk_markdown(md)
    assert [c["content"] for c in chunks] == ["para one\n\npara two"]


def test_preamble_chunk():
    md = "intro line\nmore intro\n\n# First\n\nbody"
    chunks = semantic_chunk_markdown(md)
    assert chunks[0]["content"] == "intro line\nmore intro"
    assert chunks[1]["content"] == "body"


def test_no_header_document_yields_nothing():
    # reference quirk: without any "# "-containing line, everything stays in
    # the preamble buffer and is never flushed (semantic_chunker.py:47-49)
    assert semantic_chunk_markdown("just text\n\nmore text") == []


def test_code_chunk_with_language_and_bundling():
    md = "# T\n\nlead-in\n```python\nx = 1\n```\n\ntail"
    chunks = semantic_chunk_markdown(md)
    assert chunks[0]["type"] == "code"
    assert chunks[0]["code_language"] == "python"
    # lead-in text bundles into the code chunk (reference 52-73)
    assert "lead-in" in chunks[0]["content"]
    assert chunks[1]["content"] == "tail"


def test_type_heuristics():
    md = "# T\n\n- a\n- b"
    chunks = semantic_chunk_markdown(md)
    assert chunks[0]["type"] == "list"
    assert chunks[0]["has_lists"]
    # spaced pipe tables never contain "-|-" → classified "text" (quirk)
    md2 = "# T\n\n| A | B |\n| --- | --- |\n| 1 | 2 |"
    assert semantic_chunk_markdown(md2)[0]["type"] == "text"


def test_needs_merge_flag():
    md = "# T\n\nshort body"
    c = semantic_chunk_markdown(md, min_chunk_size=200)[0]
    assert c["needs_merge"] and not c["needs_split"]
    c2 = semantic_chunk_markdown("# T\n\n" + " ".join(["w"] * 1600),
                                 max_chunk_size=1500)[0]
    assert c2["needs_split"]


def test_clean_markdown_reference_quirk():
    # chunk_service.py:46 collapses ALL whitespace (newlines included)
    out = clean_markdown("# A\n\nline1\nline2")
    assert "\n" not in out
    assert out == "# A line1 line2"


def test_sentence_chunker_packs_and_overlaps():
    text = ". ".join(f"sentence number {i} has several words" for i in range(40)) + "."
    chunks = sentence_chunk(text, chunk_size=50, chunk_overlap=10)
    assert len(chunks) > 1
    assert all(c["word_count"] <= 60 for c in chunks)
    # overlap: consecutive chunks share trailing/leading sentences
    assert chunks[0]["content"].split(". ")[-1].rstrip(".") in chunks[1]["content"]


def test_chunk_stage_matches_golden():
    import pyarrow as pa

    golden = pq.read_table(os.path.join(GOLDEN_DIR, "expected_chunks.parquet"))
    md_golden = pq.read_table(os.path.join(GOLDEN_DIR, "expected_markdown.parquet"))
    stage = ChunkStage()
    out = stage(pa.table({
        "url": md_golden.column("url"),
        "markdown": md_golden.column("markdown").cast(pa.large_string()),
    }))
    got = out.select(["url", "position", "content", "chunk_type", "level",
                      "word_count"]).to_pylist()
    exp = golden.to_pylist()
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g == e
