import pyarrow as pa
import pytest
import ray.data as rd

from raycrawl.fixtures import feature_corpus
from raycrawl.registry import StageSpec, apply_stage, get_stage, list_stages, register_stage


def test_builtin_stages_listed():
    assert {"extract", "chunk", "convert"} <= set(list_stages())


def test_unknown_stage_raises():
    with pytest.raises(KeyError):
        get_stage("nope")


def test_apply_stage_pipeline():
    t = feature_corpus(2, 8)
    ds = rd.from_arrow(t.select(["url", "warc_ts", "html"]))
    extracted = apply_stage(ds, "extract", concurrency=2)
    chunks = apply_stage(extracted.select_columns(["url", "markdown"]),
                         "chunk", concurrency=2)
    df = chunks.to_pandas()
    assert len(df) > 0
    assert "chunk_type" in df.columns


def test_register_custom_function_stage():
    def upper_title(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(batch.schema.get_field_index("url"),
                                "url", pc.utf8_upper(batch.column("url")))

    register_stage(StageSpec("upper", upper_title, "pyarrow", None))
    ds = rd.from_items([{"url": "abc"}])
    out = apply_stage(ds, "upper").to_pandas()
    assert out["url"][0] == "ABC"


def test_extract_full_page_mode():
    """only_main=False: boilerplate-stripped whole page (still no nav)."""
    t = feature_corpus(1, 4)
    ds = rd.from_arrow(t.select(["url", "warc_ts", "html"]))
    out = apply_stage(ds, "extract", concurrency=1, only_main=False).to_pandas()
    page = out[out["url"].str.endswith("p0.html")].iloc[0]
    # nav/header/footer boilerplate is still dropped by the cleaner
    assert "footer boilerplate" not in page["markdown"]
    assert "# Page 0 of host 0" in page["markdown"]


def test_queries_and_oracles_in_sync():
    """Every queries() entry must have a matching oracle_sql() entry (the
    driver's correctness gate compares them pairwise) and vice versa —
    drift here silently downgrades a query to the weaker rows-only check."""
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    entry = importlib.import_module("__ray_entry__")
    q = set(entry.queries().keys())
    o = set(entry.oracle_sql().keys())
    assert q == o, (q - o, o - q)
