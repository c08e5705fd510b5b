"""Oracle cache-key coverage (VERDICT r3 item 2).

The driver's crawl conformance oracle is materialized to Parquet under a
key derived from EVERY semantics source — the oracle/fixtures/extract/
gen_golden module bytes plus the polite/priority constants that live in
__ray_entry__ itself. A change to any of them must produce a different
cache directory (a miss), or the gate would silently compare the engine
against stale expected values. These tests mutate each input class and
observe the key change — without actually materializing the oracle (the
key is the directory path; materialization only happens on first use).
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod


def _key_of_dir() -> str:
    """Recompute the cache key exactly as _crawl_oracle_dir does, without
    materializing (we re-derive it from the same inputs)."""
    import raycrawl.extract
    import raycrawl.fixtures
    import raycrawl.gen_golden
    import raycrawl.oracle

    h = hashlib.sha1()
    for mod in (raycrawl.oracle, raycrawl.fixtures, raycrawl.extract,
                raycrawl.gen_golden):
        with open(mod.__file__, "rb") as f:
            h.update(f.read())
    h.update(repr((entrymod._POLITE_SEEDS,
                   sorted(entrymod._POLITE_KW.items()),
                   sorted(entrymod._PRIORITY_KW.items()))).encode())
    # builder version tag (r5: corpus_digest.parquet added to the outputs)
    h.update(b"oracle-v5:corpus_digest")
    return h.hexdigest()[:12]


def test_replica_key_matches_production_key():
    """The test-side key derivation must stay in lockstep with
    _crawl_oracle_dir — if this drifts the other tests prove nothing."""
    d = entrymod._crawl_oracle_dir()
    assert os.path.basename(d) == _key_of_dir()


def test_polite_constant_mutation_is_cache_miss(monkeypatch):
    base = _key_of_dir()
    monkeypatch.setattr(entrymod, "_POLITE_KW",
                        {**entrymod._POLITE_KW, "max_pages": 99999})
    assert _key_of_dir() != base
    # and through the real function: a different directory
    assert os.path.basename(entrymod._crawl_oracle_dir()) != base


def test_priority_constant_mutation_is_cache_miss(monkeypatch):
    base = _key_of_dir()
    monkeypatch.setattr(entrymod, "_PRIORITY_KW",
                        {**entrymod._PRIORITY_KW, "max_pages": 39})
    assert os.path.basename(entrymod._crawl_oracle_dir()) != base


def test_gen_golden_source_mutation_is_cache_miss(tmp_path, monkeypatch):
    """gen_golden.py carries SEED/T2/CRAWL_KW — editing it must miss.
    Simulated by pointing the module's __file__ at a copy with one byte
    appended (same technique works for oracle/fixtures/extract)."""
    import raycrawl.gen_golden as gg

    base = _key_of_dir()
    mutated = tmp_path / "gen_golden_mutant.py"
    with open(gg.__file__, "rb") as f:
        mutated.write_bytes(f.read() + b"\n# semantics change\n")
    monkeypatch.setattr(gg, "__file__", str(mutated))
    assert _key_of_dir() != base
    assert os.path.basename(entrymod._crawl_oracle_dir()) != base
