"""Blocked oracle SQL == brute-force SQL, value for value.

VERDICT r4 item 4 replaced the n²/2 cross-join DuckDB oracles with
shared-shingle / byte-band blocked forms (quadratic only in per-block
frequencies). Exactness arguments:

- Jaccard: a pair with j >= t > 0 shares >= 1 distinct 3-gram, and for
  distinct-gram sets |A∩B| IS the gram-join group count; the only
  qualifying zero-shared-gram pairs are empty×empty (j = 1.0 by the
  tot - inter = 0 convention), handled by an explicit branch.
- SimHash: hamming <= 6 over 64 bits leaves >= 2 of 8 bytes identical
  (pigeonhole), so every qualifying pair shares a (byte_idx, value)
  block; candidates are re-checked exactly.

This test pins the equivalence by running BOTH forms over the driver's
documents tables and comparing full sorted result sets.
"""

import os

import duckdb
import pytest

import __ray_entry__ as E

_BRUTE_J = (
    "WITH " + E._SH_CTE +
    "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
    "  len(list_intersect(a.s, b.s)) AS inter, len(a.s) + len(b.s) AS tot "
    "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id), "
    "j AS (SELECT id_a, id_b, CASE WHEN tot - inter = 0 THEN 1.0 "
    "  ELSE CAST(inter AS DOUBLE) / (tot - inter) END AS jaccard_sim FROM p) "
    "SELECT id_a, id_b, jaccard_sim FROM j WHERE jaccard_sim >= 0.5 "
    "ORDER BY 1, 2"
)

_BLOCKED_J = (
    "WITH " + E._BLOCKED_J_CTE +
    " SELECT id_a, id_b, jaccard_sim FROM j WHERE jaccard_sim >= 0.5 "
    "ORDER BY 1, 2"
)

_SIM_FP = (
    "WITH w AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] "
    "  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks FROM documents), "
    "t AS (SELECT doc_id, unnest(toks) AS tok FROM w), "
    "h AS (SELECT doc_id, ('0x'||substr(md5(tok),1,16))::UBIGINT AS hv FROM t), "
    "bit AS (SELECT doc_id, i, "
    "  sum(CASE WHEN (hv >> (63-i)) & 1::UBIGINT = 1::UBIGINT THEN 1 ELSE -1 END) AS vote "
    "  FROM h, (SELECT unnest(generate_series(0, 63)) AS i) bits "
    "  GROUP BY doc_id, i), "
    "fpu AS (SELECT doc_id, sum(CASE WHEN vote > 0 "
    "  THEN (1::HUGEINT << (63-i)) ELSE 0::HUGEINT END) AS ufp "
    "  FROM bit GROUP BY doc_id), "
    "fp AS (SELECT d.doc_id, COALESCE(f.ufp, 0::HUGEINT) AS u, "
    "  CAST(COALESCE(CASE WHEN f.ufp >= (1::HUGEINT << 63) "
    "  THEN f.ufp - (1::HUGEINT << 64) ELSE f.ufp END, 0) AS BIGINT) AS sh "
    "  FROM documents d LEFT JOIN fpu f ON d.doc_id = f.doc_id), "
)

_BRUTE_SIM = (
    _SIM_FP +
    "x AS (SELECT 1) "
    "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
    "CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming "
    "FROM fp a JOIN fp b ON a.doc_id < b.doc_id "
    "WHERE bit_count(xor(a.sh, b.sh)) <= 6 ORDER BY 1, 2"
)

_BLOCKED_SIM = (
    _SIM_FP +
    "by AS (SELECT doc_id, i, "
    "  CAST((u >> CAST(8*i AS INT)) & 255::HUGEINT AS INT) AS bv "
    "  FROM fp, (SELECT unnest(generate_series(0, 7)) AS i)), "
    "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
    "  FROM by a JOIN by b ON a.i = b.i AND a.bv = b.bv "
    "  AND a.doc_id < b.doc_id) "
    "SELECT c.id_a, c.id_b, "
    "CAST(bit_count(xor(fa.sh, fb.sh)) AS BIGINT) AS hamming "
    "FROM cand c JOIN fp fa ON fa.doc_id = c.id_a "
    "JOIN fp fb ON fb.doc_id = c.id_b "
    "WHERE bit_count(xor(fa.sh, fb.sh)) <= 6 ORDER BY 1, 2"
)


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_blocked_jaccard_equals_brute(sf):
    path = f"/root/testdata/sf{sf}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    assert con.execute(_BLOCKED_J).fetchall() == \
        con.execute(_BRUTE_J).fetchall()


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_blocked_simhash_equals_brute(sf):
    path = f"/root/testdata/sf{sf}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    blocked = con.execute(_BLOCKED_SIM).fetchall()
    assert blocked == con.execute(_BRUTE_SIM).fetchall()
    assert blocked, "fixture produced no simhash pairs — test is vacuous"


def test_blocked_jaccard_includes_empty_empty_pairs():
    """The blocking's one zero-shared-gram case: two blank docs have
    j = 1.0 by the tot - inter = 0 convention and MUST still pair."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, ''), (2, '  '), (3, 'a b c d')) AS t(doc_id, text)")
    rows = con.execute(_BLOCKED_J).fetchall()
    assert (1, 2, 1.0) in rows
