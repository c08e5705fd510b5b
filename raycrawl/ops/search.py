"""Full-text keyword search: BM25 top-k over the documents table.

Distributed shape (the inverted-index-free scoring pass used when the
query-term set is small):

1. **tf/dl stage** (``map_batches``): tokenize each document once
   (lowercased whitespace tokens, matching the DuckDB oracle's
   ``regexp_split_to_array`` + ``lower``) and emit one narrow row per doc:
   (id, dl, tf_<term>...). Only the q query-term frequencies leave the
   worker — the corpus text never moves again.
2. **corpus stats**: N (docs), L (total tokens) and per-term document
   frequencies come from one-row-per-batch partials summed on the driver
   (q+2 integers per batch — a few KB even at 10^6 batches).
3. **scoring stage** (``map_batches`` over the stage-1 output): the exact
   fixed-point BM25 variant below, then per-block top-k partials merged by
   a tiny driver reduce (same pattern as ``knn_bruteforce``).

Scoring is the Robertson/Sparck-Jones BM25 shape (k1 = 6/5, b = 3/4) with
two documented substitutions that make every score an exact integer both
here and in ANSI SQL (the repo's oracle discipline):

- the idf factor is the *rational* (N − df + ½)/(df + ½) =
  (2N − 2df + 1)/(2df + 1) without the logarithm (a monotone surrogate —
  log-free so no libm dependence; always positive);
- avgdl is integer-rounded once: avgdl = (2L + N) // (2N), and the whole
  per-(doc, term) contribution is evaluated as ONE floor division of
  cross-multiplied integers scaled by 10^6:

      floor( 10^6 · 44·tf·avgdl·(2N−2df+1)
             ────────────────────────────────── )
           (20·tf·avgdl + 6·avgdl + 18·dl)·(2df+1)

  (44/20, 6/20, 18/20 are k1+1, k1(1−b), k1·b over a common denominator.)

The numerator grows as O(tf · avgdl · N); Python integers are unbounded so
the scoring stage uses exact bigint arithmetic over the (sparse) rows with
at least one matching term — at production scale swap in the float64 kernel
(one vectorized expression of the same formula) and keep this path as its
oracle.
"""

from __future__ import annotations

import os
import re

import pandas as pd

_WS_SPLIT_RE = re.compile(r"\s+")

SCORE_SCALE = 10**6


def _term_contribution(tf: int, dl: int, avgdl: int, n_docs: int,
                       df: int) -> int:
    if tf == 0 or df == 0:
        return 0
    num = SCORE_SCALE * 44 * tf * avgdl * (2 * n_docs - 2 * df + 1)
    den = (20 * tf * avgdl + 6 * avgdl + 18 * dl) * (2 * df + 1)
    return num // den


def bm25_topk(ds, terms: list[str], k: int = 20, id_col: str = "doc_id",
              text_col: str = "text") -> pd.DataFrame:
    """Top-k documents for a bag-of-words query under the exact
    fixed-point BM25 variant above. Returns a small pandas DataFrame
    (id, score_fp, rank) ranked by (score_fp desc, id asc)."""
    terms = list(dict.fromkeys(terms))  # dedupe, keep order

    def tf_stage(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("")
        toks = texts.apply(
            lambda t: [w.lower() for w in _WS_SPLIT_RE.split(t.strip())]
            if t.strip() else [])
        out = {id_col: batch[id_col],
               "dl": toks.apply(len).astype("int64")}
        for j, term in enumerate(terms):
            out[f"tf_{j}"] = toks.apply(
                lambda ws, term=term: ws.count(term)).astype("int64")
        return pd.DataFrame(out)

    tf_cols = [f"tf_{j}" for j in range(len(terms))]
    # narrow (q+2 int columns) — materialized once so the stats pass and
    # the scoring pass don't re-tokenize the corpus
    tf_ds = ds.map_batches(tf_stage, batch_format="pandas").materialize()

    def stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        row = {"n_docs": [len(batch)], "total_len": [batch["dl"].sum()]}
        for c in tf_cols:
            row[f"df_{c}"] = [(batch[c] > 0).sum()]
        return pd.DataFrame(row).astype("int64")

    parts = tf_ds.map_batches(stats_partial, batch_format="pandas",
                              batch_size=65536).to_pandas()
    n_docs = int(parts["n_docs"].sum())
    total_len = int(parts["total_len"].sum())
    dfs = [int(parts[f"df_{c}"].sum()) for c in tf_cols]
    if n_docs == 0:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "score_fp": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="int64")})
    avgdl = (2 * total_len + n_docs) // (2 * n_docs)

    def score_partial(batch: pd.DataFrame) -> pd.DataFrame:
        mask = (batch[tf_cols].to_numpy() > 0).any(axis=1)
        cand = batch[mask]
        dl_a = cand["dl"].to_numpy()
        tf_a = [cand[c].to_numpy() for c in tf_cols]
        scores = [
            sum(_term_contribution(int(tf_a[j][i]), int(dl_a[i]),
                                   avgdl, n_docs, dfs[j])
                for j in range(len(terms)))
            for i in range(len(cand))  # sparse: only rows with a match;
        ]                              # bigint-exact, see module docstring
        out = pd.DataFrame({id_col: cand[id_col].to_numpy(),
                            "score_fp": pd.Series(scores, dtype="int64")})
        # per-block top-k partial: only k rows per block reach the driver
        return out.sort_values(["score_fp", id_col],
                               ascending=[False, True]).head(k)

    partials = tf_ds.map_batches(score_partial,
                                 batch_format="pandas").to_pandas()
    top = partials.sort_values(["score_fp", id_col],
                               ascending=[False, True]).head(k)
    top = top.reset_index(drop=True)
    top["rank"] = pd.Series(range(1, len(top) + 1), dtype="int64")
    return top


def _term_bucket(term: str, num_buckets: int) -> int:
    import hashlib

    return int.from_bytes(hashlib.md5(term.encode()).digest()[:8],
                          "big") % num_buckets


def build_text_index(ds, index_dir: str, num_buckets: int = 64,
                     id_col: str = "doc_id", text_col: str = "text",
                     cardinality_hint: "int | None" = None) -> None:
    """Stage an inverted text index as bucket-partitioned Parquet: one
    (term, doc_id, tf) posting row per distinct (doc, token), hive-
    partitioned by ``term_bucket = md5_64(term) % num_buckets`` so a
    keyword lookup reads ONLY its terms' partitions (the same real-IO-
    pruning shape as the IVF vector index — knn.py:build_ivf_index).

    This is the scale path for keyword search: ``bm25_topk`` broadcasts
    per-term stats (right for a handful of query terms), while the staged
    index serves arbitrary vocabularies with reads proportional to the
    queried buckets, not the corpus. Cached on disk behind a _DONE marker;
    built atomically via a staged temp dir + rename (raycrawl.staging) so
    concurrent builders never expose partial parquet."""
    from ..staging import atomic_build_dir, is_complete

    if is_complete(index_dir):
        return

    B = num_buckets

    def postings(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        terms, ids, tfs = [], [], []
        for did, t in zip(batch[id_col], batch[text_col].fillna("")):
            t = t.strip()
            if not t:
                continue
            for term, tf in Counter(w.lower() for w in t.split()).items():
                terms.append(term)
                ids.append(did)
                tfs.append(tf)
        out = pd.DataFrame({"term": pd.Series(terms, dtype="string"),
                            id_col: pd.Series(ids, dtype="int64"),
                            "tf": pd.Series(tfs, dtype="int64")})
        # hash each batch's UNIQUE terms once (corpus token reuse is high)
        uniq = {term: _term_bucket(term, B) for term in set(terms)}
        bucket = out["term"].map(uniq).astype("int32")
        out["term_bucket"] = bucket  # hive partition key (path-consumed)
        out["bucket"] = bucket       # duplicated as a data column
        return out

    n_rows = cardinality_hint if cardinality_hint is not None else ds.count()
    n_blocks = max(1, n_rows // 100_000 + 1)
    atomic_build_dir(
        index_dir,
        lambda tmp: ds.map_batches(postings, batch_format="pandas")
        .repartition(n_blocks)
        .write_parquet(tmp, partition_cols=["term_bucket"]))


def index_postings(index_dir: str, terms: list[str],
                   num_buckets: int = 64):
    """Read the postings of ``terms`` from a staged text index, touching
    only the partitions their hash buckets live in. Returns a Dataset of
    (term, doc_id, tf)."""
    import glob

    import pyarrow.compute as pc
    import ray.data as rd

    buckets = sorted({_term_bucket(t, num_buckets) for t in terms})
    files: list[str] = []
    for b in buckets:
        files.extend(sorted(glob.glob(
            os.path.join(index_dir, f"term_bucket={b}", "*.parquet"))))
    if not files:
        import pyarrow as pa

        return rd.from_arrow(pa.table({
            "term": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64())}))
    import pyarrow as pa

    tset = pa.array(sorted(set(terms)), pa.string())

    def pick(batch):
        return batch.filter(pc.is_in(batch.column("term"), tset))

    return (rd.read_parquet(files)
            .map_batches(pick, batch_format="pyarrow")
            .select_columns(["term", "doc_id", "tf"]))


def tfidf_top_terms(ds, *, k: int = 3, id_col: str = "doc_id",
                    text_col: str = "text", vocab_top_k: int = 1_000_000,
                    scale: int = SCORE_SCALE) -> "object":
    """Per-document TF-IDF top-k terms — the classic keyword/topic-label
    signal a training-data pipeline attaches before sampling or routing
    (Salton & Buckley, 1988). Returns a Dataset of
    (id, rank, term, score_fp): for each document, its ``k``
    highest-TF-IDF distinct terms ranked by (score desc, term asc).

    Exact fixed-point integer scoring (the module's oracle discipline —
    log-free rational idf surrogate, same family as :func:`bm25_topk`):

        score_fp(term) = (scale · tf · (2N − 2df + 1)) // (dl · (2df + 1))

    where tf = term count in the doc, dl = doc token count, df = number
    of docs containing the term, N = number of docs with ≥1 token.
    (2N−2df+1)/(2df+1) is the monotone rational surrogate of the idf
    log; dividing by dl is the standard length normalization. Python-int
    exact on this side, HUGEINT-exact in ANSI SQL.

    Distributed shape: pass 1 computes df through the SAME bounded exact
    top-K machinery as the commonness scorers
    (textstats._bounded_topk_vocab — per-batch distinct-term partials →
    coarse-partition exact sums → capped broadcast dict, driver RSS
    O(n_parts × top_k) regardless of corpus size); N is a two-integer
    scalar aggregate. Pass 2 re-streams the corpus once, scoring each
    doc against the broadcast df table. Terms evicted past
    ``vocab_top_k`` score with df = 0 (maximum idf — the rare-term
    convention); below the cap — every benchmark scale — results are
    EXACT. Tokenization matches the textstats family (whitespace split
    of the stripped text, case-preserving)."""
    import ray

    from collections import Counter

    from .textstats import _WS_SPLIT_RE as _TOK_RE
    from .textstats import _bounded_topk_vocab

    def df_batch(batch: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in batch[text_col].fillna(""):
            t = t.strip()
            if t:
                c.update(set(_TOK_RE.split(t)))
        return pd.DataFrame({"w": list(c.keys()),
                             "cnt": pd.Series(list(c.values()),
                                              dtype="int64")})

    df_vocab = _bounded_topk_vocab(ds, df_batch, "w", vocab_top_k)

    def n_batch(batch: pd.DataFrame) -> pd.DataFrame:
        nn = int((batch[text_col].fillna("").str.strip() != "").sum())
        return pd.DataFrame({"n": pd.Series([nn], dtype="int64")})

    n_docs = sum(
        int(b["n"].sum()) for b in
        ds.map_batches(n_batch, batch_format="pandas")
          .iter_batches(batch_format="pandas", batch_size=None))
    dref = ray.put(df_vocab)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(dref)
        ids: list = []
        ranks: list[int] = []
        terms: list[str] = []
        scores: list[int] = []
        for did, t in zip(batch[id_col], batch[text_col].fillna("")):
            t = t.strip()
            if not t:
                continue
            toks = _TOK_RE.split(t)
            dl = len(toks)
            scored = sorted(
                (-((scale * tf * (2 * n_docs - 2 * v.get(w, 0) + 1))
                   // (dl * (2 * v.get(w, 0) + 1))), w)
                for w, tf in Counter(toks).items())
            for r, (neg, w) in enumerate(scored[:k], 1):
                ids.append(did)
                ranks.append(r)
                terms.append(w)
                scores.append(-neg)
        return pd.DataFrame({
            id_col: pd.Series(ids, dtype="int64"),
            "rank": pd.Series(ranks, dtype="int64"),
            "term": pd.Series(terms, dtype="string"),
            "score_fp": pd.Series(scores, dtype="int64")})

    return ds.map_batches(score, batch_format="pandas")
