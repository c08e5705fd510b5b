"""End-to-end training-shard builder: documents → token-id sequences.

The composition every LLM data pipeline ships: train BPE on the corpus
(one distributed pass + incremental driver training, ops/bpe.py), encode
every document to subword ids, greedily pack the id streams into
token-budgeted sequences within doc-id shards (ops/textstats.py
pack_sequences semantics), and write one parquet partition per shard —
so a failed run re-emits only unfinished shards and two runs produce
byte-identical shard contents (everything downstream of the corpus is
deterministic).

Each component is independently oracle-checked (`text_bpe_encode`,
`text_pack_sequences`); this module is the glue and is pinned by a
composition test (total tokens conserved, budget invariant, determinism,
shard layout).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .bpe import (_WS_SPLIT_RE, _apply_merges, bpe_train_incremental,
                  build_vocab_ids, distributed_word_counts)


def encode_ids(ds, merges, vocab_ids, id_col: str = "doc_id",
               text_col: str = "text", shard_size: int = 512):
    """(doc_id, shard, n_tokens, token_ids: list<int64>) — the id-list
    sibling of bpe.bpe_encode (which emits csv for the SQL compare)."""
    import ray

    ranks = {p: i for i, p in enumerate(merges)}
    ref = ray.put((ranks, vocab_ids))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        r, vids = ray.get(ref)
        memo: dict[str, list[int]] = {}
        out_ids = []
        n_tok = []
        for t in batch[text_col].fillna(""):
            t = t.strip()
            ws = _WS_SPLIT_RE.split(t) if t else []
            ids: list[int] = []
            for w in ws:
                got = memo.get(w)
                if got is None:
                    got = [vids.get(s, -1) for s in _apply_merges(w, r)]
                    memo[w] = got
                ids.extend(got)
            out_ids.append(np.asarray(ids, dtype=np.int64))
            n_tok.append(len(ids))
        d = batch[id_col].astype("int64")
        return pd.DataFrame({
            id_col: d, "shard": d // shard_size,
            "n_tokens": pd.Series(n_tok, dtype="int64"),
            "token_ids": out_ids})

    return ds.map_batches(f, batch_format="pandas")


def pack_id_sequences(encoded, max_tokens: int = 1024,
                      id_col: str = "doc_id", n_parts: int = 32):
    """Greedy first-fit of encoded docs into sequences within their
    shard (same fold as textstats.pack_sequences, here carrying the
    actual ids): one row per SEQUENCE — (shard, seq_local, n_docs,
    n_tokens, token_ids) with the member docs' ids concatenated in
    doc_id order."""
    from .agg import partitioned_map_partitions

    def pack(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for shard, g in part.groupby("shard", sort=False):
            g = g.sort_values(id_col)
            cur_ids: list = []
            cur_docs = 0
            seq = 0
            fill = 0
            first = True

            def emit():
                rows.append((int(shard), seq, cur_docs, fill,
                             np.concatenate(cur_ids) if cur_ids
                             else np.empty(0, dtype=np.int64)))

            for ids, n in zip(g["token_ids"], g["n_tokens"]):
                n = int(n)
                if first:
                    cur_ids, cur_docs, fill, first = [ids], 1, n, False
                elif fill + n <= max_tokens:
                    cur_ids.append(ids)
                    cur_docs += 1
                    fill += n
                else:
                    emit()
                    seq += 1
                    cur_ids, cur_docs, fill = [ids], 1, n
            if not first:
                emit()
        return pd.DataFrame(rows, columns=["shard", "seq_local", "n_docs",
                                           "n_tokens", "token_ids"])

    return partitioned_map_partitions(encoded, ["shard"], pack,
                                      n_parts=n_parts)


def build_training_shards(ds, out_dir: str, num_merges: int = 200,
                          max_tokens: int = 1024, shard_size: int = 512,
                          vocab_top_k: int = 1_000_000,
                          n_parts: int = 32) -> dict:
    """The full product: train → encode → pack → shard-partitioned
    parquet under ``out_dir`` (one ``shard=N`` directory each — the
    resumable-output convention). Returns the run manifest
    {merges, vocab_size, shards, sequences, tokens}."""
    wc = distributed_word_counts(ds, top_k=vocab_top_k)
    merges = bpe_train_incremental(wc, num_merges)
    vids = build_vocab_ids(wc, merges)
    enc = encode_ids(ds, merges, vids, shard_size=shard_size)
    packed = pack_id_sequences(enc, max_tokens=max_tokens,
                               n_parts=n_parts).materialize()
    n_seq = packed.count()
    tot = sum(int(b["n_tokens"].sum()) for b in
              packed.iter_batches(batch_size=None, batch_format="pandas"))
    shards = len(set().union(*[set(b["shard"].tolist()) for b in
                               packed.iter_batches(batch_size=None,
                                                   batch_format="pandas")]))
    packed.write_parquet(out_dir, partition_cols=["shard"])
    return {"merges": len(merges), "vocab_size": len(vids),
            "shards": shards, "sequences": n_seq, "tokens": tot}


def stratified_split_assign(ds, fractions=(0.8, 0.1, 0.1),
                            salt: str = "split0", id_col: str = "doc_id",
                            stratum_col: str = "lang",
                            n_buckets: int = 256) -> pd.DataFrame:
    """Deterministic stratified train/val/test assignment with EXACT
    per-stratum cut points — the split every training pipeline needs:
    within each stratum (language, source, quality tier) the docs whose
    stratum-rank r satisfies ``r·1000 < n·⌊f_train·1000⌋`` go to train
    (= ⌈f_train·n⌉ docs), the next band to val, the rest to test — an
    integer predicate both sides replay verbatim — and membership is a
    pure function of (salt, id) so re-runs,
    re-partitions and incremental corpus versions agree on every doc
    they share a stratum-rank for.

    Distributed shape (grouped global ranking — the
    :func:`raycrawl.ops.relational.deterministic_shuffle_rank` offset
    trick, keyed per stratum): each doc hashes to
    hv = first-64-bits of md5(salt‖id); hv's top byte range-buckets the
    stratum, a driver table of (stratum, bucket) counts — bounded by
    |strata|·n_buckets, never corpus size — gives prefix offsets, and
    within-bucket (hv, id) argsorts finish the exact per-stratum rank
    WITHOUT co-locating any whole stratum on one worker (strata are
    few; a stratum is usually most of the corpus). Thresholds replay in
    integer floor arithmetic on both sides."""
    import hashlib as _hl

    import ray

    from .agg import partitioned_map_partitions

    f_train, f_val, _ = fractions
    tr_num = int(round(f_train * 1000))
    va_num = int(round((f_train + f_val) * 1000))

    def hashed(b: pd.DataFrame) -> pd.DataFrame:
        hv = np.fromiter(
            (int(_hl.md5(f"{salt}{k}".encode()).hexdigest()[:16], 16)
             for k in b[id_col]), dtype=np.uint64, count=len(b))
        return pd.DataFrame({
            id_col: b[id_col].astype("int64"),
            stratum_col: b[stratum_col],
            "__h": hv.view(np.int64),
            "__bucket": (hv >> np.uint64(56)).astype("int64")})

    hds = ds.map_batches(hashed, batch_format="pandas").materialize()

    counts: dict = {}
    for b in hds.iter_batches(batch_format="pandas", batch_size=None):
        if not len(b):
            continue
        part = (b.groupby([stratum_col, "__bucket"]).size())
        for (s, bk), c in part.items():
            counts[(s, int(bk))] = counts.get((s, int(bk)), 0) + int(c)
    strata = sorted({s for s, _ in counts})
    offsets: dict = {}
    totals: dict = {}
    for s in strata:
        run = 0
        for bk in range(n_buckets):
            c = counts.get((s, bk), 0)
            if c:
                offsets[(s, bk)] = run
            run += c
        totals[s] = run
    oref = ray.put((offsets, totals, tr_num, va_num))

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        offs, tots, trn, van = ray.get(oref)
        # rank order is (hv as uint64, id); a global (hv, id) sort also
        # orders every (stratum, bucket) group internally, and the
        # per-group cumcount below is interleaving-safe
        hu = g["__h"].to_numpy().view(np.uint64)
        order = np.lexsort((g[id_col].to_numpy(), hu))
        g = g.iloc[order]
        grp = g.groupby([stratum_col, "__bucket"], sort=False)
        local = grp.cumcount().to_numpy(np.int64)
        off = np.fromiter(
            (offs[(s, int(bk))] for s, bk in
             zip(g[stratum_col], g["__bucket"])),
            dtype=np.int64, count=len(g))
        n = np.fromiter((tots[s] for s in g[stratum_col]),
                        dtype=np.int64, count=len(g))
        r0 = off + local
        split = np.where(r0 * 1000 < n * trn, "train",
                         np.where(r0 * 1000 < n * van, "val", "test"))
        return pd.DataFrame({id_col: g[id_col].to_numpy(np.int64),
                             stratum_col: g[stratum_col].to_numpy(),
                             "split": split})

    out = partitioned_map_partitions(
        hds, [stratum_col, "__bucket"], rank_part,
        n_parts=min(64, n_buckets)).to_pandas()
    out[id_col] = out[id_col].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)
