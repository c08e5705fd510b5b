"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce``: exact top-k cosine — the query matrix is normalized
  once on the driver and ``ray.put`` (broadcast, not re-shipped per batch);
  every batch does ONE numpy matmul against it and emits per-batch top-k
  partials; a final tiny reduce merges partials into the global top-k. The
  dataset side streams — nothing but (query, candidate, sim) partials ever
  leaves a worker.
- ``knn_ivf``: the scale path — vectors staged once into a centroid-
  bucketed Parquet index (``build_ivf_index``); probe-time reads open only
  the probed bucket partitions (hive filter pushdown = real IO pruning),
  and the in-batch mask is one vectorized boolean matrix. nprobe == nlist
  is exact; recall at nprobe < nlist is checked against bruteforce in tests.

Ranking determinism: neighbors are ordered by (round(sim, 6) desc,
neighbor_id asc) so Ray and the DuckDB oracle agree despite float-sum
ordering differences.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def _matrix(series) -> np.ndarray:
    m = np.asarray([np.asarray(v, dtype=np.float64) for v in series])
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def knn_bruteforce(ds, query_ids: list[int], k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact top-k cosine neighbors for each query id (self excluded).
    Returns a pandas DataFrame (query_id, neighbor_id, rank) — small."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    qset = pa.array(sorted(query_ids), pa.int64())
    q_tbl = (
        ds.map_batches(lambda b: b.filter(pc.is_in(b.column(id_col), qset)),
                       batch_format="pyarrow")
        .select_columns([id_col, vec_col]).to_pandas()
    )
    q_ids = q_tbl[id_col].to_numpy()
    q_mat = _matrix(q_tbl[vec_col])
    ref = ray.put((q_ids, q_mat))

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qids, qmat = ray.get(ref)
        cand_ids = batch[id_col].to_numpy()
        cmat = _matrix(batch[vec_col])
        sims = qmat @ cmat.T  # (Q, B)
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        kk = min(k + 1, sims.shape[1])  # +1 slack for self
        for qi in range(len(qids)):
            idx = np.argpartition(-sims[qi], kk - 1)[:kk]
            for ci in idx:
                if cand_ids[ci] == qids[qi]:
                    continue
                rows["query_id"].append(qids[qi])
                rows["neighbor_id"].append(int(cand_ids[ci]))
                rows["sim"].append(float(sims[qi, ci]))
        return pd.DataFrame(rows)

    partials = ds.map_batches(partial_topk, batch_format="pandas",
                              batch_size=1024).to_pandas()
    out = {"query_id": [], "neighbor_id": [], "rank": []}
    for qid, grp in partials.groupby("query_id"):
        ranked = sorted(
            zip(grp["neighbor_id"], grp["sim"]),
            key=lambda t: (-round(t[1], 6), t[0]),
        )[:k]
        for r, (nid, _) in enumerate(ranked, start=1):
            out["query_id"].append(int(qid))
            out["neighbor_id"].append(int(nid))
            out["rank"].append(r)
    return pd.DataFrame(out).sort_values(["query_id", "rank"]).reset_index(drop=True)


def _kmeans(mat: np.ndarray, nlist: int, iters: int = 10,
            seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    centroids = mat[rng.choice(len(mat), size=min(nlist, len(mat)),
                               replace=False)]
    for _ in range(iters):
        sims = mat @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / max(np.linalg.norm(v), 1e-12)
    return centroids


def build_ivf_index(ds, index_dir: str, nlist: int = 16,
                    sample_size: int = 4096, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    cardinality_hint: "int | None" = None) -> np.ndarray:
    """Stage vectors into a bucket-partitioned Parquet IVF index: train a
    coarse quantizer on a sample (numpy Lloyd, seed-fixed), assign every
    vector to its nearest centroid inside ``map_batches``, and write
    hive-partitioned by ``ivf_bucket`` so probe-time reads touch only the
    probed partitions (true IO pruning, not post-hoc masking). Returns the
    centroid matrix; the index is cached on disk (_DONE marker)."""
    import json

    import ray.data as rd  # noqa: F401  (documents the dependency)

    from ..staging import atomic_build_dir, is_complete

    if is_complete(index_dir):
        with open(os.path.join(index_dir, "_centroids.json")) as f:
            return np.asarray(json.load(f), dtype=np.float64)

    sample = ds.limit(sample_size).select_columns([vec_col]).to_pandas()
    centroids = _kmeans(_matrix(sample[vec_col]), nlist)
    import ray

    cref = ray.put(centroids)  # broadcast once, read per actor task

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        cents = ray.get(cref)
        mat = _matrix(batch[vec_col])
        batch = batch[[id_col, vec_col]].copy()
        bucket = (mat @ cents.T).argmax(axis=1).astype("int32")
        batch["ivf_bucket"] = bucket   # hive partition key (consumed by path)
        batch["bucket"] = bucket       # duplicated as a data column (the
        # hive key is not part of the file schema, and filtering on it at
        # read time fails Ray's fragment sampling — probe reads prune by
        # partition PATH and use this column for the per-row mask)
        return batch

    # coalesce write tasks so each bucket partition gets a handful of
    # files, not one per upstream block (files = write-tasks × buckets).
    # cardinality_hint (e.g. parquet metadata row count) avoids the
    # ds.count() below, which for a transformed input would execute the
    # whole upstream pipeline an extra time (ADVICE r2)
    n_rows = cardinality_hint if cardinality_hint is not None else ds.count()
    n_blocks = max(1, n_rows // 100_000 + 1)

    def _build(tmp: str) -> None:
        ds.map_batches(assign, batch_format="pandas").repartition(
            n_blocks).write_parquet(tmp, partition_cols=["ivf_bucket"])
        with open(os.path.join(tmp, "_centroids.json"), "w") as f:
            json.dump(centroids.tolist(), f)

    atomic_build_dir(index_dir, _build)
    # a concurrent builder may have won the rename with its own sample's
    # centroids — return the installed index's, not this process's
    with open(os.path.join(index_dir, "_centroids.json")) as f:
        return np.asarray(json.load(f), dtype=np.float64)


def knn_ivf(ds, query_ids: list[int], k: int = 10, nlist: int = 16,
            nprobe: int = 4, sample_size: int = 4096,
            id_col: str = "vec_id", vec_col: str = "embedding",
            index_dir: "str | None" = None,
            cardinality_hint: "int | None" = None):
    """IVF approximate top-k with REAL partition pruning: vectors live in a
    centroid-bucketed Parquet index (``build_ivf_index``); a query set
    probes the union of its ``nprobe`` nearest buckets and ONLY those
    partitions are read (hive-partition filter pushdown). Scan compute is
    additionally masked per (query, candidate-bucket) with one vectorized
    boolean matrix — no per-candidate Python loop.

    nprobe == nlist probes everything and is exact (== knn_bruteforce,
    which is how the driver oracle checks it); recall at nprobe < nlist is
    asserted in tests."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    owns_index = index_dir is None
    if owns_index:
        # no content-addressed default cache: a (schema, count) key is
        # content-INSENSITIVE and would silently serve a stale index for a
        # different dataset of the same shape. Build into a fresh temp dir
        # and remove it after the query; callers that WANT reuse pass an
        # explicit index_dir whose staleness they own (key it by content,
        # e.g. source-file hash + parquet mtimes, as __ray_entry__ does).
        import tempfile

        index_dir = tempfile.mkdtemp(prefix="raycrawl_ivf_", dir="/tmp")
    centroids = build_ivf_index(ds, index_dir, nlist=nlist,
                                sample_size=sample_size, id_col=id_col,
                                vec_col=vec_col,
                                cardinality_hint=cardinality_hint)

    import glob as _glob

    def _bucket_files(buckets) -> list[str]:
        out: list[str] = []
        for b in buckets:
            out.extend(sorted(_glob.glob(
                os.path.join(index_dir, f"ivf_bucket={b}", "*.parquet"))))
        return out

    all_buckets = sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(index_dir)
        if d.startswith("ivf_bucket="))
    qset = sorted(query_ids)
    q_tbl = (rd.read_parquet(_bucket_files(all_buckets),
                             filter=pc.field(id_col).isin(qset))
             .select_columns([id_col, vec_col]).to_pandas())
    q_ids = q_tbl[id_col].to_numpy()
    q_mat = _matrix(q_tbl[vec_col])
    nlist_eff = len(centroids)
    npb = min(nprobe, nlist_eff)
    q_probe = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :npb]
    probe_matrix = np.zeros((len(q_ids), nlist_eff), dtype=bool)
    for qi in range(len(q_ids)):
        probe_matrix[qi, q_probe[qi]] = True
    probed_buckets = sorted({int(b) for row in q_probe for b in row})
    ref = ray.put((q_ids, q_mat, probe_matrix))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids, qmat, probes = ray.get(ref)
        cand_ids = batch[id_col].to_numpy()
        cmat = _matrix(batch[vec_col])
        cand_bucket = batch["bucket"].to_numpy().astype(np.int64)
        sims = qmat @ cmat.T                      # (Q, B)
        allowed = probes[:, cand_bucket]          # (Q, B) vectorized mask
        sims = np.where(allowed, sims, -np.inf)
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        kk = min(k + 1, sims.shape[1])
        for qi in range(len(qids)):
            idx = np.argpartition(-sims[qi], kk - 1)[:kk]
            for ci in idx:
                if cand_ids[ci] == qids[qi] or not np.isfinite(sims[qi, ci]):
                    continue
                rows["query_id"].append(qids[qi])
                rows["neighbor_id"].append(int(cand_ids[ci]))
                rows["sim"].append(float(sims[qi, ci]))
        return pd.DataFrame(rows)

    # partition-pruned read: only files under the probed ivf_bucket=<b>
    # partitions are passed to read_parquet — at nprobe << nlist the bulk
    # of the index files is never opened at all
    index = rd.read_parquet(_bucket_files(probed_buckets))
    partials = index.map_batches(partial, batch_format="pandas",
                                 batch_size=1024).to_pandas()
    if owns_index:
        import shutil

        shutil.rmtree(index_dir, ignore_errors=True)
    out = {"query_id": [], "neighbor_id": [], "rank": []}
    for qid, grp in partials.groupby("query_id"):
        ranked = sorted(zip(grp["neighbor_id"], grp["sim"]),
                        key=lambda t: (-round(t[1], 6), t[0]))[:k]
        for r, (nid, _) in enumerate(ranked, start=1):
            out["query_id"].append(int(qid))
            out["neighbor_id"].append(int(nid))
            out["rank"].append(r)
    return pd.DataFrame(out).sort_values(["query_id", "rank"]).reset_index(drop=True)


QUANT_SCALE = 1 << 20  # power of two: float32→(f64*2^20) scaling is exact


def quantize_vecs(series, scale: int = QUANT_SCALE) -> np.ndarray:
    """Fixed-point quantization round-half-up: floor(x * 2^20 + 0.5) as
    int64. Scaling a float32 value by a power of two is exact in float64,
    so DuckDB's ``floor(CAST(x AS DOUBLE) * 1048576 + 0.5)`` produces the
    bit-identical integer — the basis for the exact cluster-assign oracle."""
    m = np.asarray([np.asarray(v, dtype=np.float64) for v in series])
    return np.floor(m * scale + 0.5).astype(np.int64)


def cluster_assign(ds, centroid_ids: list[int], id_col: str = "vec_id",
                   vec_col: str = "embedding"):
    """Nearest-centroid assignment (the E-step of k-means / the routing
    step of an IVF build) over integer-quantized vectors, so distances are
    exact int64 sums and the argmin is deterministic (ties → smallest
    centroid index).

    Shape: the k centroid vectors are fetched with one filtered pass,
    quantized, and broadcast via ``ray.put``; every batch computes a
    (B, k) squared-L2 distance matrix with three int64 matmuls
    (|a|² + |c|² − 2a·c) and emits (vec_id, cluster_id, dist_sq). Streams —
    per-batch work is O(B·k·d), nothing materializes.

    Returns a Dataset with columns (vec_id, cluster_id, dist_sq)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    cid_sorted = sorted(centroid_ids)
    cset = pa.array(cid_sorted, pa.int64())
    c_tbl = (
        ds.map_batches(lambda b: b.filter(pc.is_in(b.column(id_col), cset)),
                       batch_format="pyarrow")
        .select_columns([id_col, vec_col]).to_pandas()
        .sort_values(id_col).reset_index(drop=True)
    )
    cmat = quantize_vecs(c_tbl[vec_col])           # (k, d) int64
    c_sq = np.einsum("kd,kd->k", cmat, cmat)       # (k,)
    ref = ray.put((cmat, c_sq))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        cm, cs = ray.get(ref)
        ids = batch[id_col].to_numpy()
        q = quantize_vecs(batch[vec_col])          # (B, d) int64
        d2 = (np.einsum("bd,bd->b", q, q)[:, None]
              + cs[None, :] - 2 * (q @ cm.T))      # (B, k)
        best = d2.argmin(axis=1)                   # first min = smallest idx
        return pd.DataFrame({
            id_col: ids,
            "cluster_id": pd.Series(best, dtype="int64"),
            "dist_sq": pd.Series(d2[np.arange(len(ids)), best],
                                 dtype="int64")})

    return ds.map_batches(assign, batch_format="pandas", batch_size=2048)


def kmeans_fit(ds, centroid_ids: list[int], iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding"):
    """Distributed Lloyd's k-means over 2^20-quantized int64 vectors.

    Exact-integer variant: assignment is ``cluster_assign``'s int64 argmin;
    the M-step recomputes each centroid as the elementwise FLOOR-DIVIDED
    mean (sum // count) of its members, so every iteration stays in exact
    integer arithmetic and the whole fit is reproducible bit-for-bit by an
    unrolled SQL oracle (no float accumulation order anywhere). An empty
    cluster keeps its previous centroid.

    Shape per iteration (the standard scalable k-means layout):
    - centroids broadcast once via ``ray.put`` (k×d int64 — tiny);
    - one ``map_batches`` pass emits per-batch partials of
      (cluster_id, member count, per-dim sums) — k rows × d ints per batch,
      independent of batch row count;
    - the driver folds the partials (k×d integers total) and floor-divides.
    Nothing but k×d-integer partials crosses the wire; the vector table
    streams from the object store every pass.

    Returns (assignment Dataset with (id, cluster_id, dist_sq) from a final
    E-step, centroids int64 ndarray (k, d))."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    # iterative algorithm: pin the (projected) vector table in the object
    # store ONCE so each Lloyd pass re-reads plasma blocks instead of
    # re-executing the parquet read + upstream plan per iteration (the
    # one place mid-pipeline materialization is the scale-CORRECT choice;
    # the r4 bench showed per-iteration plan re-execution dominating the
    # fit at small k)
    ds = ds.select_columns([id_col, vec_col]).materialize()

    cid_sorted = sorted(centroid_ids)
    cset = pa.array(cid_sorted, pa.int64())
    c_tbl = (
        ds.map_batches(lambda b: b.filter(pc.is_in(b.column(id_col), cset)),
                       batch_format="pyarrow")
        .select_columns([id_col, vec_col]).to_pandas()
        .sort_values(id_col).reset_index(drop=True)
    )
    centroids = quantize_vecs(c_tbl[vec_col])      # (k, d) int64
    k, d = centroids.shape

    for _ in range(iters):
        ref = ray.put((centroids,
                       np.einsum("kd,kd->k", centroids, centroids)))

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            cm, cs = ray.get(ref)
            q = quantize_vecs(batch[vec_col])
            d2 = (np.einsum("bd,bd->b", q, q)[:, None]
                  + cs[None, :] - 2 * (q @ cm.T))
            best = d2.argmin(axis=1)
            counts = np.bincount(best, minlength=len(cm)).astype(np.int64)
            sums = np.zeros_like(cm)
            np.add.at(sums, best, q)
            return pd.DataFrame({
                "cluster_id": pd.Series(np.arange(len(cm)), dtype="int64"),
                "n": pd.Series(counts, dtype="int64"),
                "vsum": list(sums)})

        # driver fold of (batches × k) partial rows — vectorized; payload
        # is k·d ints per batch independent of row count (tree-merge it in
        # a second map_batches stage past ~10^5 batches, as sketch.py does)
        parts = ds.map_batches(partial, batch_format="pandas",
                               batch_size=2048).to_pandas()
        cid = parts["cluster_id"].to_numpy()
        counts = np.bincount(cid, weights=parts["n"].to_numpy(),
                             minlength=k).astype(np.int64)
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, cid,
                  np.stack([np.asarray(v, dtype=np.int64)
                            for v in parts["vsum"]]))
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = (
            sums[nonempty] // counts[nonempty, None])  # floor mean, exact

    final_ref = ray.put((centroids,
                         np.einsum("kd,kd->k", centroids, centroids)))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        cm, cs = ray.get(final_ref)
        ids = batch[id_col].to_numpy()
        q = quantize_vecs(batch[vec_col])
        d2 = (np.einsum("bd,bd->b", q, q)[:, None]
              + cs[None, :] - 2 * (q @ cm.T))
        best = d2.argmin(axis=1)
        return pd.DataFrame({
            id_col: ids,
            "cluster_id": pd.Series(best, dtype="int64"),
            "dist_sq": pd.Series(d2[np.arange(len(ids)), best],
                                 dtype="int64")})

    out = ds.map_batches(assign, batch_format="pandas", batch_size=2048)
    return out, centroids
