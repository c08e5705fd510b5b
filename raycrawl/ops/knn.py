"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce``: exact top-k cosine — the query matrix is normalized
  once on the driver and ``ray.put`` (broadcast, not re-shipped per batch);
  every batch does ONE numpy matmul against it and emits per-batch top-k
  partials; a final tiny reduce merges partials into the global top-k. The
  dataset side streams — nothing but (query, candidate, sim) partials ever
  leaves a worker.
- ``knn_ivf``: the scale path — a k-means coarse quantizer (numpy Lloyd
  iterations on a sample, seed-fixed) assigns every vector to a centroid
  inside ``map_batches``; a query probes only the ``nprobe`` nearest
  centroid buckets. Recall is checked against bruteforce in tests.

Ranking determinism: neighbors are ordered by (round(sim, 6) desc,
neighbor_id asc) so Ray and the DuckDB oracle agree despite float-sum
ordering differences.
"""

from __future__ import annotations

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


def knn_ivf(ds, query_ids: list[int], k: int = 10, nlist: int = 16,
            nprobe: int = 4, sample_size: int = 4096,
            id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF approximate top-k: train a coarse quantizer on a sample, assign
    vectors to buckets in map_batches, probe nprobe buckets per query."""
    import ray

    sample = ds.limit(sample_size).select_columns([vec_col]).to_pandas()
    centroids = _kmeans(_matrix(sample[vec_col]), nlist)

    import pyarrow as pa
    import pyarrow.compute as pc

    qset = pa.array(sorted(query_ids), pa.int64())
    q_tbl = (
        ds.map_batches(lambda b: b.filter(pc.is_in(b.column(id_col), qset)),
                       batch_format="pyarrow")
        .select_columns([id_col, vec_col]).to_pandas()
    )
    q_ids = q_tbl[id_col].to_numpy()
    q_mat = _matrix(q_tbl[vec_col])
    q_probe = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :nprobe]
    probe_sets = [set(p) for p in q_probe]
    ref = ray.put((q_ids, q_mat, centroids, probe_sets))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids, qmat, cents, probes = ray.get(ref)
        cand_ids = batch[id_col].to_numpy()
        cmat = _matrix(batch[vec_col])
        cand_bucket = (cmat @ cents.T).argmax(axis=1)
        sims = qmat @ cmat.T
        rows = {"query_id": [], "neighbor_id": [], "sim": []}
        for qi in range(len(qids)):
            mask = np.fromiter((cand_bucket[ci] in probes[qi]
                                for ci in range(len(cand_ids))), dtype=bool,
                               count=len(cand_ids))
            idx = np.where(mask)[0]
            if len(idx) == 0:
                continue
            top = idx[np.argsort(-sims[qi, idx])[: k + 1]]
            for ci in top:
                if cand_ids[ci] == qids[qi]:
                    continue
                rows["query_id"].append(qids[qi])
                rows["neighbor_id"].append(int(cand_ids[ci]))
                rows["sim"].append(float(sims[qi, ci]))
        return pd.DataFrame(rows)

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=1024).to_pandas()
    out = {"query_id": [], "neighbor_id": [], "rank": []}
    for qid, grp in partials.groupby("query_id"):
        ranked = sorted(zip(grp["neighbor_id"], grp["sim"]),
                        key=lambda t: (-round(t[1], 6), t[0]))[:k]
        for r, (nid, _) in enumerate(ranked, start=1):
            out["query_id"].append(int(qid))
            out["neighbor_id"].append(int(nid))
            out["rank"].append(r)
    return pd.DataFrame(out).sort_values(["query_id", "rank"]).reset_index(drop=True)
