"""Mergeable sketches for distributed approximate aggregation.

``HyperLogLog`` (Flajolet et al. 2007, public algorithm): per-batch
sketches built inside ``map_batches`` (one serialized register array per
batch — the guide's "emit one sketch per batch, merge in a tiny second
stage" pattern), merged by elementwise max. At 2^p registers the standard
error is ~1.04/sqrt(2^p) (~0.8% at p=14). The shuffle payload is
``concurrency × 2^p`` bytes regardless of input size — the scale path for
count-distinct over 10^10 keys where exact dedup would be an all-to-all.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd


class HyperLogLog:
    def __init__(self, p: int = 14) -> None:
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        """hashes: uint64 array."""
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = position of the leftmost 1-bit in the remaining 64-p bits
        ranks = np.zeros(len(hashes), dtype=np.uint8)
        remaining = rest.copy()
        mask_top = np.uint64(1) << np.uint64(63)
        live = np.ones(len(hashes), dtype=bool)
        for r in range(1, 64 - self.p + 2):
            if not live.any():
                break
            top = (remaining & mask_top) != 0
            newly = live & top
            ranks[newly] = r
            live &= ~top
            remaining = remaining << np.uint64(1)
        ranks[live] = 64 - self.p + 1
        np.maximum.at(self.registers, idx, ranks)

    def add_values(self, values) -> None:
        # md5 first-8-bytes big-endian: reproducible in DuckDB as
        # ('0x'||substr(md5(CAST(v AS VARCHAR)),1,16))::UBIGINT, which makes
        # the whole sketch (registers AND estimate) exactly SQL-checkable
        hs = np.fromiter(
            (int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big")
             for v in values),
            dtype=np.uint64, count=len(values))
        if len(hs):
            self.add_hashes(hs)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        """Flajolet estimate with small-range correction. The harmonic sum
        is computed as the EXACT integer S = Σ 2^(max_rank − reg) (every
        term is an integer since reg ≤ max_rank), then one float division —
        so the estimate is a deterministic function of the registers that a
        SQL engine reproduces bit-for-bit (no float-summation-order drift)."""
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        max_rank = 64 - self.p + 1
        s_int = sum(1 << (max_rank - int(r)) for r in self.registers)
        est = alpha * m * m / (s_int / float(1 << max_rank))
        if est <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                est = m * math.log(m / zeros)  # small-range correction
        return float(est)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "HyperLogLog":
        h = cls(p=blob[0])
        h.registers = np.frombuffer(blob[1:], dtype=np.uint8).copy()
        return h


class SpaceSaving:
    """SpaceSaving heavy-hitters sketch (Metwally, Agrawal & El Abbadi 2005,
    public algorithm): at most ``capacity`` counters; an unseen key evicts
    the minimum counter and inherits its count as error. Guarantees
    ``true <= est`` and ``est - err <= true``; any key with frequency
    > N/capacity is retained. Mergeable: counts/errors sum by key, then
    truncate to the largest ``capacity`` (deterministic key tie-break).
    With capacity >= distinct keys no eviction ever happens and counts are
    EXACT regardless of merge order — the regime the oracle query runs in
    (same trick as IVF at nprobe == nlist); approximation guarantees at
    small capacity are asserted in tests."""

    def __init__(self, capacity: int = 1024) -> None:
        self.capacity = capacity
        self.counts: dict = {}
        self.errors: dict = {}

    def add_values(self, values) -> None:
        for v in values:
            if v in self.counts:
                self.counts[v] += 1
            elif len(self.counts) < self.capacity:
                self.counts[v] = 1
                self.errors[v] = 0
            else:
                # evict the min counter (deterministic tie-break by key str)
                m = min(self.counts, key=lambda k: (self.counts[k], str(k)))
                cnt = self.counts.pop(m)
                self.errors.pop(m)
                self.counts[v] = cnt + 1
                self.errors[v] = cnt

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        for k, c in other.counts.items():
            if k in self.counts:
                self.counts[k] += c
                self.errors[k] += other.errors[k]
            else:
                self.counts[k] = c
                self.errors[k] = other.errors[k]
        if len(self.counts) > self.capacity:
            keep = sorted(self.counts,
                          key=lambda k: (-self.counts[k], str(k)))[: self.capacity]
            keep_set = set(keep)
            self.counts = {k: self.counts[k] for k in keep_set}
            self.errors = {k: self.errors[k] for k in keep_set}
        return self

    def topk(self, k: int) -> list:
        """[(key, est_count, max_error)] by (count desc, key asc) — natural
        key order when comparable (matches SQL ORDER BY), str fallback for
        mixed-type keys."""
        try:
            order = sorted(self.counts, key=lambda x: (-self.counts[x], x))
        except TypeError:
            order = sorted(self.counts, key=lambda x: (-self.counts[x], str(x)))
        return [(key, self.counts[key], self.errors[key])
                for key in order[:k]]


def heavy_hitters(ds, col: str, k: int = 20,
                  capacity: int = 4096) -> "pd.DataFrame":
    """Distributed top-k frequent values: one SpaceSaving sketch per batch
    (bounded memory regardless of key cardinality), merged on the driver —
    payload = batches × capacity counters, never the raw keys."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = SpaceSaving(capacity)
        s.add_values(batch[col].tolist())
        import pickle

        return pd.DataFrame({"sketch": [pickle.dumps((s.counts, s.errors))]})

    import pickle

    merged = SpaceSaving(capacity)
    for b in ds.map_batches(partial, batch_format="pandas",
                            batch_size=65536).iter_batches(
                                batch_format="pandas"):
        for blob in b["sketch"]:
            other = SpaceSaving(capacity)
            other.counts, other.errors = pickle.loads(bytes(blob))
            merged.merge(other)
    rows = merged.topk(k)
    return pd.DataFrame({col: [r[0] for r in rows],
                         "est_count": pd.Series([r[1] for r in rows],
                                                dtype="int64"),
                         "max_error": pd.Series([r[2] for r in rows],
                                                dtype="int64")})


def approx_distinct(ds, col: str, p: int = 14) -> float:
    """Approximate count-distinct of a column: per-batch HLL partials →
    driver merge (bytes payload = batches × 2^p)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = HyperLogLog(p)
        h.add_values(batch[col].tolist())
        return pd.DataFrame({"sketch": [h.serialize()]})

    merged = HyperLogLog(p)
    for b in ds.map_batches(partial, batch_format="pandas",
                            batch_size=65536).iter_batches(batch_format="pandas"):
        for blob in b["sketch"]:
            merged.merge(HyperLogLog.deserialize(bytes(blob)))
    return merged.estimate()
