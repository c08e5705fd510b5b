"""Cuckoo filter for the URL-seen set (north_star approximate membership).

Standard partial-key cuckoo hashing (Fan et al., "Cuckoo Filter: Practically
Better Than Bloom", CoNEXT'14 — public paper): buckets of 4 slots, 32-bit
fingerprints, alternate bucket = bucket XOR hash(fingerprint). With 4-byte
fingerprints at ~95% load the false-positive rate is ~2^-30 per lookup —
sized so a 10^10-key frontier costs ~40 GB across frontier shards while
keeping dedup errors negligible (SURVEY.md §2.7, R3).

Deterministic: eviction victim selection uses a filter-local LCG, not
``random``, so snapshots/restores replay identically. No false negatives
ever (cuckoo property); ``ExactShadow`` wraps the filter with an exact set
at test scale to prove the zero-FP behavior the conformance check needs.

Keys are the 20-byte SHA-1 url_keys from ``raycrawl.urlnorm``.
"""

from __future__ import annotations

import struct

_SLOTS_PER_BUCKET = 4
_MAX_KICKS = 500
_EMPTY = 0
_MAX_STASH = 64  # homeless-victim stash bound; beyond this the filter is
                 # catastrophically over capacity and add() raises


def _fp_hash(fp: int) -> int:
    # cheap 32-bit integer mix (xorshift-multiply) for the partial-key XOR
    x = fp & 0xFFFFFFFF
    x ^= x >> 16
    x = (x * 0x45D9F3B) & 0xFFFFFFFF
    x ^= x >> 16
    return x


class CuckooFilter:
    def __init__(self, capacity: int) -> None:
        # round bucket count up to a power of two ≥ capacity/slots
        nb = 1
        need = max(1, capacity // _SLOTS_PER_BUCKET + 1)
        while nb < need:
            nb <<= 1
        self.num_buckets = nb
        self._mask = nb - 1
        self.table = bytearray(nb * _SLOTS_PER_BUCKET * 4)  # 4-byte fps
        self.count = 0
        self._lcg = 0x2545F4914F6CDD1D  # deterministic eviction seed
        # victim stash: (bucket_index, fp) entries whose eviction chain hit
        # MAX_KICKS. Consulted by contains()/delete() so the no-false-negative
        # guarantee holds even at saturation (standard cuckoo-with-stash).
        self.stash: list[tuple[int, int]] = []

    # -- key decomposition -------------------------------------------------
    def _parts(self, key: bytes) -> tuple[int, int, int]:
        h = struct.unpack_from("<Q", key, 0)[0]
        fp = struct.unpack_from("<I", key, 8)[0]
        if fp == _EMPTY:
            fp = 1  # reserve 0 for empty slots
        i1 = h & self._mask
        i2 = (i1 ^ _fp_hash(fp)) & self._mask
        return fp, i1, i2

    def _bucket_fps(self, i: int) -> list[int]:
        base = i * _SLOTS_PER_BUCKET * 4
        return list(struct.unpack_from("<4I", self.table, base))

    def _try_put(self, i: int, fp: int) -> bool:
        base = i * _SLOTS_PER_BUCKET * 4
        for s in range(_SLOTS_PER_BUCKET):
            off = base + s * 4
            if struct.unpack_from("<I", self.table, off)[0] == _EMPTY:
                struct.pack_into("<I", self.table, off, fp)
                return True
        return False

    def _rand(self, n: int) -> int:
        self._lcg = (self._lcg * 6364136223846793005 + 1442695040888963407) & (
            (1 << 64) - 1
        )
        return (self._lcg >> 33) % n

    # -- public API ---------------------------------------------------------
    def contains(self, key: bytes) -> bool:
        fp, i1, i2 = self._parts(key)
        if fp in self._bucket_fps(i1) or fp in self._bucket_fps(i2):
            return True
        # a stashed victim with this fingerprint whose bucket pair matches
        return any(f == fp and i in (i1, i2) for (i, f) in self.stash)

    def add(self, key: bytes) -> bool:
        """Insert. Always succeeds (no silent membership loss): if the
        eviction chain exhausts MAX_KICKS the homeless victim goes to the
        stash, preserving the no-false-negative property. Raises
        RuntimeError when the stash itself overflows (the filter is
        catastrophically over capacity — resize upstream)."""
        fp, i1, i2 = self._parts(key)
        if self._try_put(i1, fp) or self._try_put(i2, fp):
            self.count += 1
            return True
        # evict loop; the swap chain is recorded so a failed insert can be
        # rolled back — raising mid-chain without undo would abandon the
        # homeless victim (a PREVIOUSLY-ADDED member) and break the
        # no-false-negative guarantee at exactly the moment it matters
        i = i1 if self._rand(2) == 0 else i2
        swaps: list[tuple[int, int]] = []
        for _ in range(_MAX_KICKS):
            base = i * _SLOTS_PER_BUCKET * 4
            s = self._rand(_SLOTS_PER_BUCKET)
            off = base + s * 4
            victim = struct.unpack_from("<I", self.table, off)[0]
            struct.pack_into("<I", self.table, off, fp)
            swaps.append((off, victim))
            fp = victim
            i = (i ^ _fp_hash(fp)) & self._mask
            if self._try_put(i, fp):
                self.count += 1
                return True
        # keep the final homeless victim in the stash instead of dropping it
        # (dropping would silently evict a previously-added key)
        if len(self.stash) >= _MAX_STASH:
            for off, victim in reversed(swaps):  # restore pre-insert table
                struct.pack_into("<I", self.table, off, victim)
            raise RuntimeError(
                f"cuckoo filter over capacity (load={self.load_factor:.3f}, "
                f"stash full at {_MAX_STASH}) — resize the filter; "
                f"membership state rolled back, the offered key was NOT "
                f"admitted")
        self.stash.append((i, fp))
        self.count += 1
        return True

    def delete(self, key: bytes) -> bool:
        fp, i1, i2 = self._parts(key)
        for i in (i1, i2):
            base = i * _SLOTS_PER_BUCKET * 4
            for s in range(_SLOTS_PER_BUCKET):
                off = base + s * 4
                if struct.unpack_from("<I", self.table, off)[0] == fp:
                    struct.pack_into("<I", self.table, off, _EMPTY)
                    self.count -= 1
                    return True
        for n, (i, f) in enumerate(self.stash):
            if f == fp and i in (i1, i2):
                self.stash.pop(n)
                self.count -= 1
                return True
        return False

    @property
    def load_factor(self) -> float:
        return self.count / (self.num_buckets * _SLOTS_PER_BUCKET)

    # -- snapshot -----------------------------------------------------------
    _MAGIC = b"CKF2"  # format version marker: v2 = stash-bearing snapshots

    def serialize(self) -> bytes:
        header = self._MAGIC + struct.pack(
            "<QQQQ", self.num_buckets, self.count, self._lcg, len(self.stash))
        stash = b"".join(struct.pack("<QI", i, fp) for (i, fp) in self.stash)
        return header + stash + bytes(self.table)

    @classmethod
    def deserialize(cls, blob: bytes) -> "CuckooFilter":
        f = cls.__new__(cls)
        f.stash = []
        if blob[:4] == cls._MAGIC:
            num_buckets, count, lcg, n_stash = struct.unpack_from(
                "<QQQQ", blob, 4)
            off = 36
            for _ in range(n_stash):
                i, fp = struct.unpack_from("<QI", blob, off)
                f.stash.append((i, fp))
                off += 12
        else:
            # legacy (pre-stash) snapshot: 24-byte header, no stash section —
            # parsed correctly instead of misreading table bytes as a stash
            num_buckets, count, lcg = struct.unpack_from("<QQQ", blob, 0)
            off = 24
        f.num_buckets = num_buckets
        f._mask = num_buckets - 1
        f.count = count
        f._lcg = lcg
        f.table = bytearray(blob[off:])
        return f


class ExactShadow:
    """Cuckoo filter + exact set, used at test scale so conformance checks
    ("final URL-seen set must match the reference") are exact while still
    exercising the filter's no-false-negative property (SURVEY.md §2.5)."""

    def __init__(self, capacity: int) -> None:
        self.filter = CuckooFilter(capacity)
        self.exact: set[bytes] = set()
        self.false_positives = 0

    def contains(self, key: bytes) -> bool:
        approx = self.filter.contains(key)
        truth = key in self.exact
        if approx and not truth:
            self.false_positives += 1
        if truth and not approx:  # must never happen
            raise AssertionError("cuckoo filter false negative")
        return truth

    def add(self, key: bytes) -> bool:
        if key in self.exact:
            return False
        self.exact.add(key)
        self.filter.add(key)
        return True

    def serialize(self) -> bytes:
        blob = self.filter.serialize()
        exact_blob = b"".join(sorted(self.exact))
        return struct.pack("<Q", len(blob)) + blob + exact_blob

    @classmethod
    def deserialize(cls, blob: bytes) -> "ExactShadow":
        (flen,) = struct.unpack_from("<Q", blob, 0)
        s = cls.__new__(cls)
        s.filter = CuckooFilter.deserialize(blob[8 : 8 + flen])
        rest = blob[8 + flen :]
        s.exact = {rest[i : i + 20] for i in range(0, len(rest), 20)}
        s.false_positives = 0
        return s
