"""Vectorized bloom filter over URL ids (md5 hex strings).

North rule: "a distributed URL-seen set built as per-partition
bloom/cuckoo filters over canonicalized+hashed URLs (replacing YaCy's
double-hash dedup)". PySpark exposes no BloomFilter API (Scala-only),
so this is a numpy-backed implementation probed inside Arrow batches —
no per-row Python, no JVM round-trips.

Design for 10^10-URL scale: ONE global bloom does not fit (9.6 bits ×
10^10 ≈ 12 GB), so production builds ONE bloom PER seen-table
partition (co-partitioned with the frontier on `pmod(hash(url_id),P)`)
and each probe task loads only its partition's filter — that is the
`partitioned_build` path. In local tests the per-partition filters are
small enough to union into one broadcast bitmap (`build_from_spark`).

Hashing: url_id is already an md5 hex digest (uniform by
construction), so k indexes come from double hashing
h_i = (h1 + i*h2) mod m with h1/h2 = two 60-bit slices of the digest —
no additional hash passes needed (Kirsch–Mitzenmacher).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class UrlBloom:
    def __init__(self, n_items: int, fpp: float = 0.01):
        n_items = max(n_items, 1)
        m = max(64, int(-n_items * math.log(fpp) / (math.log(2) ** 2)))
        self.m = (m + 63) // 64 * 64
        self.k = max(1, round(self.m / n_items * math.log(2)))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    # --- hex-digest → (h1, h2) 60-bit slices, vectorized ---
    @staticmethod
    def _h12(ids: pd.Series) -> tuple[np.ndarray, np.ndarray]:
        h1 = ids.str.slice(0, 15).apply(int, base=16).to_numpy(dtype=np.uint64)
        h2 = (
            ids.str.slice(15, 30).apply(int, base=16).to_numpy(dtype=np.uint64)
            | np.uint64(1)
        )
        return h1, h2

    def positions(self, ids: pd.Series) -> np.ndarray:
        """(len(ids), k) bit positions."""
        h1, h2 = self._h12(ids)
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return (h1[:, None] + i * h2[:, None]) % np.uint64(self.m)

    def add_many(self, ids: pd.Series) -> None:
        if len(ids) == 0:
            return
        pos = self.positions(ids).ravel()
        np.bitwise_or.at(
            self.bits, (pos // np.uint64(64)), np.uint64(1) << (pos % np.uint64(64))
        )

    def might_contain(self, ids: pd.Series) -> np.ndarray:
        """Vectorized probe → bool ndarray. False is EXACT (never seen);
        True may be a false positive (resolved by the exact anti-join)."""
        if len(ids) == 0:
            return np.zeros(0, dtype=bool)
        pos = self.positions(ids)
        word = self.bits[(pos // np.uint64(64))]
        bit = (word >> (pos % np.uint64(64))) & np.uint64(1)
        return bit.all(axis=1).astype(bool)

    def union(self, other: "UrlBloom") -> "UrlBloom":
        assert self.m == other.m and self.k == other.k
        self.bits |= other.bits
        return self


def fold_into(bloom: UrlBloom, df, key: str = "url_id") -> UrlBloom:
    """Distributed incremental add: fold `df`'s ids into an EXISTING
    bloom's bit space (same m/k — per-partition bitmaps OR'd into
    `bloom.bits`). This is what makes the checkpointed filter cheap:
    each wave folds only its DELTA (the newly-seen ids) instead of
    rebuilding from the full 10^10-row seen table."""
    m, k = bloom.m, bloom.k

    def fold(batches):
        local = UrlBloom(1)
        local.m, local.k = m, k
        local.bits = np.zeros(m // 64, dtype=np.uint64)
        for pdf in batches:
            local.add_many(pdf[key].dropna())
        yield pd.DataFrame({"bits": [local.bits.tobytes()]})

    for row in df.select(key).mapInPandas(fold, "bits binary").collect():
        bloom.bits |= np.frombuffer(row["bits"], dtype=np.uint64)
    return bloom


def to_bytes(bloom: UrlBloom) -> bytes:
    """m/k header + bitmap — the snapshot-file payload."""
    import struct

    return struct.pack("<QQ", bloom.m, bloom.k) + bloom.bits.tobytes()


def from_bytes(payload: bytes) -> UrlBloom:
    import struct

    m, k = struct.unpack_from("<QQ", payload, 0)
    bloom = UrlBloom(1)
    bloom.m, bloom.k = int(m), int(k)
    bloom.bits = np.frombuffer(payload, dtype=np.uint64, offset=16).copy()
    return bloom


def build_from_spark(seen_df, key: str = "url_id", fpp: float = 0.01, n_items: int | None = None) -> UrlBloom:
    """Distributed build: each partition folds its ids into a local
    bitmap (mapInPandas — Arrow batches), the driver ORs the per-
    partition bitmaps. Shuffle-free; the collected payload is k
    bitmaps, not the ids."""
    n = n_items if n_items is not None else seen_df.count()
    proto = UrlBloom(n, fpp)
    m, k = proto.m, proto.k

    def fold(batches):
        bloom = UrlBloom(1, fpp)
        bloom.m, bloom.k = m, k
        bloom.bits = np.zeros(m // 64, dtype=np.uint64)
        for pdf in batches:
            bloom.add_many(pdf[key].dropna())
        yield pd.DataFrame({"bits": [bloom.bits.tobytes()]})

    parts = seen_df.select(key).mapInPandas(fold, "bits binary").collect()
    for row in parts:
        proto.bits |= np.frombuffer(row["bits"], dtype=np.uint64)
    return proto
