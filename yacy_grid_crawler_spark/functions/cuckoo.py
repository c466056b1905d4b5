"""Vectorized cuckoo filter over URL ids (md5 hex strings).

The north rule names "per-partition bloom/cuckoo filters over
canonicalized+hashed URLs" as the seen-set fast path; functions/
bloom.py is the bloom half, this is the cuckoo half. What the cuckoo
filter adds over bloom is DELETE support: the reference's double-cache
expires entries after 7 days (CrawlerListener.java:84-85, 96-108) —
with a bloom, TTL expiry forces a full rebuild from the surviving
rows; a cuckoo filter removes the expired fingerprints in place
(`delete_many`), so the seen-set fast path survives partition expiry
without a rebuild scan at 10^10 scale.

Layout: `nbuckets` × 4 slots of 16-bit fingerprints (0 = empty),
nbuckets a power of two at ~95% max load. Partner bucket:
i2 = i1 XOR (fp * 0x5bd1e995 mod nbuckets) — the standard
partial-key cuckoo hashing, self-inverse, so eviction needs only the
slot's fingerprint. All probes/inserts are numpy-vectorized; the
eviction loop touches only the (rare) items whose both buckets are
full. Same correctness contract as the bloom: `might_contain` False is
exact, True may be a false positive (≈ 2·4/2^16 per probe) and is
resolved by the exact anti-join downstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MIX = np.uint64(0x5BD1E995)
SLOTS = 4
MAX_KICKS = 500


class UrlCuckoo:
    def __init__(self, n_items: int, load: float = 0.95):
        n_items = max(n_items, 1)
        nb = 1
        while nb * SLOTS * load < n_items:
            nb <<= 1
        self.nbuckets = nb
        self.mask = np.uint64(nb - 1)
        self.table = np.zeros((nb, SLOTS), dtype=np.uint16)
        self.n = 0

    # --- md5-hex → (bucket, fingerprint), vectorized -----------------
    def _fp_i1(self, ids: pd.Series) -> tuple[np.ndarray, np.ndarray]:
        h1 = ids.str.slice(0, 15).apply(int, base=16).to_numpy(dtype=np.uint64)
        hf = ids.str.slice(15, 30).apply(int, base=16).to_numpy(dtype=np.uint64)
        fp = (hf % np.uint64(0xFFFF) + np.uint64(1)).astype(np.uint16)  # never 0
        i1 = h1 & self.mask
        return fp, i1

    def _partner(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return i ^ ((fp.astype(np.uint64) * _MIX) & self.mask)

    # --- insert -------------------------------------------------------
    def add_many(self, ids: pd.Series) -> None:
        if len(ids) == 0:
            return
        fp, i1 = self._fp_i1(ids)
        i2 = self._partner(i1, fp)
        pending = np.ones(len(fp), dtype=bool)
        # skip items already present (idempotent add — set semantics)
        pending &= ~self._contains_fp(fp, i1, i2)
        # vectorized slot fill: try each slot of bucket1 then bucket2
        for bucket in (i1, i2):
            for s in range(SLOTS):
                if not pending.any():
                    return
                free = self.table[bucket, s] == 0
                take = pending & free
                if take.any():
                    # dedupe same-bucket collisions within this batch:
                    # keep the first writer per bucket, requeue the rest
                    b = bucket[take]
                    uniq, first_idx = np.unique(b, return_index=True)
                    winners = np.flatnonzero(take)[first_idx]
                    self.table[bucket[winners], s] = fp[winners]
                    self.n += len(winners)
                    pending[winners] = False
        # eviction path for the stragglers (rare below ~95% load)
        for j in np.flatnonzero(pending):
            self._insert_one(int(fp[j]), int(i1[j]))

    def _insert_one(self, fp: int, i: int) -> None:
        rng_slot = fp  # deterministic "random" slot walk
        cur_fp, cur_i = np.uint16(fp), np.uint64(i)
        for kick in range(MAX_KICKS):
            row = self.table[cur_i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                self.table[cur_i, empty[0]] = cur_fp
                self.n += 1
                return
            s = (rng_slot + kick) % SLOTS
            victim = row[s]
            self.table[cur_i, s] = cur_fp
            cur_fp = victim
            cur_i = np.uint64(cur_i) ^ (
                (np.uint64(victim) * _MIX) & self.mask
            )
        raise RuntimeError(
            f"cuckoo filter over capacity (n={self.n}, buckets={self.nbuckets})"
        )

    # --- probe --------------------------------------------------------
    def _contains_fp(self, fp, i1, i2) -> np.ndarray:
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def might_contain(self, ids: pd.Series) -> np.ndarray:
        if len(ids) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1 = self._fp_i1(ids)
        return self._contains_fp(fp, i1, self._partner(i1, fp))

    # --- delete (the reason this exists) -------------------------------
    def delete_many(self, ids: pd.Series) -> int:
        """Remove one fingerprint occurrence per id (TTL sweep).
        Returns the number actually removed. Only delete ids that were
        inserted — deleting a never-inserted id can evict a colliding
        fingerprint (standard cuckoo-filter contract)."""
        if len(ids) == 0:
            return 0
        fp, i1 = self._fp_i1(ids)
        i2 = self._partner(i1, fp)
        removed = 0
        for j in range(len(fp)):  # deletes are sweep-sized, not wave-sized
            for b in (i1[j], i2[j]):
                row = self.table[b]
                hits = np.flatnonzero(row == fp[j])
                if len(hits):
                    self.table[b, hits[0]] = 0
                    self.n -= 1
                    removed += 1
                    break
        return removed

    def merge(self, other: "UrlCuckoo") -> "UrlCuckoo":
        """Fold another table's fingerprints in (per-partition build →
        driver merge). Tables must be same-shaped."""
        assert self.nbuckets == other.nbuckets
        flat_table = other.table.ravel()
        for flat in np.flatnonzero(flat_table):
            self._insert_one(int(flat_table[flat]), int(flat // SLOTS))
        return self


def _from_table_bytes(payload: bytes, nb: int) -> UrlCuckoo:
    c = UrlCuckoo(1)
    c.nbuckets, c.mask = nb, np.uint64(nb - 1)
    c.table = (
        np.frombuffer(payload, dtype=np.uint16).reshape(nb, SLOTS).copy()
    )
    c.n = int(np.count_nonzero(c.table))
    return c


def build_from_spark(
    seen_df, key: str = "url_id", n_items: int | None = None
) -> UrlCuckoo:
    """Distributed build, same shape as bloom.build_from_spark: each
    partition folds its ids into a local same-shaped table
    (mapInPandas), and the per-partition tables pairwise-merge
    executor-side via treeReduce — the driver receives O(tree fan-in)
    tables, not one per partition (the same bounded-fold fix as
    bloom._or_fold_bits; a 10^10-scale deployment shards the filter by
    url_id range instead, see bloom.ShardedBloomStore — the shape
    carries over unchanged because the shard routing only reads the
    digest prefix)."""
    import math

    n = n_items if n_items is not None else seen_df.count()
    proto = UrlCuckoo(max(n * 2, 64))  # headroom so the merge never overflows
    nb = proto.nbuckets

    def fold(batches):
        local = UrlCuckoo(1)
        local.nbuckets, local.mask = nb, np.uint64(nb - 1)
        local.table = np.zeros((nb, SLOTS), dtype=np.uint16)
        for pdf in batches:
            local.add_many(pdf[key].dropna())
        yield pd.DataFrame({"table": [local.table.tobytes()]})

    rdd = (
        seen_df.select(key)
        .mapInPandas(fold, "table binary")
        .rdd.map(lambda r: bytes(r["table"]))
    )
    n_parts = rdd.getNumPartitions()
    if n_parts == 0:
        return proto

    def merge_bytes(a: bytes, b: bytes) -> bytes:
        ca = _from_table_bytes(a, nb)
        ca.merge(_from_table_bytes(b, nb))
        return ca.table.tobytes()

    depth = max(2, int(math.ceil(math.log(max(n_parts, 2), 32))))
    proto.merge(_from_table_bytes(rdd.treeReduce(merge_bytes, depth), nb))
    return proto
