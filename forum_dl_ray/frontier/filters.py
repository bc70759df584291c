"""Approximate-membership filters backing the sharded URL-seen set.

The reference keeps the whole seen set as a Python ``set`` in one
process (/root/reference/forum_dl/session.py:54-59). At the north-rule
scale (10^10 URLs) that is ~TBs of Python objects; the redesign
(SURVEY.md S4/ST1) is, per frontier shard:

  bloom pre-check (1 byte/key, cheap negative answers, append-only)
    → cuckoo filter (~2.1 bytes/key @ 16-bit fingerprints, supports
      delete, bounded false-positive ~1.2e-4)
    → exact side-set (only at test scale, for the golden-oracle
      equality gate; disabled for large runs)

Both filters are numpy bitmaps/arrays: vectorized batch add/contains,
zero-copy serialization for checkpointing (`to_bytes`/`from_bytes`).
All inputs are stable signed 64-bit key hashes (urlnorm.url_hash64).
"""

from __future__ import annotations

import struct

import numpy as np

_MIX = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio constant (Knuth)


def _as_u64(keys: np.ndarray) -> np.ndarray:
    a = np.asarray(keys)
    if a.dtype != np.uint64:
        a = a.astype(np.int64, copy=False).view(np.uint64)
    return a


class BloomFilter:
    """Vectorized bloom filter over 64-bit keys (double hashing)."""

    def __init__(self, capacity: int, fp_rate: float = 0.01, _bits: np.ndarray | None = None):
        self.capacity = int(capacity)
        self.fp_rate = float(fp_rate)
        # m = -n ln p / (ln 2)^2 ; k = m/n ln 2
        m = max(64, int(-capacity * np.log(fp_rate) / (np.log(2) ** 2)))
        self.m_bits = 1 << int(np.ceil(np.log2(m)))  # power of two → mask modulo
        self.k = max(1, int(round(self.m_bits / capacity * np.log(2))))
        self._mask = np.uint64(self.m_bits - 1)
        self.bits = _bits if _bits is not None else np.zeros(self.m_bits // 8, dtype=np.uint8)
        self.n_added = 0

    def _indices(self, keys: np.ndarray) -> np.ndarray:
        """(len(keys), k) bit indices via double hashing h1 + j*h2."""
        with np.errstate(over="ignore"):
            h1 = _as_u64(keys)
            h2 = (h1 ^ (h1 >> np.uint64(33))) * _MIX | np.uint64(1)
            j = np.arange(self.k, dtype=np.uint64)
            return (h1[:, None] + j[None, :] * h2[:, None]) & self._mask

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        idx = self._indices(keys).ravel()
        np.bitwise_or.at(self.bits, (idx >> 3).astype(np.int64), np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
        self.n_added += len(keys)

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indices(keys)
        byte = self.bits[(idx >> 3).astype(np.int64)]
        bit = (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1
        return bit.all(axis=1)

    def to_bytes(self) -> bytes:
        header = struct.pack("<qqdq", self.capacity, self.n_added, self.fp_rate, self.k)
        return header + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        capacity, n_added, fp_rate, k = struct.unpack_from("<qqdq", data, 0)
        bits = np.frombuffer(data[32:], dtype=np.uint8).copy()
        f = cls(capacity, fp_rate, _bits=bits)
        f.n_added = n_added
        assert f.k == k and len(f.bits) == len(bits)
        return f


class CuckooFilter:
    """Cuckoo filter: 16-bit fingerprints, 4 slots/bucket, deletable.

    ~16.8 bits/key at 0.95 load; false-positive ≈ 8/2^16 ≈ 1.2e-4.
    Batch `contains_many` is fully vectorized; inserts loop per key
    (insert volume is bounded by URL-discovery rate, far below lookup
    volume).
    """

    MAX_KICKS = 500
    SLOTS = 4

    def __init__(self, capacity: int, _table: np.ndarray | None = None, seed: int = 42):
        n_buckets = 1 << int(np.ceil(np.log2(max(2, capacity // self.SLOTS))))
        # headroom so load stays < ~0.95 at `capacity` keys
        if capacity / (n_buckets * self.SLOTS) > 0.95:
            n_buckets <<= 1
        self.capacity = int(capacity)
        self.n_buckets = n_buckets
        self._mask = np.uint64(n_buckets - 1)
        self.table = _table if _table is not None else np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.n_items = 0
        self._rng = np.random.default_rng(seed)  # eviction slot choice (seeded → deterministic)

    # fingerprint: top 16 bits, forced nonzero (0 = empty slot sentinel)
    def _fingerprint(self, keys: np.ndarray) -> np.ndarray:
        fp = (_as_u64(keys) >> np.uint64(48)).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _index1(self, keys: np.ndarray) -> np.ndarray:
        return (_as_u64(keys) & self._mask).astype(np.int64)

    def _alt_index(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = fp.astype(np.uint64) * _MIX
        return ((idx.astype(np.uint64) ^ h) & self._mask).astype(np.int64)

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fingerprint(keys)
        i1 = self._index1(keys)
        i2 = self._alt_index(i1, fp)
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    # pattern (bitmask of nonzero slots) -> first empty slot for COMPACT
    # rows (occupied slots form a prefix); -1 = non-compact (a delete
    # left a mid-row hole; take the per-key path), 4 = full
    _FIRST_EMPTY = np.array(
        [0, 1, -1, 2, -1, -1, -1, 3, -1, -1, -1, -1, -1, -1, -1, 4],
        dtype=np.int64)
    _PAT_W = np.array([1, 2, 4, 8], dtype=np.uint8)

    def insert_many(self, keys: np.ndarray) -> int:
        """Insert all keys; returns number inserted. Raises on full table.

        Vectorized fast path: each key tries its two candidate buckets'
        first empty slot; keys colliding on a bucket within the batch
        get consecutive slots via a stable-sort rank. Only keys whose
        both buckets are full (→ eviction kicks) fall to the per-key
        loop — at the filter's working load (<0.95) that is a tail.
        """
        if len(keys) == 0:
            return 0
        fps = self._fingerprint(keys)
        i1s = self._index1(keys)
        i2s = self._alt_index(i1s, fps)
        pending = np.arange(len(keys))
        for cand in (i1s, i2s):
            if not len(pending):
                break
            bucket = cand[pending]
            order = np.argsort(bucket, kind="stable")
            bs = bucket[order]
            new_grp = np.r_[True, bs[1:] != bs[:-1]]
            grp_start = np.maximum.accumulate(
                np.where(new_grp, np.arange(len(bs)), 0))
            rank = np.arange(len(bs)) - grp_start
            rows = self.table[bs]
            pat = ((rows != 0).astype(np.uint8) * self._PAT_W).sum(axis=1)
            fe = self._FIRST_EMPTY[pat]
            slot = fe + rank
            ok = (fe >= 0) & (slot < self.SLOTS)
            if ok.any():
                p_ok = pending[order][ok]
                self.table[bs[ok], slot[ok]] = fps[p_ok]
                self.n_items += int(ok.sum())
            pending = pending[order][~ok]
        if not len(pending):
            return len(keys)
        fps, i1s, i2s = fps[pending], i1s[pending], i2s[pending]
        table = self.table
        for fp, i1, i2 in zip(fps, i1s, i2s):
            placed = False
            for idx in (i1, i2):
                row = table[idx]
                empty = np.nonzero(row == 0)[0]
                if len(empty):
                    row[empty[0]] = fp
                    placed = True
                    break
            if not placed:
                idx = int(i1 if self._rng.integers(2) else i2)
                cur = np.uint16(fp)
                for _ in range(self.MAX_KICKS):
                    slot = int(self._rng.integers(self.SLOTS))
                    cur, table[idx, slot] = table[idx, slot], cur
                    idx = int(self._alt_index(np.array([idx]), np.array([cur], dtype=np.uint16))[0])
                    row = table[idx]
                    empty = np.nonzero(row == 0)[0]
                    if len(empty):
                        row[empty[0]] = cur
                        placed = True
                        break
                if not placed:
                    raise RuntimeError(
                        f"cuckoo filter full (n_items={self.n_items}, buckets={self.n_buckets})"
                    )
            self.n_items += 1
        return len(keys)

    def delete(self, key: int) -> bool:
        k = np.array([key], dtype=np.int64)
        fp = self._fingerprint(k)[0]
        i1 = int(self._index1(k)[0])
        i2 = int(self._alt_index(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
        for idx in (i1, i2):
            slots = np.nonzero(self.table[idx] == fp)[0]
            if len(slots):
                self.table[idx, slots[0]] = 0
                self.n_items -= 1
                return True
        return False

    @property
    def load_factor(self) -> float:
        return self.n_items / (self.n_buckets * self.SLOTS)

    def to_bytes(self) -> bytes:
        header = struct.pack("<qqq", self.capacity, self.n_buckets, self.n_items)
        return header + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        capacity, n_buckets, n_items = struct.unpack_from("<qqq", data, 0)
        table = np.frombuffer(data[24:], dtype=np.uint16).reshape(n_buckets, cls.SLOTS).copy()
        f = cls(capacity, _table=table)
        assert f.n_buckets == n_buckets
        f.n_items = n_items
        return f
