"""Frontier dedup against the sharded URL-seen actors.

Runs inside ``map_batches`` tasks: hash each candidate URL (SHA-1/64 of the
canonical form — the key the north star mandates), route sub-batches to
``hash % n_shards`` seen-shard actors, and keep only first-time URLs.
One RPC per (batch, shard) — batched, not per-URL.

Correctness note: callers must collapse within-wave duplicates FIRST
(``groupby(url).min(key)``) so cross-batch arrival order inside a wave
cannot affect which discovery wins; across waves the shard state is the
arbiter, matching the reference's discovery-time set check
(/root/reference/src/core/link_manager.py:48-55).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.urls import url_sha1_64


class SeenFilter:
    """map_batches callable: drops rows whose url was already seen."""

    def __init__(self, shard_handles: list):
        self.shards = shard_handles

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        urls = batch["url"].to_pylist()
        hashes = np.fromiter((url_sha1_64(u) for u in urls),
                             dtype=np.uint64, count=len(urls))
        shard_ids = (hashes % np.uint64(len(self.shards))).astype(np.int64)
        mask = np.zeros(len(urls), dtype=bool)
        pending = []
        for s in np.unique(shard_ids):
            idx = np.nonzero(shard_ids == s)[0]
            ref = self.shards[int(s)].check_and_add.remote(hashes[idx])
            pending.append((idx, ref))
        for idx, ref in pending:
            mask[idx] = ray.get(ref)
        return batch.filter(pa.array(mask))


def register_urls(shard_handles: list, urls: list[str]) -> list[bool]:
    """Driver-side ordered registration (seed/sitemap wave); returns the
    per-url 'was new' flags in input order."""
    out = [False] * len(urls)
    hashes = [url_sha1_64(u) for u in urls]
    by_shard: dict[int, list[int]] = {}
    for i, h in enumerate(hashes):
        by_shard.setdefault(h % len(shard_handles), []).append(i)
    refs = {}
    for s, idxs in by_shard.items():
        arr = np.array([hashes[i] for i in idxs], dtype=np.uint64)
        refs[s] = (idxs, shard_handles[s].check_and_add.remote(arr))
    for s, (idxs, ref) in refs.items():
        flags = ray.get(ref)
        for i, f in zip(idxs, flags):
            out[i] = bool(f)
    return out
