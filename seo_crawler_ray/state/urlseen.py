"""Sharded URL-seen actors — the cross-wave mutable state of the crawl.

Replaces the reference's single in-process ``all_discovered_urls`` set
(/root/reference/src/core/link_manager.py:14,48-55) with
``hash(sha1_64(url)) % n_shards`` actor shards, each holding a cuckoo
filter (+ bloom spill) sized per BASELINE.json's 10^10-URL frontier, and —
in exact/parity mode — the authoritative 64-bit key set. Dedup tasks inside
``map_batches`` route sub-batches to shards; the actor API is batched so one
wave costs O(batches x shards) RPCs, not O(urls).

Shard state checkpoints to ``.npz`` per wave so a killed run resumes with an
identical seen-set (SURVEY.md §4 checkpoint row).
"""
from __future__ import annotations

import os

import numpy as np
import ray

from .cuckoo import CuckooFilter


class _SeenCore:
    def __init__(self, capacity: int, exact: bool):
        self.filter = CuckooFilter(capacity)
        self.exact = exact
        self.exact_set: set[int] | None = set() if exact else None
        self._delta: list[int] = []   # keys added since the last checkpoint

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """True where the key was NOT seen before this call; duplicates
        within the batch: only the first occurrence reports True."""
        hashes = hashes.astype(np.uint64, copy=False)
        out = np.zeros(len(hashes), dtype=bool)
        if self.exact:
            seen = self.exact_set
            for i, h in enumerate(hashes.tolist()):
                if h not in seen:
                    seen.add(h)
                    out[i] = True
        else:
            maybe_seen = self.filter.contains_batch(hashes)
            # in-batch first-occurrence dedup for the not-seen candidates
            first = np.zeros(len(hashes), dtype=bool)
            seen_local: set[int] = set()
            for i, h in enumerate(hashes.tolist()):
                if h not in seen_local:
                    seen_local.add(h)
                    first[i] = True
            out = (~maybe_seen) & first
        new = hashes[out]
        if len(new):
            self.filter.insert_batch(new)
            self._delta.extend(new.tolist())
        return out

    def count(self) -> int:
        return len(self.exact_set) if self.exact else self.filter.size

    def checkpoint(self, path: str) -> None:
        """Full-state snapshot: filter table (+bloom) and, in exact mode,
        the key set. O(filter size) per wave — fine at test scale."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        st = self.filter.to_state()
        if self.exact:
            st["exact_keys"] = np.fromiter(self.exact_set, dtype=np.uint64,
                                           count=len(self.exact_set))
        tmp = path + ".tmp.npz"
        np.savez(tmp, **st)   # uncompressed: checkpoint latency > disk here
        os.replace(tmp, path)
        self._delta.clear()

    def checkpoint_delta(self, path: str) -> int:
        """Delta snapshot: only the keys inserted since the last checkpoint
        — O(new keys this wave), the 10^10-scale mode (a full cuckoo table
        is ~2.2 B/key of state; rewriting it every wave would dwarf the
        wave's own I/O). Restore replays deltas in wave order."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        keys = np.array(self._delta, dtype=np.uint64)
        tmp = path + ".tmp.npz"
        np.savez(tmp, delta_keys=keys)
        os.replace(tmp, path)
        self._delta.clear()
        return len(keys)

    def restore(self, path: str) -> None:
        with np.load(path) as z:
            st = {k: z[k] for k in z.files}
        exact_keys = st.pop("exact_keys", None)
        self.filter = CuckooFilter.from_state(st)
        if self.exact:
            self.exact_set = set(exact_keys.tolist()) if exact_keys is not None else set()
        self._delta.clear()

    def restore_deltas(self, paths: list[str]) -> None:
        """Rebuild state by replaying delta files in checkpoint order."""
        for p in paths:
            with np.load(p) as z:
                keys = z["delta_keys"].astype(np.uint64)
            if len(keys):
                self.filter.insert_batch(keys)
                if self.exact:
                    self.exact_set.update(keys.tolist())
        self._delta.clear()


@ray.remote(num_cpus=0)
class UrlSeenShard:
    """One shard of the global URL-seen set."""

    def __init__(self, shard_id: int, capacity: int, exact: bool = True):
        self.shard_id = shard_id
        self.core = _SeenCore(capacity, exact)

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        return self.core.check_and_add(hashes)

    def count(self) -> int:
        return self.core.count()

    def checkpoint(self, path: str) -> str:
        self.core.checkpoint(path)
        return path

    def checkpoint_delta(self, path: str) -> int:
        return self.core.checkpoint_delta(path)

    def restore(self, path: str) -> None:
        self.core.restore(path)

    def restore_deltas(self, paths: list[str]) -> None:
        self.core.restore_deltas(paths)


def make_seen_shards(n_shards: int, capacity_per_shard: int, exact: bool):
    return [UrlSeenShard.remote(i, capacity_per_shard, exact) for i in range(n_shards)]
