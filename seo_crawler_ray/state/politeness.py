"""Per-host politeness scheduling as deadline computation.

The reference serializes ALL fetches through one global token bucket
(/root/reference/src/core/rate_limiter.py:24-38; rps = 1/delay, 100 when
delay=0, wired at crawler.py:271-277) — a single-host design that would
starve a multi-host crawl. Per SURVEY.md §4 and the north star, the engine
instead shards a per-host token bucket across actors keyed by
``hash(host) % n_shards`` and never sleeps: each frontier row gets a
*deadline* column ``deadline = max(now, next_free[host]); next_free[host] =
deadline + crawl_delay(host)`` on a deterministic virtual clock. Priority
mode sorts the frontier by (deadline, -priority, seq) so hot hosts spread
across the wave instead of blocking a shard; parity mode records deadlines
for metrics only (FIFO order preserved — the reference's limiter never
reorders its queue either).

Host->shard routing is stable, so one host's clock lives on exactly one
shard; hot-host salting (CrawlConfig.hot_host_salt) only splits the *data*
partitions, never the clock. State checkpoints to parquet per wave.
"""
from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


def host_shard(host: str, n_shards: int) -> int:
    return zlib.crc32(host.encode("utf-8")) % n_shards


@ray.remote(num_cpus=0)
class PolitenessShard:
    def __init__(self, shard_id: int, default_delay: float):
        self.shard_id = shard_id
        self.default_delay = default_delay
        self.next_free: dict[str, float] = {}

    def set_delays(self, delays: dict[str, float]) -> None:
        self.delays = delays

    def schedule(self, hosts: list[str], delays: list[float], now: float) -> np.ndarray:
        """Assign deadlines in row order (token-bucket semantics per host)."""
        out = np.empty(len(hosts), dtype=np.float64)
        nf = self.next_free
        for i, (h, d) in enumerate(zip(hosts, delays)):
            t = nf.get(h, now)
            if t < now:
                t = now
            out[i] = t
            nf[h] = t + (d if d > 0 else self.default_delay)
        return out

    def get_bases(self, hosts: list[str]) -> dict[str, float]:
        """Current next-free time per host (priority-mode deadline bases)."""
        return {h: self.next_free.get(h, 0.0) for h in hosts}

    def advance_counts(self, host_info: dict[str, tuple[int, float]]) -> None:
        """Closed-form wave advance: ``count`` fetches on ``host`` move its
        clock by ``count * delay`` — equivalent to ``count`` sequential
        token-bucket acquisitions (rate_limiter.py:24-38) without sleeping."""
        for h, (count, delay) in host_info.items():
            base = self.next_free.get(h, 0.0)
            d = delay if delay > 0 else self.default_delay
            self.next_free[h] = base + count * d

    def makespan(self) -> float:
        return max(self.next_free.values(), default=0.0)

    def checkpoint(self, path: str) -> str:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        hosts = list(self.next_free)
        t = pa.table({"host": hosts,
                      "next_free": [self.next_free[h] for h in hosts]})
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return path

    def restore(self, path: str) -> None:
        t = pq.read_table(path)
        self.next_free = dict(zip(t["host"].to_pylist(), t["next_free"].to_pylist()))


def make_politeness_shards(n_shards: int, default_delay: float):
    return [PolitenessShard.remote(i, default_delay) for i in range(n_shards)]
