"""Simulated PageSpeed Insights stage.

Reference semantics: page selection O4 (crawler.py:1248-1284, implemented
in ``pipelines.exports.select_pages_for_pagespeed``), the per-page
mobile+desktop API loop (crawler.py:1203-1246), and retry with exponential
backoff on HTTP 429 (crawler.py:1350-1355: ``delay = 2**attempt *
uniform(0.5, 1.5)``, ``retries=3``).

No network exists in this environment, so the API is a deterministic
simulator: a parquet sidecar (derived purely from the corpus URLs, versioned
by filename) fixes each (url, strategy)'s performance score, paint metrics,
and how many 429 responses precede the first 200. The *stage shape* is the
real thing — an actor-pool ``map_batches`` callable that owns the retry
loop, accumulates deterministic backoff (no sleeping, same clock trick as
the politeness shards), caps attempts at ``retries + 1`` and reports
failures as rows instead of raising.
"""
from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

SIDECAR_NAME = "pagespeed_api_v1.parquet"
STRATEGIES = ("mobile", "desktop")
DEFAULT_RETRIES = 3


def _derive(urls: list[str], strategy: str) -> dict[str, np.ndarray]:
    h = np.array([zlib.crc32(f"{u}|{strategy}".encode()) for u in urls],
                 dtype=np.int64)
    fcp_e2 = 80 + (h >> 8) % 400
    return {
        "performance_score": (35 + h % 60),
        "fcp_e2": fcp_e2,
        "lcp_e2": fcp_e2 + (h >> 16) % 300,
        "fail_429": (h >> 24) % 6,       # 0..5; > retries means hard failure
    }


def ensure_pagespeed_sidecar(corpus_dir: str) -> str:
    """Write the deterministic API-response sidecar for every corpus URL
    (atomic tmp+rename; pure function of the URL set, so engine and DuckDB
    oracle read identical bytes)."""
    path = os.path.join(corpus_dir, SIDECAR_NAME)
    if os.path.exists(path):
        return path
    urls = pq.read_table(os.path.join(corpus_dir, "meta.parquet"),
                         columns=["url"])["url"].to_pylist()
    parts = []
    for strategy in STRATEGIES:
        d = _derive(urls, strategy)
        parts.append(pa.table({
            "url": pa.array(urls, pa.string()),
            "strategy": pa.array([strategy] * len(urls)),
            "performance_score": pa.array(d["performance_score"]),
            "fcp_e2": pa.array(d["fcp_e2"]),
            "lcp_e2": pa.array(d["lcp_e2"]),
            "fail_429": pa.array(d["fail_429"]),
        }))
    # Unique temp name: concurrent callers (two workers racing to build the
    # sidecar) must never truncate each other's half-written file; os.replace
    # of a private temp is atomic — last writer wins with identical bytes.
    import tempfile
    fd, tmp = tempfile.mkstemp(dir=corpus_dir, suffix=".tmp")
    os.close(fd)
    try:
        pq.write_table(pa.concat_tables(parts), tmp)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def _jitter(url: str, strategy: str, attempt: int) -> float:
    """uniform(0.5, 1.5) made deterministic per (url, strategy, attempt)."""
    u = zlib.crc32(f"{url}|{strategy}|{attempt}".encode()) / 0xFFFFFFFF
    return 0.5 + u


class PageSpeedStage:
    """Actor-pool callable: one simulated API conversation per (url,
    strategy) row — 429s consume attempts and add exponential backoff to
    the stage's virtual clock; the first 200 yields the metrics row."""

    def __init__(self, sidecar_path: str, urls: list[str],
                 retries: int = DEFAULT_RETRIES):
        import pyarrow.compute as pc
        tbl = pq.read_table(sidecar_path)
        tbl = tbl.filter(pc.is_in(tbl["url"], pa.array(urls)))
        self.responses = {
            (u, s): (score, fcp, lcp, f429)
            for u, s, score, fcp, lcp, f429 in zip(
                tbl["url"].to_pylist(), tbl["strategy"].to_pylist(),
                tbl["performance_score"].to_pylist(),
                tbl["fcp_e2"].to_pylist(), tbl["lcp_e2"].to_pylist(),
                tbl["fail_429"].to_pylist())
        }
        self.retries = retries
        self.backoff_clock = 0.0          # virtual seconds spent backing off

    def _call_api(self, url: str, strategy: str) -> tuple[int, int, int, int]:
        """(attempts, score, fcp_e2, lcp_e2); score = -1 on hard failure
        (reference returns success=False after exhausting retries)."""
        score, fcp, lcp, fail_429 = self.responses[(url, strategy)]
        for attempt in range(self.retries + 1):
            if attempt >= fail_429:       # simulated 200
                return attempt + 1, int(score), int(fcp), int(lcp)
            if attempt < self.retries:    # simulated 429 -> backoff, retry
                self.backoff_clock += (2 ** attempt) * _jitter(
                    url, strategy, attempt)
        return self.retries + 1, -1, -1, -1

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"url": [], "strategy": [], "attempts": [],
               "performance_score": [], "fcp_e2": [], "lcp_e2": []}
        for url in batch["url"].to_pylist():
            for strategy in STRATEGIES:   # mobile then desktop, per page
                attempts, score, fcp, lcp = self._call_api(url, strategy)
                out["url"].append(url)
                out["strategy"].append(strategy)
                out["attempts"].append(attempts)
                out["performance_score"].append(score)
                out["fcp_e2"].append(fcp)
                out["lcp_e2"].append(lcp)
        return pa.table({
            "url": pa.array(out["url"], pa.string()),
            "strategy": pa.array(out["strategy"], pa.string()),
            "attempts": pa.array(out["attempts"], pa.int64()),
            "performance_score": pa.array(out["performance_score"], pa.int64()),
            "fcp_e2": pa.array(out["fcp_e2"], pa.int64()),
            "lcp_e2": pa.array(out["lcp_e2"], pa.int64()),
        })


def pagespeed_results(selected_urls: list[str], corpus_dir: str,
                      retries: int = DEFAULT_RETRIES):
    """The full O4+API pipeline over the (bounded, <=3) selected pages."""
    sidecar = ensure_pagespeed_sidecar(corpus_dir)
    ds = ray.data.from_arrow(pa.table({"url": pa.array(selected_urls,
                                                       pa.string())}))
    return ds.map_batches(
        PageSpeedStage, fn_constructor_args=(sidecar, selected_urls, retries),
        batch_format="pyarrow", concurrency=1)
