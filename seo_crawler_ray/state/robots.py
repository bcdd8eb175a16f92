"""Robots.txt handling for the simulated web.

The reference fetches and caches one ``RobotFileParser`` per host
(/root/reference/src/crawler.py:1181-1201, cache at crawler.py:76); a fetch
failure means "allow" (crawler.py:1190-1194). Here the robots bodies come
from the corpus ``robots.parquet`` table; the parsed index is small (one row
per host), so the engine broadcasts it once with ``ray.put`` and every
extract/filter task reads it zero-copy — no per-batch re-shipping and no
robots shuffle.
"""
from __future__ import annotations

from urllib.parse import urlparse
from urllib.robotparser import RobotFileParser


class RobotsIndex:
    """host -> parsed robots; missing host -> allow (crawler.py:1190-1194)."""

    def __init__(self, bodies: dict[str, str]):
        self._parsers: dict[str, RobotFileParser] = {}
        self._delays: dict[str, float | None] = {}
        self._bodies = dict(bodies)

    def _parser_for(self, host: str) -> RobotFileParser | None:
        if host not in self._parsers:
            body = self._bodies.get(host)
            if body is None:
                self._parsers[host] = None
            else:
                rp = RobotFileParser()
                rp.parse(body.splitlines())
                self._parsers[host] = rp
        return self._parsers[host]

    def can_fetch(self, user_agent: str, url: str) -> bool:
        host = urlparse(url).netloc
        rp = self._parser_for(host)
        if rp is None:
            return True
        try:
            return rp.can_fetch(user_agent, url)
        except Exception:
            return True

    def crawl_delay(self, user_agent: str, host: str, default: float = 0.0) -> float:
        if host not in self._delays:
            rp = self._parser_for(host)
            delay = None
            if rp is not None:
                try:
                    delay = rp.crawl_delay(user_agent)
                except Exception:
                    delay = None
            self._delays[host] = delay
        d = self._delays[host]
        return default if d is None else float(d)

    def sitemap_lines(self, host: str) -> list[str]:
        """``Sitemap:`` declarations, as sitemap_parser.py:49-66 reads them."""
        body = self._bodies.get(host)
        if body is None:
            return []
        out = []
        for line in body.split("\n"):
            line = line.strip()
            if line.lower().startswith("sitemap:"):
                out.append(line.split(":", 1)[1].strip())
        return out

    @classmethod
    def from_parquet(cls, path: str) -> "RobotsIndex":
        import pyarrow.parquet as pq
        t = pq.read_table(path, columns=["host", "robots_txt"])
        return cls(dict(zip(t["host"].to_pylist(), t["robots_txt"].to_pylist())))
