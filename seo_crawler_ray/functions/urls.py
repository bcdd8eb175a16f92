"""URL canonicalization / classification functions.

Semantics mirror the reference exactly (all citations into /root/reference):

- ``canonicalize``: urljoin then rebuild as ``scheme://netloc path`` plus
  ``?query`` when present — fragment dropped, query kept verbatim, no case
  or trailing-slash normalization (src/core/link_manager.py:31-38,78-81).
- ``strip_www``: single leading-``www.`` strip on netloc for internal/external
  comparison (src/core/link_manager.py:158-163, src/core/seo_extractor.py:196-197).
- ``normalize_seed``: prepend https:// to schemeless seeds; a seed with a
  non-root path forces max_depth=0 (src/crawler.py:210-222).
- ``url_extension``: ``path.lower().split('.')[-1]`` when the path contains a
  dot (src/crawler.py:1154-1156).
- ``should_crawl_mask``: external policy -> robots -> extension include /
  exclude -> exclude/include regex lists (src/crawler.py:1139-1179).
"""
from __future__ import annotations

import hashlib
import re
from urllib.parse import urljoin, urlparse


def canonicalize(base_url: str, href: str) -> str:
    """Reference clean-URL form of ``href`` resolved against ``base_url``."""
    absolute = urljoin(base_url, href)
    parsed = urlparse(absolute)
    clean = f"{parsed.scheme}://{parsed.netloc}{parsed.path}"
    if parsed.query:
        clean += f"?{parsed.query}"
    return clean


def strip_www(netloc: str) -> str:
    return netloc.replace("www.", "", 1)


def is_internal(url: str, base_domain: str) -> bool:
    """src/core/link_manager.py:158-163."""
    return strip_www(urlparse(url).netloc) == strip_www(base_domain)


def url_host(url: str) -> str:
    return urlparse(url).netloc


def normalize_seed(url: str) -> tuple[str, str, str, bool]:
    """Returns (normalized_url, base_url, base_domain, has_path).

    ``has_path`` True forces max_depth=0 in the caller (src/crawler.py:218-222).
    """
    if not url.startswith(("http://", "https://")):
        url = "https://" + url
    parsed = urlparse(url)
    base_url = f"{parsed.scheme}://{parsed.netloc}"
    has_path = bool(parsed.path) and parsed.path not in ("/", "")
    return url, base_url, parsed.netloc, has_path


def url_extension(url: str) -> str | None:
    path = urlparse(url).path.lower()
    if "." in path:
        return path.split(".")[-1]
    return None


def url_sha1_64(url: str) -> int:
    """First 8 bytes of SHA-1 of the canonical URL — the URL-seen key."""
    return int.from_bytes(hashlib.sha1(url.encode("utf-8")).digest()[:8], "big")


class ShouldCrawl:
    """Vectorizable should-crawl predicate (src/crawler.py:1139-1179).

    The robots part is delegated to a ``RobotsIndex`` (broadcast small side);
    everything else is pure string logic. Regex lists are compiled once.
    """

    def __init__(
        self,
        base_domain: str,
        crawl_external: bool,
        respect_robots: bool,
        include_extensions: list[str],
        exclude_extensions: list[str],
        include_patterns: list[str],
        exclude_patterns: list[str],
        robots_index=None,
        user_agent: str = "LibreCrawl/1.0 (Web Crawler)",
    ):
        self.base_domain_clean = strip_www(base_domain)
        self.crawl_external = crawl_external
        self.respect_robots = respect_robots
        self.include_extensions = set(include_extensions or [])
        self.exclude_extensions = set(exclude_extensions or [])
        self.include_patterns = [re.compile(p) for p in include_patterns if p]
        self.exclude_patterns = [re.compile(p) for p in exclude_patterns if p]
        self.robots_index = robots_index
        self.user_agent = user_agent

    def __call__(self, url: str) -> bool:
        parsed = urlparse(url)

        if not self.crawl_external:
            if strip_www(parsed.netloc) != self.base_domain_clean:
                return False

        if self.respect_robots and self.robots_index is not None:
            if not self.robots_index.can_fetch(self.user_agent, url):
                return False

        path = parsed.path.lower()
        if "." in path:
            extension = path.split(".")[-1]
            if extension in self.exclude_extensions:
                return False
            if self.include_extensions and extension not in self.include_extensions:
                return False

        for pattern in self.exclude_patterns:
            if pattern.search(url):
                return False

        if self.include_patterns:
            if not any(p.search(url) for p in self.include_patterns):
                return False

        return True

    def mask(self, urls) -> list[bool]:
        return [self(u) for u in urls]
