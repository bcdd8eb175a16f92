"""Sitemap discovery/parse against the simulated web.

Mirrors /root/reference/src/core/sitemap_parser.py: probe the four
well-known paths plus robots ``Sitemap:`` declarations
(sitemap_parser.py:26-35), recursively walk sitemap indexes to depth 10
(sitemap_parser.py:68-132), gunzip ``.gz`` bodies (sitemap_parser.py:86-92).
Fetches are lookups into the corpus ``sitemaps.parquet`` table.
"""
from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
from urllib.parse import urlparse


def discover_sitemap_urls(base_url: str, sitemap_bodies: dict[str, bytes],
                          robots_index) -> list[str]:
    parsed = urlparse(base_url)
    base_domain = f"{parsed.scheme}://{parsed.netloc}"
    sitemap_urls = [
        f"{base_domain}/sitemap.xml",
        f"{base_domain}/sitemap_index.xml",
        f"{base_domain}/sitemaps.xml",
        f"{base_domain}/sitemap/sitemap.xml",
    ]
    sitemap_urls.extend(robots_index.sitemap_lines(parsed.netloc))

    all_urls: list[str] = []
    for sm_url in sitemap_urls:
        all_urls.extend(_parse_sitemap(sm_url, sitemap_bodies, depth=1))
    return all_urls


def _parse_sitemap(sitemap_url: str, bodies: dict[str, bytes],
                   depth: int, max_depth: int = 10) -> list[str]:
    if depth > max_depth:
        return []
    content = bodies.get(sitemap_url)
    if content is None:
        return []
    if sitemap_url.endswith(".gz"):
        try:
            content = gzip.decompress(content)
        except Exception:
            pass
    try:
        root = ET.fromstring(content)
    except ET.ParseError:
        return []
    for elem in root.iter():
        if "}" in elem.tag:
            elem.tag = elem.tag.split("}")[1]

    all_urls: list[str] = []
    sitemaps = root.findall(".//sitemap")
    if sitemaps:
        for sm in sitemaps:
            loc = sm.find("loc")
            if loc is not None and loc.text:
                all_urls.extend(_parse_sitemap(loc.text.strip(), bodies,
                                               depth + 1, max_depth))
    for url_elem in root.findall(".//url"):
        loc = url_elem.find("loc")
        if loc is not None and loc.text:
            all_urls.append(loc.text.strip())
    return all_urls


def load_sitemap_bodies(path: str) -> dict[str, bytes]:
    import pyarrow.parquet as pq
    t = pq.read_table(path)
    return dict(zip(t["url"].to_pylist(), t["xml"].to_pylist()))
