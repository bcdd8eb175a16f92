"""Single-threaded oracle crawler: a sequential replay of the reference's
crawl loop used to define expected outputs for the distributed engine.

Control flow replicated from /root/reference:
- seed normalization + path forces max_depth=0 (crawler.py:210-222)
- seed enqueue then sitemap expansion at depth 0 filtered by should-crawl
  (crawler.py:248-256, 305-320)
- FIFO deque + discovery-time dedup, first-discovery wins
  (link_manager.py:48-55, 165-182)
- per-URL: fetch (corpus lookup; miss -> create_empty_result with status 0,
  matching a requests exception at crawler.py:916-918), parse only when
  'text/html' in content-type, run all extractors, collect link records,
  extract outlinks when (internal or crawl_external) and depth < max_depth
  (crawler.py:890-902)
- dequeue skip when depth > max_depth (crawler.py:689-691); stop at
  max_urls crawled (crawler.py:680-681, 729-731)
- final linked_from backfill (crawler.py:1125-1137), link target_status
  join (link_manager.py:193-202), per-page issues at completion order
  (crawler.py:712-716), O(n^2) duplication detection at the end
  (issue_detector.py:315-375).

With concurrency the reference's *result append* order is nondeterministic;
its *dequeue* order is the deterministic contract (SURVEY.md §4). This
oracle is that contract, and the engine must reproduce it exactly.
"""
from __future__ import annotations

from collections import deque

from ..config import CrawlConfig
from ..functions.extract import empty_result, extract_page
from ..functions.urls import ShouldCrawl, is_internal, normalize_seed
from ..sources.sitemaps import discover_sitemap_urls


class SimCrawl:
    """Runs the oracle crawl; exposes results/links/issues/order/seen."""

    def __init__(self, fetch_map: dict[str, tuple[bytes, int, str]],
                 robots_index, sitemap_bodies: dict[str, bytes],
                 config: CrawlConfig):
        self.fetch_map = fetch_map
        self.robots = robots_index
        self.sitemap_bodies = sitemap_bodies
        self.config = config

        self.results: list[dict] = []
        self.links: list[dict] = []
        self.links_seen: set[str] = set()
        self.order: list[tuple[int, str, int]] = []  # (seq, url, depth)
        self.seen: set[str] = set()
        self.source_pages: dict[str, list[str]] = {}
        self.issues: list[dict] = []
        self.dup_issues: list[dict] = []

    def run(self, seed_url_raw: str) -> None:
        cfg = self.config
        seed_url, base_url, base_domain, has_path = normalize_seed(seed_url_raw)
        max_depth = 0 if has_path else cfg.max_depth
        self.base_domain = base_domain

        should_crawl = ShouldCrawl(
            base_domain, cfg.crawl_external, cfg.respect_robots,
            cfg.include_extensions, cfg.exclude_extensions,
            cfg.include_patterns, cfg.exclude_patterns,
            robots_index=self.robots, user_agent=cfg.user_agent)

        queue: deque[tuple[str, int]] = deque()
        # add_url: unconditional for the seed (crawler.py:248-250)
        self.seen.add(seed_url)
        queue.append((seed_url, 0))
        if cfg.discover_sitemaps:
            for url in discover_sitemap_urls(seed_url, self.sitemap_bodies, self.robots):
                if should_crawl(url) and url not in self.seen:
                    self.seen.add(url)
                    queue.append((url, 0))

        seq = 0
        while queue and len(self.results) < cfg.max_urls:
            url, depth = queue.popleft()
            if depth > max_depth:
                continue
            seq += 1
            self.order.append((seq, url, depth))
            result = self._crawl_one(url, depth, base_domain, max_depth,
                                     should_crawl, queue, seq)
            self.results.append(result)
            self._detect_issues(result)

        # finalization
        for r in self.results:
            r["linked_from"] = list(self.source_pages.get(r["url"], []))
        status_lookup = {r["url"]: r["status_code"] for r in self.results}
        for link in self.links:
            ts = status_lookup.get(link["target_url"])
            if ts is not None:
                link["target_status"] = ts

    def _crawl_one(self, url, depth, base_domain, max_depth, should_crawl,
                   queue, seq) -> dict:
        cfg = self.config
        hit = self.fetch_map.get(url)
        if hit is None:
            r = empty_result(url, depth, 0, "fetch failed: not in corpus")
            del r["error"]
            return r
        html, status, ct_header = hit
        if not cfg.enable_javascript and cfg.max_file_size > 0 \
                and len(html) > cfg.max_file_size:
            # S2 size pre-check (crawler.py:788-803); the JS path has no
            # size gate (crawler.py:920-983)
            r = empty_result(url, depth, 0, f"File too large: {len(html)} bytes")
            del r["error"]
            return r
        if cfg.enable_javascript:
            # JS mode (crawler.py:926-979): every URL rendered, content_type
            # hardcoded text/html, size = rendered byte length
            from ..stages.jsrender import render_html
            html = render_html(
                url, html.decode("utf-8", errors="replace")).encode()
            ct_header = "text/html"
        internal = is_internal(url, base_domain)
        result, link_records, outlinks = extract_page(
            html, url, depth, base_domain, status, ct_header, internal)
        if cfg.enable_javascript:
            result["javascript_rendered"] = True

        for rec in link_records:
            # source_pages tracked for every link record (link_manager.py:108-113)
            srcs = self.source_pages.setdefault(rec["target_url"], [])
            if url not in srcs:
                srcs.append(url)
            key = f"{rec['source_url']}|{rec['target_url']}"
            if key not in self.links_seen:
                self.links_seen.add(key)
                self.links.append(dict(rec, source_seq=seq))

        should_extract = ((internal and depth < max_depth)
                          or (cfg.crawl_external and depth < max_depth))
        if should_extract:
            for clean_url, _href in outlinks:
                srcs = self.source_pages.setdefault(clean_url, [])
                if url not in srcs:
                    srcs.append(url)
                if clean_url not in self.seen and clean_url != url:
                    if should_crawl(clean_url):
                        self.seen.add(clean_url)
                        queue.append((clean_url, depth + 1))
        return result

    # -- issues (shared rule implementation lives in pipelines.issues) ----
    def _detect_issues(self, result: dict) -> None:
        from ..pipelines.issues import detect_page_issues, path_excluded
        if path_excluded(result["url"], self.config.issue_exclusion_patterns):
            return
        self.issues.extend(detect_page_issues(result))

    def detect_duplication(self, subset_n: int | None = None) -> None:
        """O(n^2) duplication pass (issue_detector.py:315-375); optionally on
        the first ``subset_n`` results in crawl order (parity-sized)."""
        from ..pipelines.issues import duplication_issues
        results = self.results[:subset_n] if subset_n else self.results
        self.dup_issues = duplication_issues(
            results, self.config.duplication_threshold,
            self.config.issue_exclusion_patterns)
