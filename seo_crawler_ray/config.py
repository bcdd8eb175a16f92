"""Crawl job configuration.

Defaults mirror the reference's default config
(/root/reference/src/crawler.py:93-145) with the web-app-only knobs
(proxy, JS browser, PageSpeed API) dropped and the scale knobs
(shards, batch sizes, wave caps) added for the Ray engine.
"""
from __future__ import annotations

from dataclasses import dataclass, field

DEFAULT_ISSUE_EXCLUSION_PATTERNS = [
    # WordPress admin & system paths (crawler.py:129-143)
    "/wp-admin/*", "/wp-content/plugins/*", "/wp-content/themes/*",
    "/wp-content/uploads/*", "/wp-includes/*", "/wp-login.php", "/wp-cron.php",
    "/xmlrpc.php", "/wp-json/*", "/wp-activate.php", "/wp-signup.php",
    "/wp-trackback.php",
    # Auth & user management pages
    "/login*", "/signin*", "/sign-in*", "/log-in*", "/auth/*", "/authenticate/*",
    "/register*", "/signup*", "/sign-up*", "/registration/*",
    "/logout*", "/signout*", "/sign-out*", "/log-out*",
    "/forgot-password*", "/reset-password*", "/password-reset*",
    "/recover-password*", "/change-password*", "/account/password/*",
    "/user/password/*",
    "*.map", "*.min.js", "*.min.css",
]


@dataclass
class CrawlConfig:
    # reference-parity knobs (crawler.py:95-145)
    max_depth: int = 3
    max_urls: int = 1000
    delay: float = 1.0
    crawl_external: bool = False
    respect_robots: bool = True
    user_agent: str = "LibreCrawl/1.0 (Web Crawler)"
    include_extensions: list[str] = field(
        default_factory=lambda: ["html", "htm", "php", "asp", "aspx", "jsp"])
    exclude_extensions: list[str] = field(
        default_factory=lambda: ["pdf", "doc", "docx", "zip", "exe", "dmg"])
    include_patterns: list[str] = field(default_factory=list)
    exclude_patterns: list[str] = field(default_factory=list)
    max_file_size: int = 50 * 1024 * 1024
    # JS mode (crawler.py:282-284, 775-777): when on, EVERY crawled URL is
    # rendered (the reference has no per-URL selection in the loop — its
    # should_use_javascript helper is dead code), content_type is reported
    # as text/html, size is the rendered byte length, and page rows carry
    # javascript_rendered=True. The real browser is environment-gated; the
    # simulation renders deterministically (stages/jsrender.py).
    enable_javascript: bool = False
    js_max_concurrent_pages: int = 3
    discover_sitemaps: bool = True
    enable_duplication_check: bool = True
    duplication_threshold: float = 0.85
    issue_exclusion_patterns: list[str] = field(
        default_factory=lambda: list(DEFAULT_ISSUE_EXCLUSION_PATTERNS))

    # Ray engine knobs (no reference equivalent)
    corpus_mode: str = "auto"      # "auto" picks by corpus size: "broadcast"
                                   # (one ray.put, fits object store) below
                                   # corpus_broadcast_limit bytes on disk,
                                   # else "bucketed" (hash(url)%B parquet
                                   # buckets fetched per batch)
    corpus_broadcast_limit: int = 2 << 30
    corpus_buckets: int = 0        # 0 = auto: corpus bytes / target bucket
                                   # size, so buckets stay worker-heap-sized
                                   # at any corpus scale (a FIXED count
                                   # would mean 1.5 TB buckets at 100 TB)
    corpus_bucket_bytes: int = 256 << 20   # auto mode's target bucket size
    seen_shards: int = 8           # URL-seen actor shards; scale with cluster size
    seen_capacity: int = 1 << 20   # per-shard cuckoo capacity; 10^10-URL deployments size this up
    seen_exact: bool = True        # keep exact 64-bit spill set alongside the filter (parity mode)
    seen_checkpoint: str = "full"  # "full" snapshot per wave, or "delta"
                                   # (only keys added this wave; the
                                   # 10^10-scale mode — restore replays)
    extract_batch_size: int = 64   # HTML rows per batch (wide binary rows -> small
                                   # batches; keeps multi-MB pages from straggling)
    extract_plain_threshold: int = 16384  # frontier rows below which the wave's
                                   # extract runs as plain Ray tasks over the
                                   # staged blocks instead of a Dataset
                                   # execution (same batch fn, same sinks;
                                   # skips the executor's per-wave fixed cost
                                   # that dominates tiny waves)
    extract_concurrency: int | None = None  # actor pool size; None -> tasks sized by Ray
    politeness_shards: int = 4
    hot_host_salt: int = 8         # sub-shards for hosts exceeding the skew threshold
    hot_host_threshold: int = 5000  # frontier rows per host per wave before salting kicks in
    # candidate rows below which the next-frontier collapse runs on the
    # driver (one dict pass + one batched shard-RPC round) instead of the
    # distributed groupby+sort — the broadcast-join-threshold idea applied
    # to tiny waves, whose all-to-all fixed cost would dominate
    wave_compact_threshold: int = 2_000_000

    def validate(self) -> list[str]:
        """Range validation mirroring the reference's settings validator
        (/root/reference/src/settings_manager.py:416-471). The crawl-size
        cap is intentionally NOT enforced at the reference's 5M — this
        engine is sized for 10^10-URL frontiers — but the reference bound is
        reported as a warning-style entry so a user migrating configs sees
        it. Returns a list of violation strings (empty = valid)."""
        problems: list[str] = []

        def rng(name, value, lo, hi):
            if not isinstance(value, (int, float)) or value < lo or value > hi:
                problems.append(f"{name}={value!r} outside [{lo}, {hi}]")

        rng("max_depth", self.max_depth, 0, 1000)
        rng("max_urls", self.max_urls, 1, 10 ** 12)
        rng("delay", self.delay, 0, 60)          # crawlDelay 0..60
        rng("duplication_threshold", self.duplication_threshold, 0.0, 1.0)
        rng("seen_shards", self.seen_shards, 1, 65536)
        rng("seen_capacity", self.seen_capacity, 1024, 1 << 40)
        rng("extract_batch_size", self.extract_batch_size, 1, 1 << 20)
        rng("politeness_shards", self.politeness_shards, 1, 65536)
        rng("hot_host_salt", self.hot_host_salt, 1, 4096)
        if not self.user_agent.strip():
            problems.append("user_agent must be non-empty")
        for name in ("include_extensions", "exclude_extensions",
                     "include_patterns", "exclude_patterns",
                     "issue_exclusion_patterns"):
            if not isinstance(getattr(self, name), list):
                problems.append(f"{name} must be a list")
        import re as _re
        for pat in (self.include_patterns + self.exclude_patterns):
            try:
                _re.compile(pat)
            except _re.error as e:
                problems.append(f"invalid regex {pat!r}: {e}")
        return problems
