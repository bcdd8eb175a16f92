"""Cached corpus / expected-output / crawl-output management.

The driver hands query callables a TPC-H-style ``sf_dir``
(/root/testdata/sfX); the crawl engine's input is the synthetic web corpus
of ``corpus.py``, sized from the scale factor in the directory name
(n_pages = 600_000 * sf, floor 200). Corpora, oracle-sim expected outputs
and engine crawl outputs are generated once per scale under /tmp and reused
across queries/tests — all deterministic (seed 42), built atomically
(tmp dir + rename) so concurrent callers can't observe partial state.

GEN_VERSION must be bumped whenever generator/oracle/engine semantics
change, invalidating stale caches.
"""
from __future__ import annotations

import json
import os
import re
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from ..config import CrawlConfig
from .corpus import generate_corpus

GEN_VERSION = "r3-1"   # r3: javascript_rendered column in pages schema
CACHE_ROOT = "/tmp/seo_ray_cache"
EXPECTED_MAX_PAGES = 12_000  # oracle sim runs at test/correctness
                             # scales (sf<=0.02); bench scale skips it
DUP_SUBSET = 300            # parity-sized O(n^2) duplication window

FLAGSHIP = dict(max_depth=12, max_urls=10 ** 9, crawl_external=True)


def flagship_config(**overrides) -> CrawlConfig:
    kw = dict(FLAGSHIP)
    kw.update(overrides)
    return CrawlConfig(**kw)


def sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"


def n_pages_for(sf_dir: str) -> int:
    m = re.search(r"sf([0-9.]+)", sf_name(sf_dir))
    sf = float(m.group(1)) if m else 0.01
    return max(200, int(600_000 * sf))


def _ok_marker(d: str) -> str:
    return os.path.join(d, "_OK")


def _is_fresh(d: str) -> bool:
    try:
        with open(_ok_marker(d)) as f:
            return f.read().strip() == GEN_VERSION
    except OSError:
        return False


def _atomic_build(final_dir: str, build_fn) -> str:
    if _is_fresh(final_dir):
        return final_dir
    tmp = final_dir + ".building"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    build_fn(tmp)
    with open(_ok_marker(tmp), "w") as f:
        f.write(GEN_VERSION)
    try:
        os.rename(tmp, final_dir)
    except OSError:  # lost the race; another process finished first
        shutil.rmtree(tmp, ignore_errors=True)
    return final_dir


def corpus_dir(sf_dir: str) -> str:
    """Generate (once) and return the corpus directory for this scale."""
    name = sf_name(sf_dir)
    final = os.path.join(CACHE_ROOT, "corpus", name)
    n = n_pages_for(sf_dir)

    def build(tmp):
        generate_corpus(tmp, n)
        if n <= EXPECTED_MAX_PAGES:
            _write_expected(tmp)

    return _atomic_build(final, build)


def crawl_dir(sf_dir: str) -> str:
    """Run (once) the flagship distributed crawl for this scale; return its
    output directory. Requires an initialized Ray (driver provides it)."""
    from ..pipelines.crawl import CrawlJob
    name = sf_name(sf_dir)
    cdir = corpus_dir(sf_dir)
    final = os.path.join(CACHE_ROOT, "crawl", name)

    def build(tmp):
        job = CrawlJob(cdir, tmp, flagship_config())
        job.run()

    return _atomic_build(final, build)


# -- expected outputs from the sequential oracle --------------------------

def _write_expected(cdir: str) -> None:
    from ..oracle.sim import SimCrawl
    from ..pipelines.issues import path_excluded
    from ..sources.sitemaps import load_sitemap_bodies
    from ..state.robots import RobotsIndex

    pages = pq.read_table(os.path.join(cdir, "pages.parquet"),
                          columns=["url", "html"])
    meta = pq.read_table(os.path.join(cdir, "meta.parquet"))
    stat = dict(zip(meta["url"].to_pylist(),
                    zip(meta["status_code"].to_pylist(),
                        meta["content_type_header"].to_pylist())))
    fetch_map = {u: (h, *stat[u]) for u, h in
                 zip(pages["url"].to_pylist(), pages["html"].to_pylist())}
    robots = RobotsIndex.from_parquet(os.path.join(cdir, "robots.parquet"))
    sitemaps = load_sitemap_bodies(os.path.join(cdir, "sitemaps.parquet"))
    with open(os.path.join(cdir, "corpus_meta.json")) as f:
        seed_url = json.load(f)["seed_url"]

    cfg = flagship_config()
    sim = SimCrawl(fetch_map, robots, sitemaps, cfg)
    sim.run(seed_url)
    sim.detect_duplication(subset_n=DUP_SUBSET)

    # expected_order / expected_seen
    pq.write_table(pa.table({
        "seq": [s for s, _, _ in sim.order],
        "url": [u for _, u, _ in sim.order],
        "depth": [d for _, _, d in sim.order],
    }), os.path.join(cdir, "expected_order.parquet"))
    pq.write_table(pa.table({"url": sorted(sim.seen)}),
                   os.path.join(cdir, "expected_seen.parquet"))

    # expected_pages (flattened for SQL oracles)
    seq_of = {u: s for s, u, _ in sim.order}
    rows = []
    for r in sim.results:
        a = r["analytics"]
        rows.append({
            "url": r["url"], "seq": seq_of[r["url"]], "depth": r["depth"],
            "status_code": r["status_code"], "content_type": r["content_type"],
            "size": r["size"], "is_internal": r["is_internal"],
            "title": r["title"], "meta_description": r["meta_description"],
            "h1": r["h1"],
            "h2_joined": " | ".join(r["h2"]), "h3_joined": " | ".join(r["h3"]),
            "word_count": r["word_count"], "lang": r["lang"],
            "charset": r["charset"], "viewport": r["viewport"],
            "robots": r["robots"], "author": r["author"],
            "keywords": r["keywords"], "generator": r["generator"],
            "theme_color": r["theme_color"], "canonical_url": r["canonical_url"],
            "og_title": r["og_tags"].get("title", ""),
            "og_author": r["og_tags"].get("author", ""),
            "twitter_card": r["twitter_tags"].get("card", ""),
            "has_og": bool(r["og_tags"]), "has_twitter": bool(r["twitter_tags"]),
            "json_ld_count": len(r["json_ld"]),
            "schema_org_count": len(r["schema_org"]),
            "n_images": len(r["images"]),
            "images_without_alt": sum(1 for im in r["images"] if not im.get("alt")),
            "internal_links": r["internal_links"],
            "external_links": r["external_links"],
            "ga4_id": a["ga4_id"], "gtm_id": a["gtm_id"],
            "google_analytics": a["google_analytics"],
            "facebook_pixel": a["facebook_pixel"], "hotjar": a["hotjar"],
            "mixpanel": a["mixpanel"],
            "response_time": float(r["response_time"]),
            "javascript_rendered": bool(r.get("javascript_rendered", False)),
            "linked_from_joined": "|".join(r["linked_from"]),
            "issue_excluded": path_excluded(r["url"], cfg.issue_exclusion_patterns),
        })
    pq.write_table(
        pa.table({k: [x[k] for x in rows] for k in rows[0]}),
        os.path.join(cdir, "expected_pages.parquet"))

    # expected_links
    lk = sim.links
    pq.write_table(pa.table({
        "source_url": [x["source_url"] for x in lk],
        "target_url": [x["target_url"] for x in lk],
        "anchor_text": [x["anchor_text"] for x in lk],
        "is_internal": [x["is_internal"] for x in lk],
        "target_domain": [x["target_domain"] for x in lk],
        "target_status": pa.array([x["target_status"] for x in lk], pa.int32()),
        "placement": [x["placement"] for x in lk],
        "source_seq": [x["source_seq"] for x in lk],
    }), os.path.join(cdir, "expected_links.parquet"))

    def _issue_table(issues):
        return pa.table({k: [x[k] for x in issues]
                         for k in ("url", "type", "category", "issue", "details")}) \
            if issues else pa.table({k: pa.array([], pa.string())
                                     for k in ("url", "type", "category", "issue", "details")})

    pq.write_table(_issue_table(sim.issues),
                   os.path.join(cdir, "expected_issues.parquet"))
    pq.write_table(_issue_table(sim.dup_issues),
                   os.path.join(cdir, "expected_dup_issues.parquet"))
