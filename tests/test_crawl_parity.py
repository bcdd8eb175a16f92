"""Distributed engine vs sequential reference-replay oracle: dequeue order,
URL-seen set, link records, page fields, linked_from, issues — the parity
contract of BASELINE.json's north rule ("matching the reference's crawl
ordering and URL-seen set under the same seed list + politeness budget")."""
import os

import pyarrow.dataset as pads
import pytest


@pytest.fixture(scope="module")
def engine(crawl_output):
    pages = pads.dataset(f"{crawl_output}/pages").to_table().sort_by("rank")
    links = pads.dataset(f"{crawl_output}/links").to_table()
    return pages, links


def test_crawl_order_parity(engine, sim_result):
    pages, _ = engine
    eng = list(zip(pages["rank"].to_pylist(), pages["url"].to_pylist(),
                   pages["depth"].to_pylist()))
    sim = [(s - 1, u, d) for s, u, d in sim_result.order]
    assert eng == sim


def test_seen_set_parity(engine, sim_result):
    pages, _ = engine
    assert set(pages["url"].to_pylist()) == sim_result.seen


def test_depth_monotone_and_no_repeats(engine):
    pages, _ = engine
    depths = pages["depth"].to_pylist()
    assert depths == sorted(depths)      # BFS waves -> nondecreasing depth
    urls = pages["url"].to_pylist()
    assert len(urls) == len(set(urls))   # no URL crawled twice


def test_link_records_parity(engine, sim_result):
    _, links = engine
    eng = set(zip(links["source_url"].to_pylist(), links["target_url"].to_pylist(),
                  links["anchor_text"].to_pylist(), links["is_internal"].to_pylist(),
                  links["target_domain"].to_pylist(), links["placement"].to_pylist()))
    sim = set((x["source_url"], x["target_url"], x["anchor_text"],
               x["is_internal"], x["target_domain"], x["placement"])
              for x in sim_result.links)
    assert eng == sim


def test_page_fields_parity(engine, sim_result):
    pages, _ = engine
    sim_by_url = {r["url"]: r for r in sim_result.results}
    for r in pages.to_pylist():
        s = sim_by_url[r["url"]]
        for k in ("status_code", "content_type", "size", "is_internal", "depth",
                  "title", "meta_description", "h1", "h2", "h3", "word_count",
                  "lang", "charset", "viewport", "robots", "author", "keywords",
                  "generator", "theme_color", "canonical_url",
                  "internal_links", "external_links"):
            assert r[k] == s[k], (r["url"], k, r[k], s[k])
        assert dict(r["meta_tags"]) == s["meta_tags"]
        assert dict(r["og_tags"]) == s["og_tags"]
        assert dict(r["twitter_tags"]) == s["twitter_tags"]
        assert [dict(i) for i in r["images"]] == s["images"]
        assert [dict(h) for h in r["hreflang"]] == s["hreflang"]


def test_linked_from_parity(crawl_output, sim_result, ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.analysis import linked_from
    links_ds = ray.data.read_parquet(f"{crawl_output}/links")
    lf = linked_from(links_ds).to_pandas()
    got = dict(zip(lf["target_url"], lf["linked_from_joined"]))
    for r in sim_result.results:
        if r["linked_from"]:
            assert got.get(r["url"]) == "|".join(r["linked_from"]), r["url"]


def test_issue_parity(crawl_output, sim_result, ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.analysis import crawl_issues
    from seo_crawler_ray.sources.cache import flagship_config
    cfg = flagship_config()
    pages_ds = ray.data.read_parquet(f"{crawl_output}/pages")
    got = crawl_issues(pages_ds, cfg.issue_exclusion_patterns).to_pandas()
    eng = set(map(tuple, got[["url", "type", "category", "issue", "details"]]
                  .itertuples(index=False)))
    sim = set((x["url"], x["type"], x["category"], x["issue"], x["details"])
              for x in sim_result.issues)
    assert eng == sim


def test_duplication_parity(crawl_output, sim_result, ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.analysis import duplication_issues_distributed
    from seo_crawler_ray.sources.cache import flagship_config
    cfg = flagship_config()
    sim_result.detect_duplication(subset_n=100)
    pages_ds = ray.data.read_parquet(f"{crawl_output}/pages")
    got = duplication_issues_distributed(
        pages_ds, cfg.duplication_threshold, cfg.issue_exclusion_patterns, 100)
    eng = set(map(tuple, got.itertuples(index=False))) if len(got) else set()
    sim = set((x["url"], x["type"], x["category"], x["issue"], x["details"])
              for x in sim_result.dup_issues)
    assert eng == sim


def test_compact_and_distributed_paths_identical(ray_session, tiny_corpus,
                                                 tmp_path):
    """The driver-side compact frontier path and the distributed
    groupby+sort path must produce identical crawls."""
    from seo_crawler_ray.pipelines.crawl import CrawlJob
    from seo_crawler_ray.sources.cache import flagship_config

    outs = {}
    for name, threshold in (("compact", 10 ** 9), ("distributed", 0)):
        cfg = flagship_config(seen_shards=2, politeness_shards=2,
                              wave_compact_threshold=threshold)
        out = str(tmp_path / name)
        CrawlJob(tiny_corpus, out, cfg).run()
        pages = pads.dataset(f"{out}/pages").to_table().sort_by("rank")
        outs[name] = list(zip(pages["rank"].to_pylist(),
                              pages["url"].to_pylist(),
                              pages["depth"].to_pylist()))
    assert outs["compact"] == outs["distributed"]
    assert len(outs["compact"]) > 100


def test_priority_mode_same_url_set(ray_session, tiny_corpus, tmp_path,
                                    sim_result):
    """mode='priority' reorders waves by (politeness deadline, priority) but
    must visit exactly the same URL set as parity mode / the oracle."""
    from seo_crawler_ray.pipelines.crawl import CrawlJob
    from seo_crawler_ray.sources.cache import flagship_config

    cfg = flagship_config(seen_shards=2, politeness_shards=2,
                          hot_host_threshold=50)  # force salting on hot host
    out = str(tmp_path / "prio")
    CrawlJob(tiny_corpus, out, cfg, mode="priority").run()
    pages = pads.dataset(f"{out}/pages").to_table()
    assert set(pages["url"].to_pylist()) == sim_result.seen
    depths = dict(zip(pages["url"].to_pylist(), pages["depth"].to_pylist()))
    for _, u, d in sim_result.order:
        assert depths[u] == d


def test_priority_mode_distributed_path(ray_session, tiny_corpus, tmp_path,
                                        sim_result):
    from seo_crawler_ray.pipelines.crawl import CrawlJob
    from seo_crawler_ray.sources.cache import flagship_config

    cfg = flagship_config(seen_shards=2, politeness_shards=2,
                          hot_host_threshold=50, wave_compact_threshold=0)
    out = str(tmp_path / "prio_dist")
    CrawlJob(tiny_corpus, out, cfg, mode="priority").run()
    pages = pads.dataset(f"{out}/pages").to_table()
    assert set(pages["url"].to_pylist()) == sim_result.seen


def test_bucketed_corpus_mode_identical(ray_session, tiny_corpus, tmp_path):
    """corpus_mode='bucketed' (hash-bucket parquet fetch) must produce the
    same crawl as the broadcast object-store fetch."""
    from seo_crawler_ray.pipelines.crawl import CrawlJob
    from seo_crawler_ray.sources.cache import flagship_config

    outs = {}
    # bucketed+distributed = the at-scale configuration (threshold=0 forces
    # the distributed frontier path incl. the bucket-realignment exchange)
    for name, mode, thresh in (("broadcast", "broadcast", 10 ** 9),
                               ("bucketed", "bucketed", 10 ** 9),
                               ("bucketed_dist", "bucketed", 0),
                               ("offset", "offset", 10 ** 9),
                               ("offset_dist", "offset", 0)):
        cfg = flagship_config(seen_shards=2, politeness_shards=2,
                              corpus_mode=mode, corpus_buckets=16,
                              wave_compact_threshold=thresh)
        out = str(tmp_path / name)
        CrawlJob(tiny_corpus, out, cfg).run()
        pages = pads.dataset(f"{out}/pages").to_table().sort_by("rank")
        outs[name] = list(zip(pages["rank"].to_pylist(),
                              pages["url"].to_pylist()))
    assert outs["broadcast"] == outs["bucketed"]
    assert outs["broadcast"] == outs["bucketed_dist"]
    assert outs["broadcast"] == outs["offset"]
    assert outs["broadcast"] == outs["offset_dist"]


def test_offset_store_lookup_matches_broadcast(ray_session, tiny_corpus,
                                               tmp_path):
    """The CDX-style offset store must serve lookups identical to the
    broadcast fetcher for every corpus URL plus a miss, and its build must
    write the per-bucket bin+index layout atomically."""
    import pyarrow.parquet as pq
    from seo_crawler_ray.sources.corpus_store import BroadcastFetcher
    from seo_crawler_ray.sources.offset_store import (OffsetFetcher,
                                                      build_offset_store)

    store = build_offset_store(tiny_corpus, str(tmp_path / "ofs"), 16)
    assert os.path.exists(os.path.join(store, "_OK"))

    pages = pq.read_table(os.path.join(tiny_corpus, "pages.parquet"),
                          columns=["url", "html"])
    meta = pq.read_table(os.path.join(tiny_corpus, "meta.parquet"),
                         columns=["status_code", "content_type_header"])
    corpus = pages.append_column("status_code", meta["status_code"]) \
                  .append_column("content_type_header",
                                 meta["content_type_header"])
    urls = corpus["url"].to_pylist() + ["https://nowhere.example/miss"]
    got = OffsetFetcher(store, 16).lookup(urls)
    want = BroadcastFetcher(corpus).lookup(urls)
    assert got == want
    assert got[-1] is None


def test_offset_store_build_crash_safe_and_idempotent(ray_session,
                                                      tiny_corpus, tmp_path):
    """A crash mid-build leaves a .building dir without _OK; the next build
    must discard it and produce a correct store, and a repeat call must
    return the finished store without rebuilding (marker contract)."""
    from seo_crawler_ray.sources.offset_store import (OffsetFetcher,
                                                      build_offset_store)
    out = str(tmp_path / "ofs_crash")
    stale = os.path.join(out, "offsets=8.building")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "parts"), "w") as f:
        f.write("garbage where a directory should be")

    store = build_offset_store(tiny_corpus, out, 8)
    assert os.path.exists(os.path.join(store, "_OK"))
    got = OffsetFetcher(store, 8).lookup(["https://nowhere.example/miss"])
    assert got == [None]

    before = os.path.getmtime(os.path.join(store, "_OK"))
    assert build_offset_store(tiny_corpus, out, 8) == store
    assert os.path.getmtime(os.path.join(store, "_OK")) == before


def test_bucketed_store_build_is_distributed(ray_session, tiny_corpus,
                                             tmp_path, monkeypatch):
    """The one-time bucket build must run as Ray Data pipelines (blocks
    stream through write_parquet), never a driver-side read of the whole
    corpus: pq.read_table on the driver during the build is a scale bug at
    a 100 TB corpus. The resulting store must serve lookups identical to
    the broadcast fetcher for every corpus URL plus a miss."""
    import pyarrow.parquet as pq
    from seo_crawler_ray.sources import corpus_store as cs
    from seo_crawler_ray.sources.corpus_store import (
        BroadcastFetcher, BucketedFetcher, build_bucketed_store)

    def _forbid(*a, **k):
        raise AssertionError("driver-side pq.read_table during bucket build")
    monkeypatch.setattr(cs.pq, "read_table", _forbid)
    store = build_bucketed_store(tiny_corpus, str(tmp_path / "b"), 16)
    monkeypatch.undo()

    assert os.path.exists(os.path.join(store, "_OK"))
    assert os.path.isdir(os.path.join(store, "pages"))

    pages = pq.read_table(os.path.join(tiny_corpus, "pages.parquet"),
                          columns=["url", "html"])
    meta = pq.read_table(os.path.join(tiny_corpus, "meta.parquet"),
                         columns=["status_code", "content_type_header"])
    corpus = pages.append_column("status_code", meta["status_code"]) \
                  .append_column("content_type_header",
                                 meta["content_type_header"])
    urls = corpus["url"].to_pylist() + ["https://nowhere.example/miss"]
    got = BucketedFetcher(store, 16).lookup(urls)
    want = BroadcastFetcher(corpus).lookup(urls)
    assert got == want
    assert got[-1] is None


def test_caps_max_urls_and_depth(ray_session, tiny_corpus, tmp_path,
                                 sim_result):
    """max_urls stops the crawl at exactly N in FIFO order (an order
    prefix of the unlimited oracle); max_depth bounds expansion."""
    from seo_crawler_ray.pipelines.crawl import CrawlJob
    from seo_crawler_ray.sources.cache import flagship_config

    cfg = flagship_config(max_urls=50, seen_shards=2, politeness_shards=2)
    out = str(tmp_path / "capped")
    CrawlJob(tiny_corpus, out, cfg).run()
    pages = pads.dataset(f"{out}/pages").to_table().sort_by("rank")
    assert pages.num_rows == 50
    prefix = [u for _, u, _ in sim_result.order[:50]]
    assert pages["url"].to_pylist() == prefix

    cfg2 = flagship_config(max_depth=1, seen_shards=2, politeness_shards=2)
    out2 = str(tmp_path / "depth1")
    CrawlJob(tiny_corpus, out2, cfg2).run()
    pages2 = pads.dataset(f"{out2}/pages").to_table()
    assert max(pages2["depth"].to_pylist()) <= 1


def test_config_validation_rejects_bad():
    import pytest as _pytest
    from seo_crawler_ray.config import CrawlConfig
    from seo_crawler_ray.pipelines.crawl import CrawlJob

    bad = CrawlConfig(delay=-3)
    assert any("delay" in p for p in bad.validate())
    bad2 = CrawlConfig(user_agent="   ")
    assert bad2.validate()
    bad3 = CrawlConfig(exclude_patterns=["[unclosed"])
    assert any("invalid regex" in p for p in bad3.validate())
    assert CrawlConfig().validate() == []
    with _pytest.raises(ValueError):
        CrawlJob("/nonexistent", "/tmp/x", CrawlConfig(delay=-1), seed_url="x.com")


def test_seed_with_path_forces_single_page(ray_session, tiny_corpus, tmp_path):
    """A seed URL with a non-root path forces max_depth=0 (crawler.py:218-222):
    the crawl fetches exactly that page (plus nothing else)."""
    import pyarrow.parquet as pq
    from seo_crawler_ray.pipelines.crawl import CrawlJob
    from seo_crawler_ray.sources.cache import flagship_config

    meta = pq.read_table(f"{tiny_corpus}/meta.parquet").to_pylist()
    target = next(m["url"] for m in meta
                  if m["kind"] == "page" and m["host"] == "www.hot-site.example")
    cfg = flagship_config(seen_shards=2, politeness_shards=2,
                          discover_sitemaps=False)
    out = str(tmp_path / "single")
    CrawlJob(tiny_corpus, out, cfg, seed_url=target).run()
    pages = pads.dataset(f"{out}/pages").to_table()
    assert pages.num_rows == 1
    assert pages["url"].to_pylist() == [target]


def test_approx_seen_mode_close_to_exact(ray_session, tiny_corpus, tmp_path,
                                         sim_result):
    """seen_exact=False (cuckoo-filter-only membership — the 10^10-scale
    mode) may drop a URL on a false positive, never crawl one twice; at the
    filter's FP rate the crawl should be near-identical to exact mode."""
    from seo_crawler_ray.pipelines.crawl import CrawlJob
    from seo_crawler_ray.sources.cache import flagship_config

    cfg = flagship_config(seen_shards=2, politeness_shards=2, seen_exact=False)
    out = str(tmp_path / "approx")
    CrawlJob(tiny_corpus, out, cfg).run()
    pages = pads.dataset(f"{out}/pages").to_table()
    urls = pages["url"].to_pylist()
    assert len(urls) == len(set(urls))           # never twice
    extra = set(urls) - sim_result.seen
    missing = sim_result.seen - set(urls)
    assert not extra                             # FP can only DROP urls
    assert len(missing) <= max(2, len(sim_result.seen) // 100)


def test_max_file_size_gate(ray_session, tiny_corpus, tmp_path, sim_result):
    """S2 (crawler.py:788-803): bodies over max_file_size produce empty
    results (status 0, no links, no expansion) — engine vs oracle."""
    import pyarrow.parquet as pq
    from seo_crawler_ray.oracle.sim import SimCrawl
    from seo_crawler_ray.pipelines.crawl import CrawlJob
    from seo_crawler_ray.sources.cache import flagship_config
    from seo_crawler_ray.sources.sitemaps import load_sitemap_bodies
    from seo_crawler_ray.state.robots import RobotsIndex

    cfg = flagship_config(max_file_size=20_000, seen_shards=2,
                          politeness_shards=2)
    out = str(tmp_path / "sized")
    CrawlJob(tiny_corpus, out, cfg).run()
    pages = pads.dataset(f"{out}/pages").to_table().sort_by("rank")

    p = pq.read_table(f"{tiny_corpus}/pages.parquet").to_pylist()
    meta = {r["url"]: r for r in
            pq.read_table(f"{tiny_corpus}/meta.parquet").to_pylist()}
    fetch_map = {x["url"]: (x["html"], meta[x["url"]]["status_code"],
                            meta[x["url"]]["content_type_header"]) for x in p}
    sim = SimCrawl(fetch_map, RobotsIndex.from_parquet(f"{tiny_corpus}/robots.parquet"),
                   load_sitemap_bodies(f"{tiny_corpus}/sitemaps.parquet"), cfg)
    sim.run("www.hot-site.example")
    assert list(zip(pages["url"].to_pylist(), pages["depth"].to_pylist())) == \
        [(u, d) for _, u, d in sim.order]
    # the gate actually fired: some big page got an empty result
    zeroed = [r for r in pages.to_pylist()
              if r["status_code"] == 0 and r["url"] in fetch_map]
    assert zeroed and all(r["word_count"] == 0 for r in zeroed)


def test_priority_distributed_budget_exhausted(ray_session, tiny_corpus,
                                               tmp_path):
    """max_urls exhausted on a distributed-path priority wave used to drop
    nonexistent deadline columns and raise; it must just stop cleanly at
    the budget."""
    from seo_crawler_ray.pipelines.crawl import CrawlJob
    from seo_crawler_ray.sources.cache import flagship_config

    cfg = flagship_config(seen_shards=2, politeness_shards=2,
                          wave_compact_threshold=0, max_urls=80)
    out = str(tmp_path / "prio_budget")
    summary = CrawlJob(tiny_corpus, out, cfg, mode="priority").run()
    assert summary["crawled_total"] >= 80          # stopped by budget
    pages = pads.dataset(f"{out}/pages").to_table()
    assert pages.num_rows == summary["crawled_total"]


def test_js_mode_crawl_parity(ray_session, tiny_corpus, tmp_path):
    """enable_javascript (VERDICT r02 missing #1): the crawl loop renders
    every URL (crawler.py:775-777, 920-983) — content_type hardcoded
    text/html, size = rendered bytes, javascript_rendered=True on rendered
    rows — and the distributed engine must match the sequential oracle
    in JS mode exactly (order, rendered flags, sizes, extracted fields
    from the RENDERED html)."""
    import os

    import pyarrow.parquet as pq
    from seo_crawler_ray.oracle.sim import SimCrawl
    from seo_crawler_ray.pipelines.crawl import CrawlJob
    from seo_crawler_ray.sources.cache import flagship_config
    from seo_crawler_ray.sources.sitemaps import load_sitemap_bodies
    from seo_crawler_ray.stages.jsrender import RENDER_MARKER
    from seo_crawler_ray.state.robots import RobotsIndex

    cfg = flagship_config(enable_javascript=True, seen_shards=2,
                          politeness_shards=2)

    pages_t = pq.read_table(os.path.join(tiny_corpus, "pages.parquet")).to_pylist()
    meta = {r["url"]: r for r in
            pq.read_table(os.path.join(tiny_corpus, "meta.parquet")).to_pylist()}
    fetch_map = {p["url"]: (p["html"], meta[p["url"]]["status_code"],
                            meta[p["url"]]["content_type_header"])
                 for p in pages_t}
    robots = RobotsIndex.from_parquet(os.path.join(tiny_corpus, "robots.parquet"))
    sm = load_sitemap_bodies(os.path.join(tiny_corpus, "sitemaps.parquet"))
    sim = SimCrawl(fetch_map, robots, sm, cfg)
    sim.run("www.hot-site.example")

    out = str(tmp_path / "js_crawl")
    CrawlJob(tiny_corpus, out, cfg).run()
    pages = pads.dataset(f"{out}/pages").to_table().sort_by("rank")

    eng_order = list(zip(pages["rank"].to_pylist(), pages["url"].to_pylist()))
    sim_order = [(s - 1, u) for s, u, _ in sim.order]
    assert eng_order == sim_order

    sim_by_url = {r["url"]: r for r in sim.results}
    n_rendered = 0
    for r in pages.to_pylist():
        s = sim_by_url[r["url"]]
        for k in ("status_code", "content_type", "size", "title", "h1",
                  "word_count", "internal_links", "external_links",
                  "javascript_rendered"):
            assert r[k] == s[k], (r["url"], k, r[k], s[k])
        if r["javascript_rendered"]:
            n_rendered += 1
            assert r["content_type"] == "text/html"
    # every successfully fetched page was rendered; only corpus misses not
    assert n_rendered == sum(1 for r in sim.results
                             if r.get("javascript_rendered"))
    assert n_rendered > 0

    # rendered size strictly exceeds the raw corpus html (marker injected)
    some = next(r for r in sim.results if r.get("javascript_rendered"))
    raw_len = len(fetch_map[some["url"]][0])
    assert some["size"] > raw_len
    assert RENDER_MARKER.encode() not in fetch_map[some["url"]][0]
