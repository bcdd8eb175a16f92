import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """A 200-page corpus with all the generator's edge cases."""
    from seo_crawler_ray.sources.corpus import generate_corpus
    d = str(tmp_path_factory.mktemp("corpus"))
    generate_corpus(d, 200)
    return d


@pytest.fixture(scope="session")
def sim_result(tiny_corpus):
    """Sequential-oracle crawl over the tiny corpus (flagship config)."""
    from seo_crawler_ray.sources.cache import flagship_config
    from seo_crawler_ray.oracle.sim import SimCrawl
    from seo_crawler_ray.state.robots import RobotsIndex
    from seo_crawler_ray.sources.sitemaps import load_sitemap_bodies
    import pyarrow.parquet as pq
    import os as _os

    pages = pq.read_table(_os.path.join(tiny_corpus, "pages.parquet")).to_pylist()
    meta = {r["url"]: r for r in
            pq.read_table(_os.path.join(tiny_corpus, "meta.parquet")).to_pylist()}
    fetch_map = {p["url"]: (p["html"], meta[p["url"]]["status_code"],
                            meta[p["url"]]["content_type_header"]) for p in pages}
    robots = RobotsIndex.from_parquet(_os.path.join(tiny_corpus, "robots.parquet"))
    sm = load_sitemap_bodies(_os.path.join(tiny_corpus, "sitemaps.parquet"))
    sim = SimCrawl(fetch_map, robots, sm, flagship_config())
    sim.run("www.hot-site.example")
    return sim


@pytest.fixture(scope="session")
def crawl_output(ray_session, tiny_corpus, tmp_path_factory):
    """Distributed engine crawl over the tiny corpus."""
    from seo_crawler_ray.pipelines.crawl import CrawlJob
    from seo_crawler_ray.sources.cache import flagship_config
    out = str(tmp_path_factory.mktemp("crawl_out"))
    cfg = flagship_config(seen_shards=4, politeness_shards=2)
    job = CrawlJob(tiny_corpus, out, cfg)
    job.run()
    return out
