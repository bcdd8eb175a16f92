"""Export operator units (reference semantics from main.py:264-477)."""
import pandas as pd
import pyarrow as pa

from seo_crawler_ray.pipelines.exports import (
    filter_issues_for_display, issues_by_url, links_csv_rows, pages_csv_rows,
    select_pages_for_pagespeed, viz_graph, xml_export)


def test_pages_csv_summarization():
    batch = pa.table({
        "url": ["https://a.com/x"],
        "analytics": [{"gtag": True, "ga4_id": "G-X", "google_analytics": True,
                       "gtm_id": "", "facebook_pixel": True, "hotjar": False,
                       "mixpanel": False}],
        "og_tags": [[("title", "t"), ("type", "a")]],
        "json_ld": ['[{"a":1},{"b":2}]'],
        "images": [[{"src": "s", "alt": ""}]],
        "internal_links": [0],
        "external_links": [7],
        "h2": [["a", "b", "c", "d", "e"]],
    })
    out = pages_csv_rows(batch, fields=["url", "analytics", "og_tags",
                                        "json_ld", "images", "internal_links",
                                        "external_links", "h2"]).to_pylist()[0]
    assert out["analytics"] == "GA4, GA, FB"
    assert out["og_tags"] == "2 tags"
    assert out["json_ld"] == "2 scripts"
    assert out["images"] == "1 images"
    assert out["internal_links"] == "0 internal links"
    assert out["external_links"] == "7 external links"
    assert out["h2"] == "a, b, c..."


def test_links_csv_rows():
    batch = pa.table({
        "source_url": ["s"], "target_url": ["t"], "anchor_text": ["a"],
        "is_internal": [True], "target_domain": ["d"],
        "target_status": pa.array([None], pa.int32()), "placement": ["body"],
    })
    row = links_csv_rows(batch).to_pylist()[0]
    assert row["is_internal"] == "Yes" and row["target_status"] == "Not crawled"


def test_issue_display_filter_skips_comments_and_blanks():
    df = pd.DataFrame({
        "url": ["https://a.com/wp-admin/x", "https://a.com/keep"],
        "type": ["error"] * 2, "category": ["SEO"] * 2,
        "issue": ["i"] * 2, "details": ["d"] * 2,
    })
    out = filter_issues_for_display(df, ["# comment", "   ", "/wp-admin/*"])
    assert out["url"].tolist() == ["https://a.com/keep"]


def test_issues_by_url_grouping():
    df = pd.DataFrame({"url": ["u1", "u1", "u2"], "type": ["a", "b", "c"],
                       "category": ["x"] * 3, "issue": ["i"] * 3,
                       "details": ["d"] * 3})
    g = issues_by_url(df)
    assert len(g["u1"]) == 2 and len(g["u2"]) == 1


def test_xml_export_shape():
    s = xml_export([{"url": "https://a.com", "title": "T & Co"}],
                   ["url", "title"], "2026-01-01 00:00:00")
    assert "<librecrawl_export" in s and "<title>T &amp; Co</title>" in s
    assert 'total_urls="1"' in s


def test_pagespeed_selection_semantics():
    df = pd.DataFrame({
        "url": ["https://a.com/deep/x.html", "https://a.com/cat1",
                "https://a.com/", "https://a.com/cat2", "https://a.com/cat3"],
        "rank": [0, 1, 2, 3, 4],
        "status_code": [200] * 5,
        "is_internal": [True] * 5,
    })
    sel = select_pages_for_pagespeed(df)
    # exact root wins (break), then first 2 single-segment pages != homepage
    assert sel == ["https://a.com/", "https://a.com/cat1", "https://a.com/cat2"]


def test_viz_graph_dedup_and_selfloops():
    pages = pd.DataFrame({"url": ["u1", "u2"], "rank": [0, 1],
                          "status_code": [200, 404]})
    links = pd.DataFrame({
        "source_url": ["u1", "u1", "u2", "u1"],
        "target_url": ["u2", "u2", "u2", "u3"],
        "is_internal": [True, True, True, True],
    })
    nodes, edges = viz_graph(pages, links)
    assert nodes["color"].tolist() == ["#10b981", "#f59e0b"]
    assert nodes["size"].tolist() == [30, 20]
    # u1->u2 deduped; u2->u2 self loop dropped; u3 not a node
    assert len(edges) == 1


def test_json_export_envelope():
    from seo_crawler_ray.pipelines.exports import json_export
    import json
    s = json_export([{"url": "u", "title": "t", "extra": 1}], ["url", "title"],
                    "2026-01-01 00:00:00")
    d = json.loads(s)
    assert d["total_urls"] == 1 and d["fields"] == ["url", "title"]
    assert d["data"] == [{"url": "u", "title": "t"}]


def test_pagespeed_stage_retry_backoff(tmp_path):
    """Simulated API: attempts = 429s+1 capped at retries+1; backoff grows
    exponentially per attempt (2**a * jitter, jitter in [0.5, 1.5]);
    exhausted retries yield a failure row, not an exception."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from seo_crawler_ray.stages.pagespeed import PageSpeedStage, _jitter

    sidecar = tmp_path / "side.parquet"
    urls = ["u0", "u1", "u2"]
    pq.write_table(pa.table({
        "url": urls * 2,
        "strategy": ["mobile"] * 3 + ["desktop"] * 3,
        "performance_score": [50, 60, 70] * 2,
        "fcp_e2": [100, 110, 120] * 2,
        "lcp_e2": [200, 210, 220] * 2,
        "fail_429": [0, 2, 5] * 2,      # clean, 2 retries, hard failure
    }), sidecar)

    stage = PageSpeedStage(str(sidecar), urls, retries=3)
    out = stage(pa.table({"url": urls})).to_pandas()
    mob = out[out["strategy"] == "mobile"].set_index("url")
    assert mob.loc["u0", "attempts"] == 1
    assert mob.loc["u0", "performance_score"] == 50
    assert mob.loc["u1", "attempts"] == 3           # two 429s then 200
    assert mob.loc["u2", "attempts"] == 4           # retries exhausted
    assert mob.loc["u2", "performance_score"] == -1
    # backoff accounting: u1 mobile contributed 2**0*j0 + 2**1*j1, u2 adds
    # three rounds; all jitters deterministic and within [0.5, 1.5]
    expected = sum((2 ** a) * _jitter("u1", s, a) for s in ("mobile", "desktop") for a in range(2)) \
        + sum((2 ** a) * _jitter("u2", s, a) for s in ("mobile", "desktop") for a in range(3))
    assert abs(stage.backoff_clock - expected) < 1e-9
    for s in ("mobile", "desktop"):
        for a in range(3):
            assert 0.5 <= _jitter("u2", s, a) <= 1.5


def test_plugin_registry(ray_session):
    """§2.10 plugin surface: built-ins registered; a user plugin gets a
    column-pruned Dataset of its declared table and full Dataset API."""
    import pandas as pd
    import ray.data
    from seo_crawler_ray.pipelines import plugins

    assert {"eeat-scores", "eeat-summary", "status-counts",
            "linked-from"} <= set(plugins.list_plugins())

    seen_cols = {}

    def word_histogram(ds):
        seen_cols["cols"] = ds.schema().names
        out = ds.map_batches(
            lambda b: {"bucket": [wc // 100 for wc in b["word_count"]]},
            batch_format="numpy")
        return out.groupby("bucket").count().to_pandas()

    plugins.register(plugins.AnalysisPlugin(
        name="wc-hist", title="Word count histogram", table="pages",
        columns=["word_count"], run=word_histogram))
    try:
        pages = ray.data.from_pandas(pd.DataFrame({
            "url": ["a", "b", "c"], "word_count": [50, 150, 160],
            "title": ["x", "y", "z"]}))
        out = plugins.run_plugin("wc-hist", pages_ds=pages)
        assert seen_cols["cols"] == ["word_count"]   # pruned to declaration
        assert out["count()"].sum() == 3
        # duplicate registration rejected
        import pytest
        with pytest.raises(ValueError):
            plugins.register(plugins.AnalysisPlugin(
                name="wc-hist", title="dup", table="pages",
                run=word_histogram))
    finally:
        plugins.unregister("wc-hist")


def test_jsrender_stage(ray_session):
    """S5/T5 browser-pool shape: pages created once per actor, checked out
    and returned per render; non-HTML extensions skip rendering; real mode
    gated on Playwright's absence."""
    import pandas as pd
    import pytest
    import ray.data
    from seo_crawler_ray.stages.jsrender import (
        JsRenderStage, RENDER_MARKER, render_pages, should_use_javascript)

    with pytest.raises(NotImplementedError):
        JsRenderStage(fake=False)
    assert should_use_javascript("https://x.example/page")
    assert not should_use_javascript("https://x.example/img.PNG")

    df = pd.DataFrame({
        "url": ["https://x.example/a", "https://x.example/file.pdf"],
        "html": ["<html><body><p>hi</p></body></html>", "%PDF-1.4"],
    })
    out = render_pages(ray.data.from_pandas(df), pool_size=2,
                       concurrency=1).to_pandas().set_index("url")
    a = out.loc["https://x.example/a"]
    assert a["rendered"] and RENDER_MARKER in a["html"]
    assert 'id="js-root"' in a["html"]
    assert a["html"].index(RENDER_MARKER) < a["html"].index("</body>") + len(a["html"])
    pdf_row = out.loc["https://x.example/file.pdf"]
    assert not pdf_row["rendered"] and pdf_row["html"] == "%PDF-1.4"

    # pool accounting: renders drain and refill the same pool
    stage = JsRenderStage(pool_size=1)
    import pyarrow as pa
    stage(pa.table({"url": ["https://x/1", "https://x/2"],
                    "html": ["<body></body>", "<body></body>"]}))
    assert len(stage.page_pool) == 1
    assert stage.page_pool[0].renders == 2


def test_pagespeed_selection_distributed_equivalence(ray_session):
    """The distributed sort+limit selection must equal the sequential-scan
    reference implementation on tricky shapes: no exact root, homepage that
    is itself single-segment, fewer than 2 categories."""
    import pandas as pd
    import ray.data
    from seo_crawler_ray.pipelines.exports import (
        select_pages_for_pagespeed, select_pages_for_pagespeed_distributed)

    cases = [
        # exact root exists; categories after it
        [("https://s.ex/", 200, True), ("https://s.ex/a", 200, True),
         ("https://s.ex/b", 200, True), ("https://s.ex/a/b", 200, True)],
        # no exact root: shortest path wins; homepage is single-segment too
        [("https://s.ex/zz", 200, True), ("https://s.ex/a", 200, True),
         ("https://s.ex/b", 200, True), ("https://s.ex/c", 200, True)],
        # non-200 and external rows ignored; only one category available
        [("https://s.ex/", 404, True), ("https://o.ex/x", 200, False),
         ("https://s.ex/only", 200, True)],
        # empty candidate set
        [("https://s.ex/x", 500, True)],
    ]
    for rows in cases:
        pdf = pd.DataFrame({
            "url": [r[0] for r in rows],
            "rank": range(len(rows)),
            "status_code": [r[1] for r in rows],
            "is_internal": [r[2] for r in rows],
        })
        expect = select_pages_for_pagespeed(pdf)
        got = select_pages_for_pagespeed_distributed(ray.data.from_pandas(pdf))
        assert got == expect, (rows, got, expect)


def test_bucketed_coshuffle_joins_match_broadcast(ray_session):
    """J1/J5 at the 100 TB design point: the bucketed co-shuffle paths must
    produce exactly the broadcast-dict results — including null statuses
    for uncrawled targets and min-rank first-seen dedup — without either
    side ever reaching the driver (coshuffle.py)."""
    import numpy as np
    import pandas as pd
    import ray.data
    from seo_crawler_ray.pipelines.analysis import link_target_status
    from seo_crawler_ray.pipelines.exports import rebuild_frontier_from_links

    rng = np.random.default_rng(7)
    n_pages, n_links = 400, 3000
    pages = pd.DataFrame({
        "url": [f"https://s{i%7}.ex/p{i}" for i in range(n_pages)],
        "status_code": rng.choice([200, 301, 404, 500], n_pages).astype("int32"),
    })
    # targets: mix of crawled urls, uncrawled urls, repeats across ranks
    tgt_pool = pages["url"].tolist() + \
        [f"https://s{i%7}.ex/missing{i}" for i in range(150)]
    links = pd.DataFrame({
        "source_url": [f"https://s0.ex/p{i % n_pages}" for i in range(n_links)],
        "target_url": rng.choice(tgt_pool, n_links),
        "is_internal": rng.random(n_links) < 0.8,
        "source_rank": rng.integers(0, 5000, n_links),
        "anchor_text": [f"a{i}" for i in range(n_links)],
    })
    pages_ds = ray.data.from_pandas(pages).repartition(8)
    links_ds = ray.data.from_pandas(links).repartition(16)

    def norm(df):
        return (df.sort_values(list(df.columns))
                .reset_index(drop=True).astype(object)
                .where(pd.notna(df.sort_values(list(df.columns))
                                .reset_index(drop=True)), None))

    bc = link_target_status(links_ds, pages_ds, mode="broadcast").to_pandas()
    bk = link_target_status(links_ds, pages_ds, mode="bucketed").to_pandas()
    assert list(bc.columns) == list(bk.columns)
    pd.testing.assert_frame_equal(
        bc.sort_values(["anchor_text"]).reset_index(drop=True),
        bk.sort_values(["anchor_text"]).reset_index(drop=True),
        check_like=True)
    # null target_status survives for uncrawled targets in both paths
    assert bk["target_status"].isna().any()

    fb = rebuild_frontier_from_links(
        pages_ds, links_ds, mode="broadcast").to_pandas()
    fk = rebuild_frontier_from_links(
        pages_ds, links_ds, mode="bucketed").to_pandas()
    # identical deduped pending sets; order among equal min-ranks is
    # unspecified (the query contract is order-insensitive)
    assert sorted(fb["target_url"]) == sorted(fk["target_url"])
    assert fk["target_url"].is_unique


def test_rebuild_frontier_streams_and_sinks(ray_session, tmp_path):
    """J5 streaming contract (VERDICT r4 #4): both modes return a lazy
    Dataset in source_rank order, and out_dir persists the deduped
    (target_url, source_rank) frontier parquet."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data
    from seo_crawler_ray.pipelines.exports import rebuild_frontier_from_links

    pages = pd.DataFrame({"url": [f"https://a.ex/p{i}" for i in range(20)],
                          "status_code": [200] * 20})
    links = pd.DataFrame({
        "source_url": ["https://a.ex/p0"] * 6,
        "target_url": ["https://a.ex/p1",        # crawled -> excluded
                       "https://a.ex/new2", "https://a.ex/new1",
                       "https://a.ex/new1",      # repeat, higher rank
                       "https://a.ex/ext", "https://a.ex/new3"],
        "is_internal": [True, True, True, True, False, True],
        "source_rank": [0, 5, 3, 9, 1, 4],
    })
    pages_ds = ray.data.from_pandas(pages).repartition(3)
    links_ds = ray.data.from_pandas(links).repartition(2)

    for mode in ("broadcast", "bucketed"):
        out = tmp_path / f"frontier_{mode}"
        ds = rebuild_frontier_from_links(pages_ds, links_ds, mode=mode,
                                         out_dir=str(out))
        assert hasattr(ds, "to_pandas")          # Dataset, not a DataFrame
        got = ds.to_pandas()
        # first-seen order: new1 (rank 3) before new3 (4) before new2 (5)
        assert got["target_url"].tolist() == [
            "https://a.ex/new1", "https://a.ex/new3", "https://a.ex/new2"]
        sunk = pq.read_table(str(out)).to_pandas().sort_values("source_rank")
        assert sunk["target_url"].tolist() == got["target_url"].tolist()
        assert sunk["source_rank"].tolist() == [3, 4, 5]
