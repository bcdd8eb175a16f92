"""Unit tests for the stdlib DOM and the reference-parity extractors over
handcrafted HTML (the cases SURVEY.md §5/§7.4 calls out: entity decoding,
first-N caps, attr quirks, placement walk, canonicalization quirks)."""
import re

from seo_crawler_ray.functions.extract import (
    collect_link_records, detect_link_placement, extract_outlinks, extract_page)
from seo_crawler_ray.htmlparse.dom import parse_html


def _page(html: str, url="https://ex.com/a.html", base="ex.com"):
    return extract_page(html.encode(), url, 0, base, 200,
                        "text/html; charset=utf-8", True)


def test_get_text_entities_and_whitespace():
    soup = parse_html(b"<p>A &amp; B</p>\n<div>C<span>D</span></div>")
    assert soup.get_text() == "A & B\nCD"


def test_script_text_included_comments_excluded():
    soup = parse_html(b"<script>var x=1;</script><!-- nope --><p>hi</p>")
    assert soup.get_text() == "var x=1;hi"


def test_title_first_and_stripped():
    res, _, _ = _page("<title>  One  </title><title>Two</title>")
    assert res["title"] == "One"


def test_heading_caps_first_10():
    html = "".join(f"<h2>H{i}</h2>" for i in range(12))
    res, _, _ = _page(html)
    assert res["h2"] == [f"H{i}" for i in range(10)]


def test_word_count_matches_reference_regex():
    res, _, _ = _page("<p>one two-three four's</p>")
    # \b\w+\b: one, two, three, four, s
    assert res["word_count"] == len(re.findall(r"\b\w+\b", "one two-three four's"))


def test_charset_meta_and_http_equiv():
    res, _, _ = _page('<meta charset="utf-8">')
    assert res["charset"] == "utf-8"
    res, _, _ = _page('<meta http-equiv="Content-Type" content="text/html; charset=latin-1">')
    assert res["charset"] == "latin-1"


def test_meta_name_lowercased_and_named_fields():
    res, _, _ = _page('<meta name="Robots" content="noindex">'
                      '<meta name="theme-color" content="#fff">')
    assert res["meta_tags"]["robots"] == "noindex"
    # named-field side-population keys off the lowercased name
    assert res["robots"] == "noindex"
    assert res["theme_color"] == "#fff"


def test_og_prefix_strip_uses_replace_all():
    res, _, _ = _page('<meta property="og:og:title" content="x">')
    # str.replace removes EVERY 'og:' occurrence (reference quirk)
    assert "title" in res["og_tags"]


def test_images_cap_and_absolutization():
    html = ('<img src="//cdn.x/a.png"><img src="/b.png"><img src="c.png">'
            '<img src="https://cdn.x/d.png"><img alt="noscr">')
    res, _, _ = _page(html, url="https://ex.com/dir/page.html")
    srcs = [i["src"] for i in res["images"]]
    assert srcs == ["https://cdn.x/a.png", "https://ex.com/b.png",
                    "https://ex.com/dir/c.png", "https://cdn.x/d.png"]


def test_link_counts_skip_schemes_and_www_strip():
    html = ('<a href="#f">a</a><a href="mailto:x@y">b</a><a href="tel:1">c</a>'
            '<a href="javascript:void(0)">d</a><a href="/in.html">e</a>'
            '<a href="https://www.ex.com/in2.html">f</a>'
            '<a href="https://other.com/x">g</a>')
    res, _, _ = _page(html)
    assert res["internal_links"] == 2 and res["external_links"] == 1


def test_outlinks_keep_javascript_skip_mailto_tel_frag_self():
    html = ('<a href="#f">a</a><a href="mailto:x@y">b</a><a href="tel:1">c</a>'
            '<a href="javascript:void(0)">d</a><a href="/n.html">e</a>'
            '<a href="https://ex.com/a.html">self</a>')
    _, _, outs = _page(html)
    urls = [u for u, _ in outs]
    assert "javascript://void(0)" in urls
    assert "https://ex.com/n.html" in urls
    assert "https://ex.com/a.html" not in urls  # self excluded
    assert len(urls) == 2


def test_canonicalize_drops_fragment_keeps_query():
    _, _, outs = _page('<a href="/x.html?a=1&b=2#sec">q</a>')
    assert outs[0][0] == "https://ex.com/x.html?a=1&b=2"


def test_link_records_anchor_truncation_and_no_text():
    long = "z" * 150
    html = f'<a href="/x.html">{long}</a><a href="/y.html"><img src="i.png"></a>'
    _, links, _ = _page(html)
    assert links[0]["anchor_text"] == "z" * 100
    assert links[1]["anchor_text"] == "(no text)"


def test_placement_walk():
    soup = parse_html(
        b'<nav><a href="/a">n</a></nav>'
        b'<div class="SiteFooter"><a href="/b">f</a></div>'
        b'<div id="mega-menu-x"><a href="/c">m</a></div>'
        b'<p><a href="/d">b</a></p>'
        b'<footer><div><a href="/e">f2</a></div></footer>')
    anchors = soup.find_all("a")
    assert [detect_link_placement(a) for a in anchors] == \
        ["navigation", "footer", "navigation", "body", "footer"]


def test_link_record_dedup_within_page():
    html = '<a href="/x.html">one</a><a href="/x.html">two</a>'
    soup = parse_html(html.encode())
    recs = collect_link_records(soup, "https://ex.com/", "ex.com")
    assert len(recs) == 1 and recs[0]["anchor_text"] == "one"


def test_json_ld_invalid_skipped():
    html = ('<script type="application/ld+json">{"a": 1}</script>'
            '<script type="application/ld+json">{bad,}</script>')
    res, _, _ = _page(html)
    assert res["json_ld"] == [{"a": 1}]


def test_analytics_ids():
    res, _, _ = _page("<script>gtag('config', 'G-ABC123XY99');"
                      "/* GTM-X99A googletagmanager.com */</script>")
    a = res["analytics"]
    assert a["ga4_id"] == "G-ABC123XY99" and a["gtag"]
    assert a["gtm_id"] == "GTM-X99A" and a["google_analytics"]


def test_non_html_not_parsed():
    res, links, outs = extract_page(b"<p>x</p>", "https://ex.com/f.txt", 0,
                                    "ex.com", 200, "text/plain", True)
    assert res["word_count"] == 0 and not links and not outs
    assert res["size"] == 8


def test_microdata_properties():
    html = ('<div itemtype="https://schema.org/Product">'
            '<span itemprop="name">N</span>'
            '<meta itemprop="sku" content="S">'
            '<img itemprop="image" src="/i.png">'
            '<a itemprop="url" href="/u.html">t</a>'
            '<span itemprop="empty"></span></div>')
    res, _, _ = _page(html)
    assert res["schema_org"] == [{"type": "https://schema.org/Product",
                                  "properties": {"name": "N", "sku": "S",
                                                 "image": "/i.png", "url": "/u.html"}}]


def test_hreflang():
    html = ('<link rel="alternate" hreflang="de" href="https://de.ex.com/">'
            '<link rel="alternate" href="https://x.ex.com/">')
    res, _, _ = _page(html)
    assert res["hreflang"] == [{"lang": "de", "url": "https://de.ex.com/"}]


def test_fused_links_match_unfused_on_corpus(tiny_corpus):
    """The fused single-pass link extraction must be byte-identical to the
    three separate reference passes (M11/M15/M16) on every corpus page."""
    import pyarrow.parquet as pq
    from seo_crawler_ray.functions.extract import (
        _links_fused, _link_counts, collect_link_records, extract_outlinks)
    from seo_crawler_ray.htmlparse.dom import IndexedDoc, parse_html

    pages = pq.read_table(f"{tiny_corpus}/pages.parquet").to_pylist()
    base = "www.hot-site.example"
    checked = 0
    for p in pages[:80]:
        if not p["text"]:
            continue
        root = parse_html(p["html"])
        doc = IndexedDoc(root)
        res = {"internal_links": 0, "external_links": 0, "url": p["url"]}
        recs_f, outs_f = _links_fused(doc, p["url"], base, res)
        res_ref = {"internal_links": 0, "external_links": 0, "url": p["url"]}
        _link_counts(root, p["url"], base, res_ref)
        assert (res["internal_links"], res["external_links"]) == \
            (res_ref["internal_links"], res_ref["external_links"])
        assert recs_f == collect_link_records(root, p["url"], base)
        assert outs_f == extract_outlinks(root, p["url"])
        checked += 1
    assert checked > 50


def test_fast_scanner_matches_stdlib_parser():
    """The regex scanner must produce an identical tree, element index and
    text to the html.parser reference path — on adversarial snippets and on
    real corpus pages (the full corpus is diffed in the standalone parity
    harness; extract_text's md5 oracle covers it end-to-end)."""
    from seo_crawler_ray.htmlparse.dom import parse_html_indexed, parse_html_stdlib

    def sig(doc):
        els = [(e.name, tuple(sorted(e.attrs.items()))) for e in doc.elements]

        def walk(node):
            return tuple(
                ("T", c) if isinstance(c, str)
                else ("E", c.name, tuple(sorted(c.attrs.items())), walk(c))
                for c in node.children)

        return els, doc.get_text(), walk(doc.root)

    cases = [
        '<html><head><title>A &amp; B</title></head><body><p>hi</p></body></html>',
        '<div class="a" class="b" data-x>text</div>',
        '<script>if (a < b && c > d) { x = "</div>"; }</script>after',
        '<SCRIPT TYPE="x">raw &amp; not converted</SCRIPT>',
        '<style>p > a { color: red }</style>',
        '<!-- comment <div> --><p>x</p>',
        '<!DOCTYPE html><html><body>t</body></html>',
        '<p>unclosed <b>bold',
        '<br/><img src="x.png" alt=""/>',
        '<a href="/x?a=1&amp;b=2">link</a>',
        '<p>a < b and c</p>',
        '<meta charset="utf-8"><meta name="x" content="y">',
        '<a href=x>unquoted</a>',
        "<a href='single'>q</a>",
        '<p>&lt;escaped&gt; &#65; &#x42;</p>',
        '<td nowrap>cell</td>',
        '<div  spaced   =  "v" >t</div>',
        '<ul><li>a<li>b</ul>',
        '<script src="x.js"></script><p>after</p>',
        '<?php echo 1 ?><p>x</p>',
        '<![CDATA[ raw ]]><p>y</p>',
        'text &amp; more <b>bo&#108;d</b>',
        '<div/>sibling',
        '<a title="a>b">gt in attr</a>',
        '<ScRiPt>MiXeD</sCrIpT>done',
        # truncated / near-miss CDATA closers: html.parser's cdata regex is
        # r'</\s*script\s*>' — no '>' means the content is dropped at EOF
        # (ADVICE r02: the old fast path looped forever on these).
        '<p>hi</p><script>alert(1)</script',
        '<p>hi</p><style>.a{}</style',
        '<script>x</script xyz',
        '<script>x</scriptfoo>more',
        '<script>x</script >tail',
        '<script>x</script\t\n >y',
        '<script>a</style>b</script>c',
        '<style>a</script>b</style>c',
        '<script></scrip t>x</script>y',
    ]
    for c in cases:
        assert sig(parse_html_indexed(c)) == sig(parse_html_stdlib(c)), c
