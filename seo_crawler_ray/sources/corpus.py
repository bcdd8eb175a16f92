"""Deterministic synthetic web corpus generator.

Produces the Parquet input mandated by BASELINE.json's ``input_hint`` —
``pages(url, warc_ts, html, text, lang)`` — plus sidecar tables:

- ``meta``: per-url fetch metadata (status_code, content_type header, host)
  standing in for the live HTTP layer the reference talks to,
- ``gen_truth``: extraction ground truth computed **from the intermediate
  representation, not by parsing the HTML** — the independent oracle for the
  extract stage (parser bugs show up as mismatches),
- ``candidates``: every realized ``(source_url, href, clean_url)`` anchor,
  with the clean form known by construction (the canonicalization oracle),
- ``robots``: per-host robots.txt bodies (Disallow / Crawl-delay / Sitemap),
- ``sitemaps``: sitemap XML bodies keyed by URL (urlset, index, gzipped),
- ``seeds``: the crawl seed list.

The HTML bodies *realize* a seeded host/link graph: within each host, page
local-index ``j`` links to children ``3j+1..3j+3`` (ternary tree, so BFS
depth grows ~log3), the hot-host root links to every other host root, and
each page adds a few pseudo-random extra links. The ``text`` column is the
byte-identical ``get_text()`` oracle: the emitter records every text node it
writes (including inter-tag whitespace), exactly what
``BeautifulSoup(html, 'html.parser').get_text()`` would return per the
reference's usage (/root/reference/src/core/seo_extractor.py:32).

Everything is deterministic from ``seed`` — no wall clock, no external data.
"""
from __future__ import annotations

import gzip
import html as html_mod
import json
import os
import random
import re
from datetime import datetime, timedelta
from urllib.parse import urlparse

import pyarrow as pa
import pyarrow.parquet as pq

_WORD_RE = re.compile(r"\b\w+\b")

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu amber basalt cobalt dune ember fjord glacier harbor isle "
    "jade krill lagoon meadow nectar onyx prairie quartz reef summit tundra"
).split()

HOT_HOST = "www.hot-site.example"
NAKED_HOT_HOST = "hot-site.example"
BLOCKED_HOST_INDEX = 3  # siteN.example fully robots-blocked when n_hosts > 3
SEED_URL_RAW = "www.hot-site.example"  # schemeless on purpose (crawler.py:211-212)

_EPOCH = datetime(2025, 1, 1)


class _Emitter:
    """Accumulates HTML markup and, in parallel, the exact get_text() text."""

    def __init__(self):
        self.html: list[str] = []
        self.text: list[str] = []

    def raw(self, s: str) -> None:           # markup only (tags)
        self.html.append(s)

    def txt(self, s: str) -> None:           # a text node (escaped into HTML)
        self.html.append(html_mod.escape(s))
        self.text.append(s)

    def ws(self, s: str = "\n") -> None:     # whitespace text node
        self.html.append(s)
        self.text.append(s)

    def script_body(self, code: str) -> None:  # raw-text element content (CDATA)
        self.html.append(code)
        self.text.append(code)

    def result(self) -> tuple[str, str]:
        return "".join(self.html), "".join(self.text)


def _host_of(i: int, n_hosts: int) -> str:
    if i % 2 == 0:
        # hot host takes half the corpus (skew on purpose); a slice of it uses
        # the naked domain to exercise the www-strip-once compare
        return NAKED_HOT_HOST if i % 40 == 22 else HOT_HOST
    h = 1 + (i // 2) % (n_hosts - 1)
    return f"site{h}.example"


def _page_kind(i: int) -> str:
    """Leaf-only special kinds vs regular tree-node pages."""
    if i % 53 == 9:
        return "pdf"          # excluded extension, application/pdf
    if i % 53 == 21:
        return "private"      # robots-disallowed path on the hot host
    if i % 53 == 34:
        return "plain"        # text/plain, never parsed
    if i % 101 == 77:
        return "login"        # issue-exclusion path
    return "page"


def _path_of(i: int, kind: str) -> str:
    if kind == "pdf":
        return f"/docs/file{i}.pdf"
    if kind == "private":
        return f"/private/p{i}.html"
    if kind == "plain":
        return f"/notes/n{i}.txt"
    if kind == "login":
        return f"/login-help-{i}.html"
    if i % 13 == 5:
        return f"/q{i}.html?ref=camp&x={i % 7}"
    if i % 11 == 2:
        return f"/page{i}"
    if i % 19 == 11:
        return f"/deep/a/b/c/p{i}.htm"
    return f"/p{i}.html"


def _status_of(i: int, kind: str) -> int:
    if kind in ("pdf", "plain"):
        return 200
    if i % 31 == 13:
        return 404
    if i % 37 == 17:
        return 500
    if i % 41 == 19:
        return 301
    return 200


def _content_type_of(kind: str, i: int) -> str:
    if kind == "pdf":
        return "application/pdf"
    if kind == "plain":
        return "text/plain; charset=utf-8"
    return "text/html" if i % 29 == 3 else "text/html; charset=utf-8"


def build_corpus_ir(n_pages: int, seed: int = 42) -> dict:
    rng = random.Random(seed)
    n_hosts = max(4, min(40, n_pages // 250 + 4))

    pages = []
    by_host: dict[str, list[int]] = {}
    for i in range(n_pages):
        host = _host_of(i, n_hosts)
        kind = _page_kind(i)
        path = _path_of(i, kind)
        url = f"https://{host}{path}"
        p = {
            "page_id": i, "host": host, "kind": kind, "path": path, "url": url,
            "status_code": _status_of(i, kind),
            "content_type_header": _content_type_of(kind, i),
        }
        pages.append(p)
        # tree nodes: regular pages on non-blocked hosts (naked-hot joins the
        # hot tree — is_internal treats them as one site, hosts stay distinct)
        blocked = host == f"site{BLOCKED_HOST_INDEX}.example"
        if kind == "page" and not blocked:
            tree_host = HOT_HOST if host == NAKED_HOT_HOST else host
            by_host.setdefault(tree_host, []).append(i)
        elif kind != "page" or blocked:
            by_host.setdefault("_leaf", []).append(i)

    # link targets per page
    url_of = {p["page_id"]: p["url"] for p in pages}
    leafs = by_host.get("_leaf", [])
    host_roots = [ids[0] for h, ids in sorted(by_host.items()) if h != "_leaf" and ids]
    targets: dict[int, list[int]] = {i: [] for i in range(n_pages)}
    for h, ids in by_host.items():
        if h == "_leaf":
            continue
        for j, pid in enumerate(ids):
            kids = [ids[k] for k in range(6 * j + 1, 6 * j + 7) if k < len(ids)]
            targets[pid].extend(kids)
    hot_root = by_host[HOT_HOST][0]
    targets[hot_root].extend(r for r in host_roots if r != hot_root)
    for p in pages:
        i = p["page_id"]
        if p["kind"] != "page":
            continue
        extra = rng.sample(range(n_pages), k=min(8, n_pages))
        targets[i].extend(t for t in extra if t != i)
        if leafs and rng.random() < 0.3:
            targets[i].append(rng.choice(leafs))

    return {
        "pages": pages, "targets": targets, "url_of": url_of,
        "n_hosts": n_hosts, "rng_seed": seed, "hot_root": hot_root,
        "host_roots": host_roots,
    }


def _href_form(rng: random.Random, source_url: str, target_url: str) -> str:
    """Realize a link to ``target_url`` in one of the forms the reference
    canonicalizer (link_manager.py:31-38) must normalize back to the clean URL."""
    tp = urlparse(target_url)
    sp = urlparse(source_url)
    path_q = tp.path + (f"?{tp.query}" if tp.query else "")
    roll = rng.random()
    if roll < 0.35:
        return target_url
    if roll < 0.55 and tp.netloc == sp.netloc:
        return path_q                      # root-relative
    if roll < 0.70:
        return f"//{tp.netloc}{path_q}"    # protocol-relative
    if roll < 0.85:
        return target_url + "#section-2"   # fragment dropped by canonicalizer
    return target_url


def _ga4_id(i: int) -> str:
    alphabet = "ABCDEFGHJKLMNPQRSTUVWXYZ0123456789"
    chars = []
    v = i * 2654435761 % (1 << 32)
    for _ in range(10):
        chars.append(alphabet[v % len(alphabet)])
        v //= len(alphabet)
    return "G-" + "".join(chars)


def render_page(p: dict, ir: dict, rng: random.Random) -> dict:
    """Render one page IR to HTML + text and record generation-truth fields."""
    i = p["page_id"]
    url = p["url"]
    truth: dict = {"page_id": i, "url": url}

    # ---- content plan (deterministic per page id) ----
    near_dup_group = {14: 0, 15: 0, 12: 1, 13: 1}.get(i)
    if near_dup_group == 0:
        # pages 14/15: above the 0.85 duplication threshold
        title_raw = f"  Shared catalog overview for premium widgets item {'A' if i == 14 else 'B'}  "
        desc = ("A long shared description of the premium widget catalog that both "
                "pages carry with nearly identical phrasing for duplication tests only")
        h1 = "Premium widget catalog"
    elif near_dup_group == 1:
        # pages 12/13: similar shape but below the threshold
        title_raw = f"Listing page {i} {WORDS[(i * 11) % len(WORDS)]} {WORDS[(i * 17) % len(WORDS)]}"
        desc = f"Description for listing {i} " + " ".join(
            WORDS[(i * k) % len(WORDS)] for k in range(5, 15))
        h1 = f"{WORDS[(i * 7) % len(WORDS)].title()} listing {i}"
    elif i % 23 == 11:
        title_raw = ""                                     # missing title issue
        desc = f"Page {i} still has a description of moderate length for testing purposes here"
        h1 = f"Heading for page {i}"
    elif i % 9 == 4:
        title_raw = f"P{i} & tiny"                         # short title + entity
        desc = ""                                          # missing description
        h1 = ""
    else:
        # varied templates keep typical cross-page similarity below the 0.85
        # duplication threshold so the D4 detector stays selective
        w = [WORDS[(i * k + k * k) % len(WORDS)] for k in range(1, 8)]
        t_tpl = i % 4
        if t_tpl == 0:
            title_raw = f"{w[0].title()} {w[1]} compendium no. {i}"
        elif t_tpl == 1:
            title_raw = f"All about {w[2]} and {w[3]}: field notes {i}"
        elif t_tpl == 2:
            title_raw = f"{w[4].title()} report {i} — {w[5]} measurements and guidance"
        else:
            title_raw = f"Why {w[6]} matters: {w[0]} perspectives ({i})"
        d_tpl = i % 3
        if d_tpl == 0:
            desc = (f"Field notes on {w[1]} with sections about {w[2]}, {w[3]} and "
                    f"{w[4]} gathered for entry {i} of the synthetic corpus")
        elif d_tpl == 1:
            desc = (f"{w[5].title()} measurements, {w[6]} ratios and a short "
                    f"discussion of {w[0]} trade-offs appear in document {i}")
        else:
            desc = (f"Entry {i}: how {w[3]} interacts with {w[1]} when {w[2]} "
                    f"conditions apply, plus appendices on {w[6]}")
        if i % 15 == 7:
            desc += (" and then quite a few more words to overflow the recommended one "
                     "hundred and sixty character ceiling for meta descriptions")
        h1 = f"{w[0].title()} {w[5]} heading {i}" if i % 7 != 6 else ""

    n_h2 = 12 if i % 6 == 0 else 6
    n_h3 = 12 if i % 6 == 0 else 5
    n_paras = 2 if i % 8 == 1 else 40         # article-sized bodies (~35 KB);
                                              # some thin-content pages
    big_page = i % 997 == 40                   # ~1.2 MB body -> size warning
    has_viewport = i % 4 != 1
    robots_meta = "noindex, nofollow" if i % 43 == 12 else ("index, follow" if i % 3 == 0 else "")
    lang = "" if i % 21 == 8 else ("de" if i % 10 == 9 else "en")
    charset_mode = ("meta" if i % 3 == 0 else "http-equiv" if i % 3 == 1 else "none")
    canonical_mode = ("none" if i % 12 == 7 else "other" if i % 12 == 3 else "self")
    has_og = i % 5 != 2
    has_twitter = i % 6 != 3
    og_author = f"Author {i % 17}" if i % 8 == 0 else ""
    meta_author = f"Writer {i % 13}" if i % 7 == 2 else ""
    n_json_ld = 2 if i % 16 == 0 else (1 if i % 4 == 0 else 0)
    invalid_json_ld = i % 32 == 16
    analytics_kinds = set()
    if i % 10 == 0:
        analytics_kinds.add("ga4")
    if i % 14 == 0:
        analytics_kinds.add("gtm")
    if i % 26 == 0:
        analytics_kinds.add("fbq")
    if i % 33 == 0:
        analytics_kinds.add("hotjar")
    if i % 39 == 0:
        analytics_kinds.add("mixpanel")
    n_images = 25 if i % 27 == 0 else (12 if i % 3 == 0 else 5)
    n_missing_alt = min(n_images, i % 5)
    has_hreflang = i % 9 == 0
    has_microdata = i % 12 == 0

    # link plan: nav / body / footer split + specials
    tgt_ids = ir["targets"][i]
    tgt_urls = [ir["url_of"][t] for t in tgt_ids]
    rng_page = random.Random(ir["rng_seed"] * 1_000_003 + i)
    hrefs = [(_href_form(rng_page, url, tu), tu) for tu in tgt_urls]
    n_nav = min(2, len(hrefs))
    nav_links, rest = hrefs[:n_nav], hrefs[n_nav:]
    n_footer = min(2, len(rest))
    footer_links, body_links = rest[:n_footer], rest[n_footer:]
    specials = []
    if i % 3 == 0:
        specials.append(("#top", "Back to top"))
    if i % 5 == 0:
        specials.append(("mailto:info@example.com", "Mail us"))
    if i % 7 == 0:
        specials.append(("tel:+15550100", "Call"))
    if i % 6 == 0:
        specials.append(("javascript:void(0)", "JS action"))
    if i % 17 == 2:
        specials.append((url, "Self link"))  # self-link: excluded from frontier
    dangling = []
    if i % 25 == 6:
        dangling.append((f"https://external-{i % 5}.example/x{i}.html", f"External {i}"))

    # ---- emit ----
    em = _Emitter()
    em.raw("<!DOCTYPE html>")
    em.ws()
    em.raw(f'<html lang="{lang}">' if lang else "<html>")
    em.ws()
    em.raw("<head>")
    em.ws()
    if charset_mode == "meta":
        em.raw('<meta charset="utf-8">')
        em.ws()
    elif charset_mode == "http-equiv":
        em.raw('<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">')
        em.ws()
    em.raw("<title>")
    em.txt(title_raw)
    em.raw("</title>")
    em.ws()
    if desc:
        em.raw(f'<meta name="description" content="{html_mod.escape(desc, quote=True)}">')
        em.ws()
    if has_viewport:
        em.raw('<meta name="viewport" content="width=device-width, initial-scale=1">')
        em.ws()
    if robots_meta:
        em.raw(f'<meta name="robots" content="{robots_meta}">')
        em.ws()
    if meta_author:
        em.raw(f'<meta name="author" content="{meta_author}">')
        em.ws()
    keywords = f"{WORDS[i % len(WORDS)]}, {WORDS[(i * 2) % len(WORDS)]}" if i % 3 == 0 else ""
    if keywords:
        em.raw(f'<meta name="keywords" content="{keywords}">')
        em.ws()
    generator = "SynthGen 2.1" if i % 11 == 4 else ""
    if generator:
        em.raw(f'<meta name="generator" content="{generator}">')
        em.ws()
    theme_color = "#336699" if i % 13 == 6 else ""
    if theme_color:
        em.raw(f'<meta name="theme-color" content="{theme_color}">')
        em.ws()
    canonical_url = ""
    if canonical_mode == "self":
        canonical_url = url
    elif canonical_mode == "other":
        canonical_url = f"https://{p['host']}/canonical-target-{i}.html"
    if canonical_url:
        em.raw(f'<link rel="canonical" href="{canonical_url}">')
        em.ws()
    og_tags = {}
    if has_og:
        og_tags = {"title": f"OG title {i}", "type": "article",
                   "url:secure": f"https://{p['host']}{p['path']}"}  # exercises replace-all quirk
        if og_author:
            og_tags["author"] = og_author
        for k, v in og_tags.items():
            em.raw(f'<meta property="og:{k}" content="{html_mod.escape(v, quote=True)}">')
            em.ws()
    twitter_tags = {}
    if has_twitter:
        twitter_tags = {"card": "summary", "title": f"Tw title {i}"}
        for k, v in twitter_tags.items():
            em.raw(f'<meta name="twitter:{k}" content="{html_mod.escape(v, quote=True)}">')
            em.ws()
    hreflang_entries = []
    if has_hreflang:
        hreflang_entries = [
            {"lang": "en", "url": url},
            {"lang": "de", "url": url.replace("https://", "https://de.")},
        ]
        for e in hreflang_entries:
            em.raw(f'<link rel="alternate" hreflang="{e["lang"]}" href="{e["url"]}">')
            em.ws()
    json_ld_objs = []
    for k in range(n_json_ld):
        obj = {"@context": "https://schema.org", "@type": "Article" if k == 0 else "WebPage",
               "name": f"Doc {i}-{k}", "position": i}
        json_ld_objs.append(obj)
        em.raw('<script type="application/ld+json">')
        em.script_body(json.dumps(obj, separators=(",", ": ")))
        em.raw("</script>")
        em.ws()
    if invalid_json_ld:
        em.raw('<script type="application/ld+json">')
        em.script_body('{"@type": "Broken", unquoted: true,,}')
        em.raw("</script>")
        em.ws()
    ga4_id = _ga4_id(i) if "ga4" in analytics_kinds else ""
    gtm_id = f"GTM-{'WXYZ'[i % 4]}{i % 97:02d}A" if "gtm" in analytics_kinds else ""
    if analytics_kinds:
        code_lines = []
        if ga4_id:
            code_lines.append(f"gtag('config', '{ga4_id}');")
        if gtm_id:
            code_lines.append(f"/* googletagmanager.com/gtm.js?id={gtm_id} */")
        if "fbq" in analytics_kinds:
            code_lines.append("fbq('init', '123456');")
        if "hotjar" in analytics_kinds:
            code_lines.append("/* static.hotjar.com/c/hotjar- */")
        if "mixpanel" in analytics_kinds:
            code_lines.append("mixpanel.track('view');")
        em.raw("<script>")
        em.script_body("\n".join(code_lines))
        em.raw("</script>")
        em.ws()
    em.raw("</head>")
    em.ws()
    em.raw("<body>")
    em.ws()

    all_anchor_hrefs: list[str] = []   # for link-count truth, in document order

    def emit_link(href: str, anchor: str) -> None:
        em.raw(f'<a href="{html_mod.escape(href, quote=True)}">')
        em.txt(anchor)
        em.raw("</a>")
        em.ws()
        all_anchor_hrefs.append(href)

    em.raw('<nav class="main-nav">')
    em.ws()
    for href, tu in nav_links:
        emit_link(href, f"Nav to {urlparse(tu).path}")
    em.raw("</nav>")
    em.ws()

    if h1:
        em.raw("<h1>")
        em.txt(h1)
        em.raw("</h1>")
        em.ws()
    h2_texts = [f"Section {i}.{k} on {WORDS[(i + k) % len(WORDS)]}" for k in range(n_h2)]
    h3_texts = [f"Subsection {i}.{k}" for k in range(n_h3)]
    para_words = n_paras * 90 + (i % 37)
    body_rng = random.Random(ir["rng_seed"] * 7_000_003 + i)
    paragraphs = []
    for _ in range(n_paras):
        k = para_words // n_paras
        paragraphs.append(" ".join(body_rng.choice(WORDS) for _ in range(k)) + ".")
    if big_page:
        paragraphs.extend(["filler " * 2000] * 100)  # ~1.2 MB

    body_iter = iter(body_links + dangling + specials)
    for k, h2t in enumerate(h2_texts):
        em.raw("<h2>")
        em.txt(h2t)
        em.raw("</h2>")
        em.ws()
        if k < len(h3_texts):
            em.raw("<h3>")
            em.txt(h3_texts[k])
            em.raw("</h3>")
            em.ws()
        if k < len(paragraphs):
            em.raw("<p>")
            em.txt(paragraphs[k])
            em.raw("</p>")
            em.ws()
        for _ in range(2):
            nxt = next(body_iter, None)
            if nxt is not None:
                href, second = nxt
                anchor = second if not second.startswith("https://") and not second.startswith("/") \
                    else f"Link to {urlparse(second).path or second}"
                emit_link(href, anchor)
    for nxt in body_iter:
        href, second = nxt
        anchor = second if not second.startswith("https://") and not second.startswith("/") \
            else f"Link to {urlparse(second).path or second}"
        emit_link(href, anchor)
    for k in range(len(h2_texts), len(paragraphs)):
        em.raw("<p>")
        em.txt(paragraphs[k])
        em.raw("</p>")
        em.ws()

    img_entries = []
    for k in range(n_images):
        alt = "" if k < n_missing_alt else f"Image {i}-{k}"
        roll = k % 4
        if roll == 0:
            src = f"/img/{i}-{k}.png"
        elif roll == 1:
            src = f"//cdn.example/shared/{k}.png"
        elif roll == 2:
            src = f"rel/{i}-{k}.png"
        else:
            src = f"https://cdn.example/abs/{i}-{k}.png"
        width = str(200 + k) if k % 2 == 0 else ""
        height = str(100 + k) if k % 3 == 0 else ""
        img_entries.append({"src": src, "alt": alt, "width": width, "height": height})
        attrs = f'src="{src}"'
        if alt:
            attrs += f' alt="{alt}"'
        if width:
            attrs += f' width="{width}"'
        if height:
            attrs += f' height="{height}"'
        em.raw(f"<img {attrs}>")
        em.ws()

    microdata = []
    if has_microdata:
        em.raw('<div itemscope itemtype="https://schema.org/Product">')
        em.ws()
        em.raw('<span itemprop="name">')
        em.txt(f"Product {i}")
        em.raw("</span>")
        em.ws()
        em.raw(f'<meta itemprop="sku" content="SKU-{i}">')
        em.ws()
        em.raw(f'<img itemprop="image" src="/img/prod-{i}.png">')
        em.ws()
        em.raw(f'<a itemprop="url" href="/p{i}.html">')
        em.txt("details")
        em.raw("</a>")
        em.ws()
        em.raw("</div>")
        em.ws()
        all_anchor_hrefs.append(f"/p{i}.html")
        microdata = [{"type": "https://schema.org/Product",
                      "properties": {"name": f"Product {i}", "sku": f"SKU-{i}",
                                     "image": f"/img/prod-{i}.png", "url": f"/p{i}.html"}}]

    em.raw('<footer id="page-footer">')
    em.ws()
    for href, tu in footer_links:
        emit_link(href, f"Footer {urlparse(tu).path}")
    em.raw("</footer>")
    em.ws()
    em.raw("</body>")
    em.ws()
    em.raw("</html>")
    em.ws()

    html_str, text_str = em.result()

    truth.update(
        title=title_raw.strip(), meta_description=desc.strip(), h1=h1,
        h2=h2_texts[:10], h3=h3_texts[:10],
        word_count=len(_WORD_RE.findall(text_str)),
        lang=lang,
        charset=("utf-8" if charset_mode == "meta"
                 else "iso-8859-1" if charset_mode == "http-equiv" else ""),
        viewport="width=device-width, initial-scale=1" if has_viewport else "",
        robots=robots_meta, author=meta_author, keywords=keywords,
        generator=generator, theme_color=theme_color,
        canonical_url=canonical_url,
        og_title=og_tags.get("title", ""), og_author=og_tags.get("author", ""),
        has_og=bool(og_tags), has_twitter=bool(twitter_tags),
        twitter_card=twitter_tags.get("card", ""),
        json_ld_count=len(json_ld_objs),
        ga4_id=ga4_id, gtm_id=gtm_id,
        has_fbq="fbq" in analytics_kinds, has_hotjar="hotjar" in analytics_kinds,
        has_mixpanel="mixpanel" in analytics_kinds,
        has_google_analytics=bool(ga4_id or gtm_id),  # both snippets hit the GA URL patterns
        n_images=min(n_images, 20) + (1 if has_microdata and n_images < 20 else 0),
        # missing-alt count among the *extracted* (first-20 + microdata) images;
        # the microdata <img itemprop=image> carries no alt attribute
        images_without_alt=(n_missing_alt if n_images > 0 else 0)
        + (1 if has_microdata and n_images < 20 else 0),
        hreflang_count=len(hreflang_entries),
        schema_org_count=len(microdata),
        anchor_hrefs=all_anchor_hrefs,
    )
    return {"html": html_str, "text": text_str, "truth": truth,
            "link_pairs": nav_links + body_links + footer_links}


def _link_count_truth(truth: dict, page_url: str, base_domain: str) -> tuple[int, int]:
    """Mirror of seo_extractor.py:184-202 applied to the emitted hrefs."""
    from ..functions.urls import strip_www
    from urllib.parse import urljoin
    base_clean = strip_www(base_domain)
    internal = external = 0
    for href in truth["anchor_hrefs"]:
        if href and not href.startswith(("#", "mailto:", "tel:", "javascript:")):
            netloc = urlparse(urljoin(page_url, href)).netloc
            if strip_www(netloc) == base_clean:
                internal += 1
            else:
                external += 1
    return internal, external


def _robots_rows(ir: dict) -> list[dict]:
    rows = [
        {"host": HOT_HOST,
         "robots_txt": ("User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"
                        f"Sitemap: https://{HOT_HOST}/sitemap.xml\n"),
         "crawl_delay": 2.0},
        {"host": NAKED_HOT_HOST,
         "robots_txt": "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n",
         "crawl_delay": 2.0},
        {"host": "site1.example",
         "robots_txt": "User-agent: *\nCrawl-delay: 1\n", "crawl_delay": 1.0},
        # site2: intentionally missing -> fetch failure -> allow (crawler.py:1190-1194)
    ]
    if ir["n_hosts"] > BLOCKED_HOST_INDEX:
        rows.append({"host": f"site{BLOCKED_HOST_INDEX}.example",
                     "robots_txt": "User-agent: *\nDisallow: /\n", "crawl_delay": 0.0})
    for h in range(4, ir["n_hosts"]):
        if h % 2 == 0:
            rows.append({"host": f"site{h}.example",
                         "robots_txt": "User-agent: *\nCrawl-delay: 0.5\n",
                         "crawl_delay": 0.5})
    return rows


def _sitemap_rows(ir: dict) -> list[dict]:
    """Sitemap bodies on the seed host (probed paths: sitemap_parser.py:26-31)."""
    hot_pages = [p for p in ir["pages"]
                 if p["host"] == HOT_HOST and p["kind"] == "page"]
    main_urls = [p["url"] for p in hot_pages[: min(40, max(5, len(hot_pages) // 10))]]
    a_urls = [p["url"] for p in hot_pages[40:50]]
    b_urls = [p["url"] for p in hot_pages[50:60]]

    def urlset(urls):
        from xml.sax.saxutils import escape
        items = "\n".join(f"  <url><loc>{escape(u)}</loc></url>" for u in urls)
        return (b'<?xml version="1.0" encoding="UTF-8"?>\n'
                b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
                + items.encode() + b"\n</urlset>\n")

    index_xml = (
        b'<?xml version="1.0" encoding="UTF-8"?>\n'
        b'<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        + f"  <sitemap><loc>https://{HOT_HOST}/sm/a.xml</loc></sitemap>\n".encode()
        + f"  <sitemap><loc>https://{HOT_HOST}/sm/b.xml.gz</loc></sitemap>\n".encode()
        + b"</sitemapindex>\n")

    rows = [
        {"url": f"https://{HOT_HOST}/sitemap.xml", "xml": urlset(main_urls)},
        {"url": f"https://{HOT_HOST}/sitemap_index.xml", "xml": index_xml},
        {"url": f"https://{HOT_HOST}/sm/a.xml", "xml": urlset(a_urls)},
        {"url": f"https://{HOT_HOST}/sm/b.xml.gz", "xml": gzip.compress(urlset(b_urls), mtime=0)},
    ]
    # generator-side truth for the discovery ORDER (sitemap_parser.py:26-47):
    # probe /sitemap.xml (main), /sitemap_index.xml (a then b via the index),
    # two misses, then the robots-declared /sitemap.xml AGAIN (duplicates, the
    # reference does not dedup the returned list — add_url does)
    expected_order = main_urls + a_urls + b_urls + main_urls
    return rows, expected_order


def generate_corpus(out_dir: str, n_pages: int, seed: int = 42) -> None:
    """Write the corpus input + sidecar tables to ``out_dir`` (atomic).

    ``pages``/``meta``/``candidates`` stream to disk through
    ``pq.ParquetWriter`` in fixed row-count chunks (a multiple of the
    2048-row groups, so the row-group layout is identical to the former
    single ``write_table``): the generator's peak heap is one chunk of
    bodies plus the truth rows, not the whole corpus — measured ~60 GB
    at 600k pages with the all-in-lists version, which made multi-million-
    page corpora impossible on a 128 GiB box.
    """
    os.makedirs(out_dir, exist_ok=True)
    ir = build_corpus_ir(n_pages, seed)
    rng = random.Random(seed + 1)

    pages_schema = pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("ms")),
        ("html", pa.large_binary()), ("text", pa.large_string()),
        ("lang", pa.string()),
    ])
    _CHUNK = 2048 * 16          # flush cadence; multiple of row_group_size
    pages_cols = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    meta_cols = {"url": [], "page_id": [], "host": [], "path": [], "kind": [],
                 "status_code": [], "content_type_header": [], "size": []}
    truth_rows = []
    cand_rows = []
    cand_schema = pa.schema([("source_url", pa.string()),
                             ("href", pa.string()),
                             ("clean_url", pa.string())])
    pages_w = pq.ParquetWriter(os.path.join(out_dir, "pages.parquet"),
                               pages_schema)
    meta_w: pq.ParquetWriter | None = None
    cand_w = pq.ParquetWriter(os.path.join(out_dir, "candidates.parquet"),
                              cand_schema)

    def _flush_pages() -> None:
        nonlocal meta_w
        if not pages_cols["url"]:
            return
        pages_w.write_table(pa.table(pages_cols, schema=pages_schema),
                            row_group_size=2048)
        mt = pa.table(meta_cols)
        if meta_w is None:
            meta_w = pq.ParquetWriter(os.path.join(out_dir, "meta.parquet"),
                                      mt.schema)
        meta_w.write_table(mt)
        cand_w.write_table(pa.table(
            {k: [r[k] for r in cand_rows]
             for k in ("source_url", "href", "clean_url")},
            schema=cand_schema))
        for c in (pages_cols, meta_cols):
            for v in c.values():
                v.clear()
        cand_rows.clear()

    base_domain = urlparse(f"https://{SEED_URL_RAW}").netloc or SEED_URL_RAW

    for p in ir["pages"]:
        i = p["page_id"]
        if p["kind"] == "pdf":
            body = b"%PDF-1.4 synthetic " + str(i).encode() * 20
            text = ""
        elif p["kind"] == "plain":
            body_s = f"plain text note {i} " + " ".join(
                WORDS[(i + k) % len(WORDS)] for k in range(30))
            if i == 87:
                body_s += " bulk" * 700_000  # ~3.4 MB -> Large Page Size error
            body = body_s.encode()
            text = ""
        else:
            rendered = render_page(p, ir, rng)
            body = rendered["html"].encode("utf-8")
            text = rendered["text"]
            t = rendered["truth"]
            internal, external = _link_count_truth(t, p["url"], base_domain)
            t["internal_links"] = internal
            t["external_links"] = external
            anchor_hrefs = t.pop("anchor_hrefs")
            t.update(status_code=p["status_code"],
                     content_type=p["content_type_header"].split(";")[0],
                     size=len(body), host=p["host"], kind=p["kind"])
            truth_rows.append(t)
            for href, tu in rendered["link_pairs"]:
                cand_rows.append({"source_url": p["url"], "href": href,
                                  "clean_url": tu})
        pages_cols["url"].append(p["url"])
        pages_cols["warc_ts"].append(_EPOCH + timedelta(seconds=i))
        pages_cols["html"].append(body)
        pages_cols["text"].append(text)
        pages_cols["lang"].append(
            truth_rows[-1]["lang"] if p["kind"] == "page" and truth_rows else "")
        meta_cols["url"].append(p["url"])
        meta_cols["page_id"].append(i)
        meta_cols["host"].append(p["host"])
        meta_cols["path"].append(p["path"])
        meta_cols["kind"].append(p["kind"])
        meta_cols["status_code"].append(p["status_code"])
        meta_cols["content_type_header"].append(p["content_type_header"])
        meta_cols["size"].append(len(body))
        if len(pages_cols["url"]) >= _CHUNK:
            _flush_pages()

    _flush_pages()
    pages_w.close()
    if meta_w is not None:
        meta_w.close()
    cand_w.close()

    truth_cols: dict[str, list] = {}
    for key in truth_rows[0]:
        truth_cols[key] = [r[key] for r in truth_rows]
    pq.write_table(pa.table(truth_cols), os.path.join(out_dir, "gen_truth.parquet"))

    robots = _robots_rows(ir)
    pq.write_table(
        pa.table({k: [r[k] for r in robots] for k in ("host", "robots_txt", "crawl_delay")}),
        os.path.join(out_dir, "robots.parquet"))
    sitemaps, expected_sm = _sitemap_rows(ir)
    pq.write_table(
        pa.table({"url": [r["url"] for r in sitemaps],
                  "xml": pa.array([r["xml"] for r in sitemaps], pa.large_binary())}),
        os.path.join(out_dir, "sitemaps.parquet"))
    pq.write_table(
        pa.table({"pos": list(range(len(expected_sm))), "url": expected_sm}),
        os.path.join(out_dir, "expected_sitemap_urls.parquet"))
    pq.write_table(pa.table({"url": [SEED_URL_RAW], "priority": [1.0]}),
                   os.path.join(out_dir, "seeds.parquet"))

    with open(os.path.join(out_dir, "corpus_meta.json"), "w") as f:
        json.dump({"seed": seed, "n_pages": n_pages, "n_hosts": ir["n_hosts"],
                   "seed_url": SEED_URL_RAW, "base_domain": base_domain}, f)
