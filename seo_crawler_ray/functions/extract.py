"""Fused per-page SEO extraction — reference-parity semantics.

One parse per page feeds every extractor, exactly as the reference reuses a
single soup across its ten extractor calls (src/crawler.py:870-902). All
semantics cited into /root/reference:

- basic fields / headings / word count / lang / charset:
  src/core/seo_extractor.py:10-49
- meta tag map + named fields + canonical: seo_extractor.py:51-79
- og: / twitter: tag maps (prefix stripped with str.replace, reproducing the
  reference's replace-all quirk): seo_extractor.py:81-103
- JSON-LD scripts, invalid silently skipped: seo_extractor.py:105-115
- analytics regexes over the *decoded* HTML: seo_extractor.py:117-156
- first-20 images with src absolutization rules: seo_extractor.py:158-182
- internal/external link counts with www-strip compare: seo_extractor.py:184-202
- hreflang alternates: seo_extractor.py:204-216
- schema.org microdata walk: seo_extractor.py:218-255
- empty result shape: seo_extractor.py:257-304
- link records incl. anchor truncation + placement ancestor walk:
  src/core/link_manager.py:57-156
- frontier outlink extraction (skips ''/#/mailto:/tel:, NOT javascript:;
  excludes self-links): src/core/link_manager.py:22-55
"""
from __future__ import annotations

import json
import re
from functools import lru_cache

import numpy as _np
from urllib.parse import urljoin, urlparse

from ..htmlparse.dom import Node, parse_html
from .urls import canonicalize, strip_www

# every maximal \w+ run matches r'\b\w+\b' exactly once, so the count is
# identical to the reference's len(findall(r'\b\w+\b')) minus the \b
# lookaround cost (seo_extractor.py:32-34)
_WORD_RE = re.compile(r"\w+")

# ASCII \w lookup for the vectorized word-count fast path: for code points
# < 128, Python's unicode \w is exactly [A-Za-z0-9_]
_ASCII_WORD_MASK = _np.zeros(256, dtype=bool)
_ASCII_WORD_MASK[ord("0"):ord("9") + 1] = True
_ASCII_WORD_MASK[ord("A"):ord("Z") + 1] = True
_ASCII_WORD_MASK[ord("a"):ord("z") + 1] = True
_ASCII_WORD_MASK[ord("_")] = True


def _count_words(text: str) -> int:
    """len(_WORD_RE.findall(text)) without materializing the word list.

    Counts maximal \\w+ runs as 0->1 mask transitions over the byte array —
    identical to the findall count whenever the text is pure ASCII (the
    common case); non-ASCII falls back to the regex."""
    if not text.isascii():
        return len(_WORD_RE.findall(text))
    arr = _np.frombuffer(text.encode("ascii"), dtype=_np.uint8)
    if arr.size == 0:
        return 0
    mask = _ASCII_WORD_MASK[arr]
    return int(mask[0]) + int(_np.count_nonzero(mask[1:] & ~mask[:-1]))
_OG_RE = re.compile(r"^og:")
_TWITTER_RE = re.compile(r"^twitter:")
_GA4_RE = re.compile(r"G-[A-Z0-9]{10}")
_GTM_RE = re.compile(r"GTM-[A-Z0-9]+")
_GA_PATTERNS = [
    re.compile(r"gtag\(", re.IGNORECASE),
    re.compile(r"ga\(", re.IGNORECASE),
    re.compile(r"GoogleAnalyticsObject", re.IGNORECASE),
    re.compile(r"google-analytics\.com", re.IGNORECASE),
    re.compile(r"googletagmanager\.com", re.IGNORECASE),
]
_FB_RE = re.compile(r"fbq\(|facebook\.com/tr", re.IGNORECASE)
_HOTJAR_RE = re.compile(r"hotjar\.com|hj\(", re.IGNORECASE)
_MIXPANEL_RE = re.compile(r"mixpanel\.com|mixpanel\.track", re.IGNORECASE)
_CHARSET_RE = re.compile(r"charset=([^;]+)")

_NAV_KEYWORDS = ("nav", "menu", "header")


def empty_result(url: str, depth: int, status_code: int = 0, error: str | None = None) -> dict:
    """seo_extractor.py:257-304 (create_empty_result)."""
    return {
        "url": url,
        "status_code": status_code,
        "content_type": "",
        "size": 0,
        "is_internal": False,
        "depth": depth,
        "title": "",
        "meta_description": "",
        "h1": "",
        "h2": [],
        "h3": [],
        "word_count": 0,
        "meta_tags": {},
        "og_tags": {},
        "twitter_tags": {},
        "canonical_url": "",
        "lang": "",
        "charset": "",
        "viewport": "",
        "robots": "",
        "author": "",
        "keywords": "",
        "generator": "",
        "theme_color": "",
        "json_ld": [],
        "analytics": {
            "google_analytics": False,
            "gtag": False,
            "ga4_id": "",
            "gtm_id": "",
            "facebook_pixel": False,
            "hotjar": False,
            "mixpanel": False,
        },
        "images": [],
        "external_links": 0,
        "internal_links": 0,
        "response_time": 0,
        "redirects": [],
        "hreflang": [],
        "schema_org": [],
        "linked_from": [],
        # absent key in the reference's result dicts == False (crawler.py:978
        # sets it only on the JS-rendered path; issue_detector.py:255 reads
        # it with .get(..., False))
        "javascript_rendered": False,
        "error": error,
    }


def extract_page(
    html: bytes,
    url: str,
    depth: int,
    base_domain: str,
    status_code: int,
    content_type_header: str,
    is_internal_flag: bool,
) -> tuple[dict, list[dict], list[tuple[str, str]]]:
    """Extract the full page record, link records, and frontier outlinks.

    Returns ``(result, link_records, outlinks)`` where outlinks are
    ``(clean_target_url, raw_href)`` in document order — the caller applies
    the seen/should-crawl gates (link_manager.py:40-55). Non-HTML content
    types skip parsing entirely (src/crawler.py:869-871).
    """
    result = empty_result(url, depth, status_code)
    del result["error"]
    result["content_type"] = content_type_header.split(";")[0]
    result["size"] = len(html)
    result["is_internal"] = is_internal_flag

    link_records: list[dict] = []
    outlinks: list[tuple[str, str]] = []

    if "text/html" not in content_type_header:
        return result, link_records, outlinks

    from ..htmlparse.dom import parse_html_indexed
    soup = parse_html_indexed(html)
    html_text = html.decode("utf-8", errors="replace")

    _basic_seo(soup, result)
    _meta_tags(soup, result)
    _og_twitter(soup, result)
    _json_ld(soup, result)
    _analytics(html_text, result)
    _images(soup, url, result)
    _hreflang(soup, result)
    _schema_org(soup, result)

    link_records, outlinks = _links_fused(soup, url, base_domain, result)

    return result, link_records, outlinks


@lru_cache(maxsize=1 << 16)
def _page_origin(page_url: str) -> str:
    p = urlparse(page_url)
    return f"{p.scheme}://{p.netloc}"


@lru_cache(maxsize=1 << 17)
def _resolve_cached(base: str, href: str):
    """urljoin+urlparse+clean-url, memoized worker-wide. ``base`` is '' for
    absolute hrefs, the page origin for root-/scheme-relative ones, and the
    full page URL otherwise — exactly the inputs urljoin depends on, so the
    result is byte-identical to urljoin(page_url, href) in every case."""
    parsed = urlparse(urljoin(base, href))
    clean = f"{parsed.scheme}://{parsed.netloc}{parsed.path}"
    if parsed.query:
        clean += f"?{parsed.query}"
    return parsed, clean


def _links_fused(soup, page_url: str, base_domain: str,
                 result: dict) -> tuple[list[dict], list[tuple[str, str]]]:
    """One pass over the anchors computing link counts (M11,
    seo_extractor.py:184-202), link records (M16, link_manager.py:57-124)
    and frontier outlinks (M15, link_manager.py:22-55) with the urljoin /
    urlparse / clean-url work memoized per distinct href. Byte-identical to
    running the three reference passes separately (each anchor is processed
    independently in document order); a parity test asserts equivalence
    against the unfused functions."""
    base_clean = strip_www(base_domain)
    anchors = [a for a in soup.find_all("a") if a.has_attr("href")]
    origin = _page_origin(page_url)

    def resolved(href: str):
        # absolute and root-/scheme-relative hrefs resolve identically for
        # every page of the same origin, so the worker-wide LRU hits across
        # pages (nav/footer links repeat site-wide); only path-relative
        # hrefs key on the full page URL
        if href.startswith(("http://", "https://")):
            return _resolve_cached("", href)
        if href.startswith("/"):
            return _resolve_cached(origin, href)
        return _resolve_cached(page_url, href)

    records: list[dict] = []
    outlinks: list[tuple[str, str]] = []
    seen_targets: set[str] = set()

    for link in anchors:
        raw = link.get("href", "") or ""
        # M11 counts: raw (unstripped) href
        if raw and not raw.startswith(("#", "mailto:", "tel:", "javascript:")):
            parsed, _ = resolved(raw)
            if strip_www(parsed.netloc) == base_clean:
                result["internal_links"] += 1
            else:
                result["external_links"] += 1

        href = raw.strip()
        if not href or href.startswith("#"):
            continue
        if href.startswith("mailto:") or href.startswith("tel:"):
            continue
        # M16 link record
        anchor_text = link.get_text().strip()[:100]
        try:
            parsed_target, clean_url = resolved(href)
            if clean_url not in seen_targets:
                seen_targets.add(clean_url)
                records.append({
                    "source_url": page_url,
                    "target_url": clean_url,
                    "anchor_text": anchor_text or "(no text)",
                    "is_internal": strip_www(parsed_target.netloc) == base_clean,
                    "target_domain": parsed_target.netloc,
                    "target_status": None,
                    "placement": detect_link_placement(link),
                })
        except Exception:
            continue
        # M15 frontier candidate (self-links excluded)
        if clean_url != page_url:
            outlinks.append((clean_url, href))

    return records, outlinks


def _basic_seo(soup: Node, result: dict) -> None:
    title_tag = soup.find("title")
    result["title"] = title_tag.get_text().strip() if title_tag else ""

    meta_desc = soup.find("meta", name="description")
    result["meta_description"] = (meta_desc.get("content", "") or "").strip() if meta_desc else ""

    h1_tag = soup.find("h1")
    result["h1"] = h1_tag.get_text().strip() if h1_tag else ""
    result["h2"] = [h.get_text().strip() for h in soup.find_all("h2", limit=10)]
    result["h3"] = [h.get_text().strip() for h in soup.find_all("h3", limit=10)]

    # same count as the reference's len(re.findall(r'\b\w+\b', text)),
    # seo_extractor.py:32-34; findall runs the scan loop in C
    result["word_count"] = _count_words(soup.get_text())

    html_tag = soup.find("html")
    result["lang"] = html_tag.get("lang", "") if html_tag else ""

    charset_meta = soup.find("meta", charset=True)
    if charset_meta:
        result["charset"] = charset_meta.get("charset", "")
    else:
        ct_meta = soup.find("meta", **{"http-equiv": "Content-Type"})
        if ct_meta:
            m = _CHARSET_RE.search(ct_meta.get("content", ""))
            result["charset"] = m.group(1) if m else ""


def _meta_tags(soup: Node, result: dict) -> None:
    for meta in soup.find_all("meta"):
        name = (meta.get("name", "") or "").lower()
        content = meta.get("content", "") or ""
        if name:
            result["meta_tags"][name] = content
            if name == "viewport":
                result["viewport"] = content
            elif name == "robots":
                result["robots"] = content
            elif name == "author":
                result["author"] = content
            elif name == "keywords":
                result["keywords"] = content
            elif name == "generator":
                result["generator"] = content
            elif name == "theme-color":
                result["theme_color"] = content

    canonical = soup.find("link", rel="canonical")
    result["canonical_url"] = canonical.get("href", "") if canonical else ""


def _og_twitter(soup: Node, result: dict) -> None:
    for meta in soup.find_all("meta", property=_OG_RE):
        prop = meta.get("property", "")
        if prop:
            result["og_tags"][prop.replace("og:", "")] = meta.get("content", "") or ""
    for meta in soup.find_all("meta", name=_TWITTER_RE):
        name = meta.get("name", "")
        if name:
            result["twitter_tags"][name.replace("twitter:", "")] = meta.get("content", "") or ""


def _json_ld(soup: Node, result: dict) -> None:
    for script in soup.find_all("script", type="application/ld+json"):
        try:
            result["json_ld"].append(json.loads(script.string))
        except (json.JSONDecodeError, AttributeError, TypeError):
            continue


def _analytics(html_text: str, result: dict) -> None:
    """seo_extractor.py:117-156. Every reference pattern except the two id
    regexes is a *literal* string under IGNORECASE, so each is replaced by a
    substring test on one lowercased copy (identical semantics, one scan of
    the page instead of nine); the id regexes only run behind 'G-'/'GTM-'
    prefilters."""
    a = result["analytics"]
    if "G-" in html_text:
        m = _GA4_RE.search(html_text)
        if m:
            a["ga4_id"] = m.group()
            a["gtag"] = True
    if "GTM-" in html_text:
        m = _GTM_RE.search(html_text)
        if m:
            a["gtm_id"] = m.group()
    lower = html_text.lower()
    # gtag( | ga( | GoogleAnalyticsObject | google-analytics.com |
    # googletagmanager.com  (seo_extractor.py:121-127, first match wins)
    if ("gtag(" in lower or "ga(" in lower or "googleanalyticsobject" in lower
            or "google-analytics.com" in lower
            or "googletagmanager.com" in lower):
        a["google_analytics"] = True
    if "fbq(" in lower or "facebook.com/tr" in lower:
        a["facebook_pixel"] = True
    if "hotjar.com" in lower or "hj(" in lower:
        a["hotjar"] = True
    if "mixpanel.com" in lower or "mixpanel.track" in lower:
        a["mixpanel"] = True


def _images(soup: Node, base_url: str, result: dict) -> None:
    for img in soup.find_all("img")[:20]:
        src = img.get("src", "") or ""
        alt = img.get("alt", "") or ""
        if src:
            if src.startswith("//"):
                src = "https:" + src
            elif src.startswith("/"):
                pb = urlparse(base_url)
                src = f"{pb.scheme}://{pb.netloc}{src}"
            elif not src.startswith(("http://", "https://")):
                src = urljoin(base_url, src)
            result["images"].append(
                {
                    "src": src,
                    "alt": alt,
                    "width": img.get("width", "") or "",
                    "height": img.get("height", "") or "",
                }
            )


def _link_counts(soup: Node, page_url: str, base_domain: str, result: dict) -> None:
    base_clean = strip_www(base_domain)
    for link in soup.find_all("a", href=True):
        href = link.get("href", "")
        if href and not href.startswith(("#", "mailto:", "tel:", "javascript:")):
            absolute_url = urljoin(page_url, href)
            if strip_www(urlparse(absolute_url).netloc) == base_clean:
                result["internal_links"] += 1
            else:
                result["external_links"] += 1


def _hreflang(soup: Node, result: dict) -> None:
    for link in soup.find_all("link", rel="alternate", hreflang=True):
        hreflang = link.get("hreflang", "")
        href = link.get("href", "")
        if hreflang and href:
            result["hreflang"].append({"lang": hreflang, "url": href})


def _schema_org(soup: Node, result: dict) -> None:
    for item in soup.find_all(itemtype=True):
        itemtype = item.get("itemtype", "")
        if itemtype:
            props: dict[str, str] = {}
            for prop_elem in item.find_all(itemprop=True):
                prop_name = prop_elem.get("itemprop", "")
                if prop_elem.name == "meta":
                    content = prop_elem.get("content", "")
                elif prop_elem.name == "img":
                    content = prop_elem.get("src", "")
                elif prop_elem.name == "a":
                    content = prop_elem.get("href", "")
                else:
                    content = prop_elem.get_text().strip()
                if prop_name and content:
                    props[prop_name] = content
            result["schema_org"].append({"type": itemtype, "properties": props})


def collect_link_records(soup: Node, source_url: str, base_domain: str) -> list[dict]:
    """link_manager.py:57-124 — full edge records, deduped on source|target.

    Because a source URL is crawled exactly once globally (URL-seen set), the
    reference's global ``source|target`` dedup reduces to within-page dedup.
    """
    base_clean = strip_www(base_domain)
    records: list[dict] = []
    seen_targets: set[str] = set()
    for link in soup.find_all("a", href=True):
        href = (link.get("href", "") or "").strip()
        if not href or href.startswith("#"):
            continue
        if href.startswith("mailto:") or href.startswith("tel:"):
            continue
        anchor_text = link.get_text().strip()[:100]
        try:
            parsed_target = urlparse(urljoin(source_url, href))
            clean_url = f"{parsed_target.scheme}://{parsed_target.netloc}{parsed_target.path}"
            if parsed_target.query:
                clean_url += f"?{parsed_target.query}"
            if clean_url in seen_targets:
                continue
            seen_targets.add(clean_url)
            records.append(
                {
                    "source_url": source_url,
                    "target_url": clean_url,
                    "anchor_text": anchor_text or "(no text)",
                    "is_internal": strip_www(parsed_target.netloc) == base_clean,
                    "target_domain": parsed_target.netloc,
                    "target_status": None,
                    "placement": detect_link_placement(link),
                }
            )
        except Exception:
            continue
    return records


def detect_link_placement(link_element: Node) -> str:
    """link_manager.py:126-156 — ancestor walk for footer/navigation."""
    current = link_element.parent
    while current is not None and current.name and current.name != "[document]":
        if current.name == "footer":
            return "footer"
        classes_str = (current.get("class", "") or "").lower()
        element_id = (current.get("id", "") or "").lower()
        if "footer" in classes_str or "footer" in element_id:
            return "footer"
        if current.name in ("nav", "header"):
            return "navigation"
        if any(k in classes_str or k in element_id for k in _NAV_KEYWORDS):
            return "navigation"
        current = current.parent
    return "body"


def extract_outlinks(soup: Node, current_url: str) -> list[tuple[str, str]]:
    """link_manager.py:22-55 — frontier candidates ``(clean_url, href)`` in
    document order. Skips ''/#/mailto:/tel: (NOT javascript:, matching the
    reference quirk); self-links excluded."""
    out: list[tuple[str, str]] = []
    for link in soup.find_all("a", href=True):
        href = (link.get("href", "") or "").strip()
        if not href or href.startswith("#") or href.startswith("mailto:") or href.startswith("tel:"):
            continue
        clean_url = canonicalize(current_url, href)
        if clean_url == current_url:
            continue
        out.append((clean_url, href))
    return out
