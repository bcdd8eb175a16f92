"""SEO issue rules — exact reference semantics.

All rules cited into /root/reference/src/core/issue_detector.py:
title (42-70), meta description (72-100), h1 (102-113), thin content
(115-127), status/canonical (129-176), viewport (178-189), accessibility
(191-214), social (216-236), structured data (238-249), performance
(251-290), indexability (292-313), URL path exclusion via fnmatch
(433-445), duplication similarity (315-431).

The per-page rules are pure row functions (no shuffle); they run inside the
extract ``map_batches`` stage. Duplication is O(n^2) SequenceMatcher by
reference semantics — the engine distributes the pair blocks but keeps the
exact math (parity mode is bounded to a deterministic subset; SURVEY.md §2.7
D4 notes blocked/banded mode as the scale path).
"""
from __future__ import annotations

from difflib import SequenceMatcher
from fnmatch import fnmatch
from urllib.parse import urlparse

_STATUS_MESSAGES = {
    400: "Bad Request", 401: "Unauthorized", 403: "Forbidden", 404: "Not Found",
    405: "Method Not Allowed", 406: "Not Acceptable", 408: "Request Timeout",
    410: "Gone", 429: "Too Many Requests", 500: "Internal Server Error",
    501: "Not Implemented", 502: "Bad Gateway", 503: "Service Unavailable",
    504: "Gateway Timeout", 505: "HTTP Version Not Supported",
}


def status_message(code: int) -> str:
    return _STATUS_MESSAGES.get(code, f"HTTP {code} Error")


def path_excluded(url: str, patterns: list[str]) -> bool:
    """issue_detector.py:433-445 — fnmatch on the URL *path*."""
    path = urlparse(url).path
    for pattern in patterns:
        if "*" in pattern:
            if fnmatch(path, pattern):
                return True
        elif path == pattern or path.startswith(pattern.rstrip("*")):
            return True
    return False


def detect_page_issues(result: dict) -> list[dict]:
    url = result.get("url", "")
    issues: list[dict] = []

    def add(type_, category, issue, details):
        issues.append({"url": url, "type": type_, "category": category,
                       "issue": issue, "details": details})

    title = result.get("title", "")
    if not title:
        add("error", "SEO", "Missing Title Tag", "Page has no title tag")
    elif len(title) > 60:
        add("warning", "SEO", "Title Too Long",
            f"Title is {len(title)} characters (recommended: ≤60)")
    elif len(title) < 30:
        add("warning", "SEO", "Title Too Short",
            f"Title is {len(title)} characters (recommended: 30-60)")

    meta_desc = result.get("meta_description", "")
    if not meta_desc:
        add("error", "SEO", "Missing Meta Description", "Page has no meta description")
    elif len(meta_desc) > 160:
        add("warning", "SEO", "Meta Description Too Long",
            f"Description is {len(meta_desc)} characters (recommended: ≤160)")
    elif len(meta_desc) < 120:
        add("warning", "SEO", "Meta Description Too Short",
            f"Description is {len(meta_desc)} characters (recommended: 120-160)")

    if not result.get("h1"):
        add("error", "SEO", "Missing H1 Tag", "Page has no H1 heading")

    word_count = result.get("word_count", 0)
    if word_count < 300:
        add("warning", "Content", "Thin Content",
            f"Page has only {word_count} words (recommended: ≥300)")

    status_code = result.get("status_code", 0)
    if 400 <= status_code < 500:
        add("error", "Technical", f"{status_code} Client Error", status_message(status_code))
    elif status_code >= 500:
        add("error", "Technical", f"{status_code} Server Error", status_message(status_code))
    elif 300 <= status_code < 400:
        add("info", "Technical", f"{status_code} Redirect",
            "URL redirects to another location")

    canonical_url = result.get("canonical_url", "")
    if not canonical_url:
        add("warning", "Technical", "Missing Canonical URL",
            "Page has no canonical URL specified")
    elif canonical_url != url:
        add("warning", "Technical", "Canonical URL Different",
            f"Canonical points to: {canonical_url}")

    if not result.get("viewport"):
        add("error", "Mobile", "Missing Viewport Meta Tag", "Page is not mobile-optimized")

    if not result.get("lang"):
        add("warning", "Accessibility", "Missing Language Attribute",
            "HTML tag has no lang attribute")

    if "n_images" in result:        # precomputed by the vectorized stage
        n_img, n_noalt = result["n_images"], result["images_without_alt"]
    else:
        images = result.get("images", [])
        n_img = len(images)
        n_noalt = sum(1 for img in images if not img.get("alt"))
    if n_noalt:
        add("warning", "Accessibility", "Images Without Alt Text",
            f"{n_noalt} of {n_img} images lack alt text")

    if not result.get("og_tags"):
        add("warning", "Social", "Missing OpenGraph Tags",
            "Page has no OpenGraph tags for social sharing")
    if not result.get("twitter_tags"):
        add("warning", "Social", "Missing Twitter Card Tags",
            "Page has no Twitter Card tags")

    if not result.get("json_ld") and not result.get("schema_org"):
        add("info", "Structured Data", "No Structured Data",
            "Page has no JSON-LD or Schema.org markup")

    response_time = result.get("response_time", 0)
    js_rendered = bool(result.get("javascript_rendered", False))
    page_size = result.get("size", 0)
    if not js_rendered and response_time > 3000:
        add("error", "Performance", "Slow Response Time",
            f"Page took {response_time}ms to respond (recommended: <3000ms)")
    elif not js_rendered and response_time > 1000:
        add("warning", "Performance", "Moderate Response Time",
            f"Page took {response_time}ms to respond (recommended: <1000ms)")
    if page_size > 3 * 1024 * 1024:
        add("error", "Performance", "Large Page Size",
            f"Page size is {page_size / 1024 / 1024:.1f}MB (recommended: <3MB)")
    elif page_size > 1 * 1024 * 1024:
        add("warning", "Performance", "Moderate Page Size",
            f"Page size is {page_size / 1024 / 1024:.1f}MB (recommended: <1MB)")

    robots = result.get("robots", "").lower()
    if "noindex" in robots:
        add("error", "Indexability", "Noindex Tag Present",
            "Page is BLOCKED from search engines - has noindex directive")
    if "nofollow" in robots:
        add("error", "Indexability", "Nofollow Tag Present",
            "Links on this page are NOT followed by search engines - has nofollow directive")

    return issues


def content_similarity(r1: dict, r2: dict) -> float:
    """issue_detector.py:377-425 — weighted title/desc/h1/word-count score."""
    t1, t2 = r1.get("title", "").lower().strip(), r2.get("title", "").lower().strip()
    d1, d2 = (r1.get("meta_description", "").lower().strip(),
              r2.get("meta_description", "").lower().strip())
    h1, h2 = r1.get("h1", "").lower().strip(), r2.get("h1", "").lower().strip()
    w1, w2 = r1.get("word_count", 0), r2.get("word_count", 0)

    title_sim = SequenceMatcher(None, t1, t2).ratio() if t1 and t2 else 0
    desc_sim = SequenceMatcher(None, d1, d2).ratio() if d1 and d2 else 0
    h1_sim = SequenceMatcher(None, h1, h2).ratio() if h1 and h2 else 0
    if w1 and w2:
        wc_sim = min(w1, w2) / max(w1, w2) if max(w1, w2) > 0 else 0
    else:
        wc_sim = 0
    return title_sim * 0.35 + desc_sim * 0.35 + h1_sim * 0.20 + wc_sim * 0.10


def duplication_pair_issues(r1: dict, r2: dict, threshold: float) -> list[dict]:
    similarity = content_similarity(r1, r2)
    if similarity < threshold:
        return []
    u1, u2 = r1.get("url", ""), r2.get("url", "")
    return [
        {"url": u1, "type": "warning", "category": "Duplication",
         "issue": "Duplicate Content Detected",
         "details": f"Content is {similarity * 100:.1f}% similar to {u2}"},
        {"url": u2, "type": "warning", "category": "Duplication",
         "issue": "Duplicate Content Detected",
         "details": f"Content is {similarity * 100:.1f}% similar to {u1}"},
    ]


def duplication_issues(results: list[dict], threshold: float,
                       exclusion_patterns: list[str]) -> list[dict]:
    """Sequential O(n^2) pass in (i, j>i) order — issue_detector.py:315-375."""
    issues: list[dict] = []
    kept = [r for r in results
            if not path_excluded(r.get("url", ""), exclusion_patterns)]
    for i, r1 in enumerate(kept):
        for r2 in kept[i + 1:]:
            issues.extend(duplication_pair_issues(r1, r2, threshold))
    return issues
