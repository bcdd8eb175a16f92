"""Live-web fetch adapter behind the corpus ``lookup()`` interface.

Reference semantics (``src/crawler.py:784-819``): an optional HEAD
Content-Length gate before the GET (exceptions from the HEAD itself are
swallowed and the GET proceeds, crawler.py:802-803), then the GET retried
``retries`` extra times with a 1 s backoff between attempts; a fetch that
still fails surfaces as a ``create_empty_result`` row
(``src/core/seo_extractor.py:258-304``) — in this engine the extract
stage produces that row when ``lookup`` yields ``None``, and the
HEAD-gate trip is signalled with :class:`TooLarge` so the body is never
downloaded and the row carries the reference's "File too large" error.

The transport is injectable (anything with ``requests.Session``'s
``head``/``get`` shape) so the adapter is unit-testable without network
access; the default transport needs ``requests`` and is import-gated the
same way as the Playwright renderer (``stages/jsrender.py``). In the
crawl, the fetcher lives inside the per-worker ``FetchExtract`` context
(``stages/extract_stage.py``) so the HTTP session is built once per
worker process and reused across every wave — the actor-pool pattern for
stateful fetch, without re-establishing connections per batch.
"""
from __future__ import annotations

import time


class TooLarge:
    """HEAD gate tripped: Content-Length exceeded max_file_size and the
    body was never downloaded (crawler.py:788-801)."""

    __slots__ = ("content_length",)

    def __init__(self, content_length: int):
        self.content_length = content_length

    def __eq__(self, other):
        return (isinstance(other, TooLarge)
                and other.content_length == self.content_length)

    def __repr__(self):
        return f"TooLarge({self.content_length})"


class LiveFetcher:
    """``lookup(urls) -> list[(body, status, content_type) | TooLarge |
    None]`` over real HTTP — interchangeable with ``BroadcastFetcher`` /
    ``BucketedFetcher`` (corpus_store.py) in the extract stage."""

    def __init__(self, timeout: float = 10.0, retries: int = 3,
                 follow_redirects: bool = True, max_file_size: int = 0,
                 transport=None, backoff_sec: float = 1.0, sleep=time.sleep):
        if transport is None:
            try:
                import requests
            except ImportError as e:  # same env gate shape as jsrender.py:80
                raise NotImplementedError(
                    "live fetching needs the requests package, which is not "
                    "available in this environment; inject a transport or "
                    "use the corpus fetchers") from e
            transport = requests.Session()
        self.transport = transport
        self.timeout = timeout
        self.retries = retries
        self.follow_redirects = follow_redirects
        self.max_file_size = max_file_size
        self.backoff_sec = backoff_sec
        self.sleep = sleep

    def _fetch_one(self, url: str):
        if self.max_file_size > 0:
            try:
                head = self.transport.head(
                    url, timeout=self.timeout,
                    allow_redirects=self.follow_redirects)
                cl = head.headers.get("content-length")
                if cl and int(cl) > self.max_file_size:
                    return TooLarge(int(cl))
            except Exception:
                pass  # HEAD failure is non-fatal: proceed to the GET
        resp = None
        for attempt in range(self.retries + 1):
            try:
                resp = self.transport.get(
                    url, timeout=self.timeout,
                    allow_redirects=self.follow_redirects)
                break
            except Exception:
                if attempt >= self.retries:
                    return None  # extract stage -> empty_result row
                self.sleep(self.backoff_sec)
        body = resp.content
        if isinstance(body, str):
            body = body.encode("utf-8")
        ct = resp.headers.get("content-type", "").split(";")[0]
        return (body, int(resp.status_code), ct)

    def lookup(self, urls: list[str]) -> list:
        return [self._fetch_one(u) for u in urls]
