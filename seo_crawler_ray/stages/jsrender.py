"""JavaScript-rendering stage (S5/T5): the browser-pool actor shape.

Reference semantics (/root/reference/src/core/js_renderer.py):
- a pool of ``js_max_concurrent_pages`` browser pages created once at
  startup (js_renderer.py:46-59), checked out per render and returned
  (js_renderer.py:89-102, 140-143),
- render = goto(domcontentloaded, js_timeout) + fixed js_wait_time + page
  content; failures return (None, 0, error) instead of raising
  (js_renderer.py:103-143),
- ``should_use_javascript`` skips obvious non-HTML resource extensions
  (js_renderer.py:144-153).

Playwright is not in this container, so the browser itself is gated behind
an import-try exactly like the decode libs in ``multimodal``: with
``fake=True`` each "page" is a deterministic renderer that injects a
``<!--rendered-->`` marker and a script-materialized DOM node, so the
Ray-side shape — pages created in ``__init__`` (once per actor), bounded
pool checkout per batch row, bounded ``concurrency`` in ``map_batches`` —
is real and tested. A deployment with Playwright installed only swaps the
page factory.
"""
from __future__ import annotations

from urllib.parse import urlparse

import pyarrow as pa

_SKIP_EXTENSIONS = (".pdf", ".jpg", ".jpeg", ".png", ".gif", ".css", ".js",
                    ".xml", ".txt", ".zip")

RENDER_MARKER = "<!--rendered-->"


def should_use_javascript(url: str) -> bool:
    """js_renderer.py:144-153 — extension screen on the URL path (defined
    but never invoked by the reference crawl loop; kept for the standalone
    render query's pass-through behavior)."""
    path = urlparse(url).path.lower()
    return not path.endswith(_SKIP_EXTENSIONS)


def render_html(url: str, html: str) -> str:
    """The deterministic simulated render: inject a script-materialized DOM
    node + marker, mimicking JS mutating the DOM after domcontentloaded.
    Shared by the standalone render stage, the crawl loop's JS mode and the
    sequential oracle — all three must produce identical bytes."""
    extra = f'<div id="js-root" data-url="{url}"></div>{RENDER_MARKER}'
    if "</body>" in html:
        return html.replace("</body>", extra + "</body>", 1)
    return html + extra


class _FakePage:
    """Deterministic stand-in for a Playwright page (render_html + render
    counter for pool-reuse assertions)."""

    def __init__(self, page_id: int):
        self.page_id = page_id
        self.renders = 0

    def render(self, url: str, html: str) -> tuple[str, int, None]:
        self.renders += 1
        return render_html(url, html), 200, None


class JsRenderStage:
    """map_batches actor: page pool in ``__init__`` (once per actor), one
    pool checkout per rendered row, non-renderable URLs pass through with
    ``rendered=False``. Use with ``concurrency=(1, N)`` and a small
    ``batch_size`` — each render holds a browser page."""

    def __init__(self, pool_size: int = 3, fake: bool = True,
                 js_timeout: float = 30.0, js_wait_time: float = 3.0):
        self.js_timeout = js_timeout
        self.js_wait_time = js_wait_time
        if not fake:
            try:
                import playwright.sync_api  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real JS rendering needs Playwright, which is not "
                    "available in this environment; use fake=True") from e
        # pool created once per actor — the expensive setup the actor-pool
        # pattern amortizes (browser launch + N contexts in the real thing)
        self.page_pool = [_FakePage(i) for i in range(pool_size)]

    def _checkout(self):
        return self.page_pool.pop() if self.page_pool else None

    def _checkin(self, page) -> None:
        self.page_pool.append(page)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        out_html, statuses, rendered, errors = [], [], [], []
        for url, html in zip(urls, htmls):
            if isinstance(html, bytes):
                html = html.decode("utf-8", errors="replace")
            if not should_use_javascript(url):
                out_html.append(html)
                statuses.append(200)
                rendered.append(False)
                errors.append("")
                continue
            page = self._checkout()
            if page is None:              # js_renderer.py:113-115
                out_html.append(html)
                statuses.append(0)
                rendered.append(False)
                errors.append("No JavaScript page available")
                continue
            try:
                content, status, err = page.render(url, html)
                out_html.append(content)
                statuses.append(status)
                rendered.append(True)
                errors.append(err or "")
            finally:
                self._checkin(page)       # js_renderer.py:140-143
        return pa.table({
            "url": batch["url"],
            "html": pa.array(out_html, pa.large_string()),
            "status_code": pa.array(statuses, pa.int32()),
            "rendered": pa.array(rendered, pa.bool_()),
            "error": pa.array(errors, pa.string()),
        })


def render_pages(pages_ds, pool_size: int = 3, concurrency=(1, 4),
                 batch_size: int = 32):
    """Dataset wrapper: url+html in, rendered html out (actor pool)."""
    return pages_ds.map_batches(
        JsRenderStage, fn_constructor_kwargs={"pool_size": pool_size},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
