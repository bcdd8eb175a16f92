"""LiveFetcher unit tests with a stub transport — no network.

Pins the reference fetch semantics (src/crawler.py:784-819): HEAD
Content-Length gate (HEAD failures swallowed), GET retried retries+1
times with a 1 s backoff, exhaustion -> None (which the extract stage
maps to the create_empty_result row), and content-type split on ';'.
"""
from seo_crawler_ray.sources.livefetch import LiveFetcher, TooLarge


class _Resp:
    def __init__(self, content=b"", status_code=200, headers=None):
        self.content = content
        self.status_code = status_code
        self.headers = headers or {}


class _StubTransport:
    """Scripted transport: .get pops from a list of responses/exceptions;
    .head returns a fixed response or raises."""

    def __init__(self, gets=(), head=None, head_raises=False):
        self.gets = list(gets)
        self.head_resp = head
        self.head_raises = head_raises
        self.get_calls = []
        self.head_calls = []

    def head(self, url, timeout=None, allow_redirects=None):
        self.head_calls.append(url)
        if self.head_raises:
            raise OSError("head boom")
        return self.head_resp

    def get(self, url, timeout=None, allow_redirects=None):
        self.get_calls.append(url)
        item = self.gets.pop(0)
        if isinstance(item, Exception):
            raise item
        return item


def test_success_returns_body_status_and_bare_content_type():
    t = _StubTransport(gets=[_Resp(b"<html>x</html>", 200,
                                   {"content-type": "text/html; charset=utf-8"})])
    f = LiveFetcher(transport=t)
    assert f.lookup(["https://a.example/"]) == \
        [(b"<html>x</html>", 200, "text/html")]
    assert t.get_calls == ["https://a.example/"]
    assert t.head_calls == []          # no size gate configured


def test_retries_with_backoff_then_succeeds():
    sleeps = []
    t = _StubTransport(gets=[OSError("boom"), OSError("boom"),
                             _Resp(b"ok", 200, {"content-type": "text/html"})])
    f = LiveFetcher(transport=t, retries=3, sleep=sleeps.append)
    assert f.lookup(["u"]) == [(b"ok", 200, "text/html")]
    assert len(t.get_calls) == 3       # 2 failures + 1 success
    assert sleeps == [1.0, 1.0]        # crawler.py:818: time.sleep(1)


def test_retries_exhausted_returns_none_after_retries_plus_one_attempts():
    t = _StubTransport(gets=[OSError("boom")] * 4)
    f = LiveFetcher(transport=t, retries=3, sleep=lambda s: None)
    assert f.lookup(["u"]) == [None]   # extract stage -> empty_result row
    assert len(t.get_calls) == 4       # range(retries + 1)


def test_head_gate_blocks_oversized_body_without_get():
    t = _StubTransport(head=_Resp(headers={"content-length": "5000"}))
    f = LiveFetcher(transport=t, max_file_size=1000)
    assert f.lookup(["u"]) == [TooLarge(5000)]
    assert t.get_calls == []           # body never downloaded
    assert t.head_calls == ["u"]


def test_head_failure_is_swallowed_and_get_proceeds():
    t = _StubTransport(gets=[_Resp(b"ok", 200, {})], head_raises=True)
    f = LiveFetcher(transport=t, max_file_size=1000)
    assert f.lookup(["u"]) == [(b"ok", 200, "")]


def test_head_under_limit_proceeds_to_get():
    t = _StubTransport(gets=[_Resp(b"ok", 201, {"content-type": "a/b"})],
                       head=_Resp(headers={"content-length": "10"}))
    f = LiveFetcher(transport=t, max_file_size=1000)
    assert f.lookup(["u"]) == [(b"ok", 201, "a/b")]


def test_extract_stage_maps_toolarge_to_empty_result_row():
    """The TooLarge sentinel must become the reference's
    create_empty_result row (status 0, 'File too large' error) without the
    extractor ever seeing a body."""
    from seo_crawler_ray.stages.extract_stage import FetchExtract

    fx = object.__new__(FetchExtract)   # bypass ctor: no Ray refs needed
    fx.enable_js = False
    fx.max_file_size = 1000
    fx.base_domain = "a.example"
    fx.crawl_external = False
    row = fx._one("https://a.example/big", 1, 7, 3, 0, TooLarge(5000))
    assert row["status_code"] == 0
    assert row["error"] == "File too large: 5000 bytes"
    assert row["word_count"] == 0 and row["title"] == ""
    assert row["_outlinks"] == [] and row["_links"] == []


def test_mixed_lookup_preserves_positions():
    t = _StubTransport(gets=[_Resp(b"a", 200, {}), OSError("x"), OSError("x")],
                       head=_Resp(headers={}))
    f = LiveFetcher(transport=t, retries=1, sleep=lambda s: None)
    out = f.lookup(["u1", "u2"])
    assert out[0] == (b"a", 200, "")
    assert out[1] is None
