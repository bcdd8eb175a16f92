"""Property-style tests (hypothesis) for the pure operators."""
from hypothesis import given, settings
from hypothesis import strategies as st

from seo_crawler_ray.functions.urls import canonicalize, strip_www, url_sha1_64
from seo_crawler_ray.pipelines.textops import (
    jaccard, minhash_signature, shingle_hashes, simhash64)

url_path = st.text(alphabet="abcdefghij/-_.0123456789", min_size=0, max_size=30)


@settings(max_examples=200, deadline=None)
@given(url_path)
def test_canonicalize_idempotent(path):
    base = "https://ex.com/"
    once = canonicalize(base, path)
    twice = canonicalize(once, "")
    # canonical form is a fixed point (urljoin with '' keeps the url; the
    # reference's clean-url rebuild never changes an already-clean url)
    assert canonicalize(twice, "") == twice


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=1, max_size=50))
def test_url_hash_deterministic(u):
    assert url_sha1_64(u) == url_sha1_64(u)
    assert 0 <= url_sha1_64(u) < 2 ** 64


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="abc .", min_size=0, max_size=120))
def test_simhash_identical_inputs(t):
    assert simhash64(t) == simhash64(t)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.sampled_from("red green blue cyan teal".split()),
                min_size=0, max_size=40))
def test_minhash_self_similarity(words):
    text = " ".join(words)
    sh = shingle_hashes(text)
    sig = minhash_signature(sh)
    assert (sig == minhash_signature(sh)).all()
    s = set(sh.tolist())
    assert jaccard(s, s) == 1.0


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcwxyz.", min_size=0, max_size=20))
def test_strip_www_at_most_once(netloc):
    out = strip_www("www." + netloc)
    assert out == netloc  # exactly one leading www. removed
