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


# --------------------------------------------------- fast-scanner fuzz ----
_frag = st.one_of(
    st.text(alphabet="ab <>&;#x/=\"'!?-\n\tA1", min_size=0, max_size=12),
    st.sampled_from([
        "<div>", "</div>", "<p class='x'>", "<img src=a.png>", "<br/>",
        "&amp;", "&lt;", "&#65;", "&bogus;", "<!-- c -->", "<!doctype html>",
        "<script>", "</script>", "a<b", "<a href=\"/x?a=1&amp;b\">",
        "<SPAN Data-X='q>r'>", "</span>", "<td nowrap>", "text",
        "<style>", "</style>", "<ul><li>i<li>j</ul>", "<?pi?>",
        # truncated/near-miss CDATA closers (ADVICE r02: old scanner hung)
        "</script", "</style", "</script foo", "</scriptz>",
    ]),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_frag, min_size=0, max_size=14))
def test_fast_scanner_fuzz_parity(frags):
    """Random tag-soup: the regex scanner must match html.parser on tree
    shape, element index, attributes and extracted text. Adjacent text
    chunks are merged before comparing — chunk granularity differs on
    malformed '<'-as-text inputs and is semantically irrelevant (.string
    is only read inside script CDATA, which is single-chunk in both)."""
    from seo_crawler_ray.htmlparse.dom import parse_html_indexed, parse_html_stdlib
    html = "".join(frags)

    def sig(doc):
        els = [(e.name, tuple(sorted(e.attrs.items()))) for e in doc.elements]

        def walk(node):
            out, buf = [], []
            for c in node.children:
                if isinstance(c, str):
                    buf.append(c)
                else:
                    if buf:
                        out.append(("T", "".join(buf)))
                        buf = []
                    out.append(("E", c.name,
                                tuple(sorted(c.attrs.items())), walk(c)))
            if buf:
                out.append(("T", "".join(buf)))
            return tuple(out)

        return els, doc.get_text(), walk(doc.root)

    assert sig(parse_html_indexed(html)) == sig(parse_html_stdlib(html)), html


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(min_value=-1e9, max_value=1e9,
                          allow_nan=False), min_size=1, max_size=20))
def test_round_half_up_matches_decimal(xs):
    """round_half_up == decimal ROUND_HALF_UP (DuckDB ROUND) wherever the
    double is exactly representable enough to decide the .5 case."""
    import numpy as np
    from decimal import Decimal, ROUND_HALF_UP
    from seo_crawler_ray.pipelines.arrowutil import round_half_up
    got = round_half_up(np.array(xs))
    for x, g in zip(xs, got):
        want = int(Decimal(repr(x)).quantize(0, rounding=ROUND_HALF_UP)) \
            if abs(x - int(x)) in (0.5,) else None
        # exact .5 boundary: half away from zero
        if want is not None:
            assert g == want, (x, g, want)
        else:
            assert abs(g - x) <= 0.5 + 1e-9


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.sampled_from("abcde"),
                          st.text(alphabet="xyz", max_size=3)),
                min_size=0, max_size=8),
       st.sampled_from("abcde"))
def test_map_col_get_matches_dict(pairs, key):
    """arrowutil.map_col_get == dict(pairs).get(key, '') (last key wins)."""
    import pyarrow as pa
    from seo_crawler_ray.pipelines.arrowutil import map_col_get
    arr = pa.array([pairs], pa.map_(pa.string(), pa.string()))
    got = map_col_get(arr, key)[0].as_py()
    assert got == dict(pairs).get(key, "")


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="ab c", min_size=0, max_size=60))
def test_winnow_matches_bruteforce(text):
    """winnow_batch == the naive reference: md5 every k-gram, take the min
    hex per length-w window, distinct per doc."""
    import hashlib
    import pyarrow as pa
    from seo_crawler_ray.pipelines.textops import winnow_batch
    k, w = 8, 16
    out = winnow_batch(pa.table({"doc_id": [0], "text": [text]}),
                       k=k, w=w)
    got = set(out["fp"].to_pylist())
    n = max(len(text) - k + 1, 1)
    grams = [hashlib.md5(text[i:i + k].encode()).hexdigest()
             for i in range(n)]
    want = set()
    if n >= w:
        for i in range(w - 1, n):
            want.add(min(grams[i - w + 1:i + 1]))
    assert got == want


def test_no_bankers_rounding_in_pipelines():
    """Lint gate (VERDICT r02 #9): oracle-compared paths must not use
    banker's rounding — np.round / pyarrow.compute.round round half-to-even
    while DuckDB ROUND is half-up, which silently diverges on exact .5
    values. New code must go through arrowutil.round_half_up."""
    import pathlib
    import re
    root = pathlib.Path(__file__).resolve().parents[1] / "seo_crawler_ray"
    pat = re.compile(r"\b(?:np|numpy)\.round\(|\bpc\.round\(|"
                     r"\bcompute\.round\(")
    offenders = []
    for p in root.rglob("*.py"):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if pat.search(line) and "round_half_up" not in line \
                    and not line.lstrip().startswith("#"):
                offenders.append(f"{p.relative_to(root)}:{i}: {line.strip()}")
    assert not offenders, \
        "banker's rounding in oracle paths (use arrowutil.round_half_up):\n" \
        + "\n".join(offenders)


@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=60), min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_tokenizer_matches_duckdb_regexp(texts):
    """The [a-z0-9]+ token stream — the contract every text oracle rests
    on — must agree between Python re.findall(lower()) and DuckDB
    regexp_extract_all(lower()) over the printable-ASCII corpus domain."""
    import duckdb
    from seo_crawler_ray.pipelines.textops import LOWER_WORD_RE
    con = duckdb.connect()
    got = con.execute(
        "SELECT regexp_extract_all(lower(t), '[a-z0-9]+') FROM "
        "(SELECT unnest(?) AS t)", [texts]).fetchall()
    for t, (sql_toks,) in zip(texts, got):
        assert LOWER_WORD_RE.findall(t.lower()) == sql_toks


@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1,
                max_size=300))
@settings(max_examples=200, deadline=None)
def test_hist_quantile_core_matches_bruteforce(values):
    """The shared quantile core must equal the sorted-list definition:
    q-th percentile = element at ceil(q*n/100) (1-indexed)."""
    import numpy as np
    from seo_crawler_ray.pipelines.textops import _hist_quantile_values
    qs = (1, 25, 50, 75, 90, 99, 100)
    wcs, cnts = np.unique(np.array(values, np.int64), return_counts=True)
    got = _hist_quantile_values(wcs, cnts, qs)
    s = sorted(values)
    n = len(s)
    want = [s[(q * n + 99) // 100 - 1] for q in qs]
    assert got == want


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=400), st.integers(min_value=1, max_value=399))
@settings(max_examples=100, deadline=None)
def test_hll_register_merge_equivalence(ids, cut):
    """Register-max merge of any split == sequential build over the whole
    set (the associativity that makes per-batch HLL partials exact)."""
    import numpy as np
    from seo_crawler_ray.pipelines.events import _hll_registers
    a = np.array(ids[:cut] or [0], np.int64)
    b = np.array(ids[cut:] or [0], np.int64)
    whole = np.array((ids[:cut] or [0]) + (ids[cut:] or [0]), np.int64)
    merged = np.maximum(_hll_registers(a), _hll_registers(b))
    assert (merged == _hll_registers(whole)).all()
