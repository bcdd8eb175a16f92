"""Partition-invariance sweep: every shuffle-dependent operator must
produce IDENTICAL results regardless of input block layout — the
distributed-correctness property that catches block-order dependence
(first-seen-wins bugs, partial-combiner asymmetries, driver reduces that
assume arrival order)."""
import numpy as np
import pandas as pd
import pytest


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def docs_pdf():
    rng = np.random.RandomState(41)
    vocab = np.array([f"w{i}" for i in range(80)])
    texts = [" ".join(rng.choice(vocab, rng.randint(5, 60)))
             for _ in range(180)]
    texts[20] = texts[0]                       # exact dup
    texts[21] = texts[1]
    return pd.DataFrame({
        "doc_id": range(180),
        "text": texts,
        "lang": ["en"] * 180,
        "source": ["s" + str(i % 3) for i in range(180)],
        "n_chars": [len(t) for t in texts]})


@pytest.fixture(scope="module")
def events_pdf():
    rng = np.random.RandomState(43)
    base = pd.Timestamp("2024-01-01")
    rows = [{"event_id": i,
             "ts": base + pd.Timedelta(seconds=int(rng.randint(0, 3 * 86400))),
             "user_id": int(rng.randint(0, 25)),
             "event_type": ["view", "click", "purchase"][i % 3],
             "value": float(rng.exponential(10)),
             "props": ""} for i in range(600)]
    return pd.DataFrame(rows)


def _two_layouts(pdf, fn):
    import ray.data
    a = fn(ray.data.from_pandas(pdf).repartition(1))
    b = fn(ray.data.from_pandas(pdf.sample(frac=1, random_state=7))
           .repartition(13))
    to_df = (lambda x: x.to_pandas() if hasattr(x, "to_pandas")
             and not isinstance(x, pd.DataFrame) else x)
    return _sorted(to_df(a)), _sorted(to_df(b))


DOC_OPS = {
    "dedup_exact": lambda ds: __import__(
        "seo_crawler_ray.pipelines.textops", fromlist=["x"]
    ).dedup_exact(ds),
    "epoch_shuffle": lambda ds: __import__(
        "seo_crawler_ray.pipelines.textops", fromlist=["x"]
    ).epoch_shuffle(ds, seed=3, n_shards=7),
    "stratified_sample": lambda ds: __import__(
        "seo_crawler_ray.pipelines.textops", fromlist=["x"]
    ).stratified_sample(ds, k=9),
    "length_quantiles_by": lambda ds: __import__(
        "seo_crawler_ray.pipelines.textops", fromlist=["x"]
    ).length_quantiles_by(ds),
    "cross_split_leakage": lambda ds: __import__(
        "seo_crawler_ray.pipelines.textops", fromlist=["x"]
    ).cross_split_leakage(ds, n=3),
    "dup_ngram_spans": lambda ds: __import__(
        "seo_crawler_ray.pipelines.textops", fromlist=["x"]
    ).dup_ngram_spans(ds, k=4),
    "dsir_weights": lambda ds: __import__(
        "seo_crawler_ray.pipelines.textops", fromlist=["x"]
    ).dsir_weights(ds, target_sources=("s0",), n_features=64),
    "winnow_dup_pairs": lambda ds: __import__(
        "seo_crawler_ray.pipelines.textops", fromlist=["x"]
    ).winnow_dup_pairs(ds, min_shared=3),
    "top_terms_by": lambda ds: __import__(
        "seo_crawler_ray.pipelines.textops", fromlist=["x"]
    ).top_terms_by(ds, key_col="source", k=5),
    "corpus_stats": lambda ds: __import__(
        "seo_crawler_ray.pipelines.textops", fromlist=["x"]
    ).corpus_stats(ds),
    "lm_surprisal": lambda ds: __import__(
        "seo_crawler_ray.pipelines.textops", fromlist=["x"]
    ).lm_surprisal(ds),
    "ppl_buckets": lambda ds: __import__(
        "seo_crawler_ray.pipelines.textops", fromlist=["x"]
    ).ppl_buckets(ds),
    "validate_documents": lambda ds: __import__(
        "seo_crawler_ray.pipelines.textops", fromlist=["x"]
    ).validate_documents(ds),
    "bpe_train": lambda ds: pd.DataFrame(
        __import__("seo_crawler_ray.pipelines.textops",
                   fromlist=["x"]).bpe_train(ds, n_merges=12),
        columns=["rank", "left", "right"]),
}

EVENT_OPS = {
    "funnel": lambda ds: __import__(
        "seo_crawler_ray.pipelines.events", fromlist=["x"]).funnel(ds),
    "retention_cohorts": lambda ds: __import__(
        "seo_crawler_ray.pipelines.events", fromlist=["x"]
    ).retention_cohorts(ds),
    "value_quantiles_by_type": lambda ds: __import__(
        "seo_crawler_ray.pipelines.events", fromlist=["x"]
    ).value_quantiles_by_type(ds),
    "distinct_users_daily": lambda ds: __import__(
        "seo_crawler_ray.pipelines.events", fromlist=["x"]
    ).distinct_users_daily(ds),
    "distinct_users_daily_hll": lambda ds: __import__(
        "seo_crawler_ray.pipelines.events", fromlist=["x"]
    ).distinct_users_daily_hll(ds),
}


@pytest.mark.parametrize("name", sorted(DOC_OPS))
def test_doc_op_partition_invariant(ray_session, docs_pdf, name):
    a, b = _two_layouts(docs_pdf, DOC_OPS[name])
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("name", sorted(EVENT_OPS))
def test_event_op_partition_invariant(ray_session, events_pdf, name):
    a, b = _two_layouts(events_pdf, EVENT_OPS[name])
    pd.testing.assert_frame_equal(a, b)


@pytest.fixture(scope="module")
def pages_pdf():
    rng = np.random.RandomState(47)
    return pd.DataFrame({
        "url": [f"https://site{i % 5}.example/p{i}.html"
                for i in range(300)],
        "status_code": rng.choice([200, 200, 200, 301, 404, 500], 300),
        "size": rng.randint(100, 50_000, 300).astype("int64")})


PAGE_OPS = {
    "url_templates": lambda ds: __import__(
        "seo_crawler_ray.pipelines.analysis", fromlist=["x"]
    ).url_templates(ds),
    "host_stats": lambda ds: __import__(
        "seo_crawler_ray.pipelines.analysis", fromlist=["x"]
    ).host_stats(ds),
}


@pytest.mark.parametrize("name", sorted(PAGE_OPS))
def test_page_op_partition_invariant(ray_session, pages_pdf, name):
    a, b = _two_layouts(pages_pdf, PAGE_OPS[name])
    pd.testing.assert_frame_equal(a, b)


def test_int_key_bucketed_attach_partition_invariant(ray_session):
    """The integer-key bucketed co-shuffle (dimension-join scale path) must
    not depend on block layout of either side, including unmatched keys."""
    import ray.data
    from seo_crawler_ray.pipelines.coshuffle import bucketed_left_attach
    import pyarrow as pa

    rng = np.random.RandomState(53)
    left = pd.DataFrame({"k": rng.randint(0, 400, 900).astype("int64"),
                         "v": np.arange(900, dtype="int64")})
    right = pd.DataFrame({"rk": np.arange(0, 350, dtype="int64"),
                          "name": [f"n{i}" for i in range(350)]})

    def run(l_parts, r_parts, shuffle_seed):
        l = ray.data.from_pandas(
            left.sample(frac=1, random_state=shuffle_seed)).repartition(l_parts)
        r = ray.data.from_pandas(
            right.sample(frac=1, random_state=shuffle_seed + 1)
        ).repartition(r_parts)
        out = bucketed_left_attach(l, "k", r, "rk", "name",
                                   out_col="name", out_type=pa.string())
        return _sorted(out.to_pandas())

    a = run(1, 1, 3)
    b = run(11, 7, 9)
    pd.testing.assert_frame_equal(a, b)
    # unmatched keys (>=350) must survive as nulls, not vanish
    assert a[a["k"] >= 350]["name"].isna().all()
    assert len(a) == 900


def test_minhash_index_partition_invariant(ray_session, docs_pdf,
                                           tmp_path_factory):
    """Incremental MinHash index: neither the history layout at build time
    nor the increment layout at query time may change the result."""
    import ray.data
    from seo_crawler_ray.pipelines import minhash_index as mhi

    pdf = docs_pdf.copy()
    # plant a cross-half near-dup: 31 (odd -> increment) == 0 (even -> history)
    pdf.loc[pdf["doc_id"] == 31, "text"] = pdf["text"].iloc[0]
    hist = pdf[pdf["doc_id"] % 2 == 0]
    newd = pdf[pdf["doc_id"] % 2 == 1]

    def run(parts, seed):
        d = str(tmp_path_factory.mktemp("mh_pi") / "idx")
        mhi.build_minhash_index(
            ray.data.from_pandas(hist.sample(frac=1, random_state=seed))
            .repartition(parts), d)
        got = mhi.query_minhash_index(
            ray.data.from_pandas(newd.sample(frac=1, random_state=seed + 1))
            .repartition(parts + 2), d, threshold=0.5)
        return _sorted(got)

    a = run(1, 3)
    b = run(13, 9)
    pd.testing.assert_frame_equal(a, b)
    assert (31, 0) in set(zip(a["new"].astype(int), a["old"].astype(int)))


def test_minhash_index_hot_key_cap_partition_invariant(ray_session, docs_pdf,
                                                       tmp_path_factory):
    """The hot-key star-expansion cap is applied at index-load time from
    index contents alone, so a tiny pair_cap must still be layout-invariant
    (ADVICE r4: the old per-batch cap depended on block boundaries)."""
    import ray.data
    from seo_crawler_ray.pipelines import minhash_index as mhi

    pdf = docs_pdf.copy()
    hot = pdf["text"].iloc[0]
    # 8 identical history docs (hot (band, band_hash) keys) + 1 matching new
    hist = pd.concat([
        pdf[pdf["doc_id"] % 2 == 0],
        pd.DataFrame({"doc_id": range(1000, 1008), "text": [hot] * 8,
                      "lang": ["en"] * 8, "source": ["s0"] * 8,
                      "n_chars": [len(hot)] * 8})], ignore_index=True)
    newd = pd.DataFrame({"doc_id": [2001], "text": [hot]})

    def run(parts, seed):
        d = str(tmp_path_factory.mktemp("mh_cap") / "idx")
        mhi.build_minhash_index(
            ray.data.from_pandas(hist.sample(frac=1, random_state=seed))
            .repartition(parts), d)
        got = mhi.query_minhash_index(
            ray.data.from_pandas(newd), d, threshold=0.9, pair_cap=2)
        return _sorted(got)

    a = run(1, 3)
    b = run(13, 9)
    pd.testing.assert_frame_equal(a, b)
    # collapsed: the min-doc_id representative of the identical clones
    # survives (doc 0 is itself one of the clones)
    olds = set(a["old"].astype(int))
    assert 0 in olds
    assert not olds & set(range(1001, 1008))


def test_host_pagerank_partition_invariant(ray_session):
    """Two-input op: vary BOTH the pages and links block layouts, on the
    distributed (co-shuffle) path where layout could plausibly leak."""
    import ray.data
    from seo_crawler_ray.pipelines.graph import host_pagerank
    rng = np.random.RandomState(13)
    hosts = [f"h{i}.example" for i in range(7)]
    pages = pd.DataFrame(
        {"url": [f"https://{hosts[i % 7]}/p{i}" for i in range(120)]})
    links = pd.DataFrame({
        "source_url": [f"https://{hosts[rng.randint(7)]}/p{rng.randint(120)}"
                       for _ in range(600)],
        "target_url": [f"https://{hosts[rng.randint(7)]}/p{rng.randint(120)}"
                       for _ in range(600)],
        "is_internal": rng.rand(600) < 0.5})

    def run(pp, lp, **kw):
        return _sorted(host_pagerank(
            ray.data.from_pandas(pp).repartition(kw.pop("np_")),
            ray.data.from_pandas(lp).repartition(kw.pop("nl_")),
            n_iter=3, **kw).to_pandas())

    a = run(pages, links, np_=1, nl_=1, mode="distributed", n_buckets=4)
    b = run(pages.sample(frac=1, random_state=5),
            links.sample(frac=1, random_state=6),
            np_=9, nl_=17, mode="distributed", n_buckets=4)
    pd.testing.assert_frame_equal(a, b)


def test_c4_filters_partition_invariant(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.textops import c4_filters
    rng = np.random.RandomState(17)
    texts = ["\n".join(
        " ".join(rng.choice(["alpha", "beta", "gamma", "{", "javascript"],
                            rng.randint(1, 8)))
        + rng.choice([".", "!", "?", '"', ""])
        for _ in range(rng.randint(1, 12))) for _ in range(150)]
    pdf = pd.DataFrame({"url": [f"https://x.example/p{i}"
                                for i in range(150)], "text": texts})
    a, b = _two_layouts(pdf, c4_filters)
    pd.testing.assert_frame_equal(a, b)


def test_pmi_bigrams_partition_invariant(ray_session, docs_pdf):
    from seo_crawler_ray.pipelines.textops import pmi_bigrams
    a, b = _two_layouts(docs_pdf,
                        lambda ds: pmi_bigrams(ds, min_count=3, k=40))
    pd.testing.assert_frame_equal(a, b)


def test_vocab_growth_partition_invariant(ray_session, docs_pdf):
    from seo_crawler_ray.pipelines.textops import vocab_growth
    a, b = _two_layouts(docs_pdf, lambda ds: vocab_growth(ds))
    pd.testing.assert_frame_equal(a, b)


def test_mutual_links_partition_invariant(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.graph import mutual_links
    rng = np.random.RandomState(31)
    urls = [f"https://q.example/p{i}" for i in range(40)]
    links = pd.DataFrame({
        "source_url": [urls[rng.randint(40)] for _ in range(400)],
        "target_url": [urls[rng.randint(40)] for _ in range(400)],
        "is_internal": True})
    pages = pd.DataFrame({"url": urls})

    def run(np_, nl_):
        return _sorted(mutual_links(
            ray.data.from_pandas(pages).repartition(np_),
            ray.data.from_pandas(links).repartition(nl_),
            n_buckets=4, mode="distributed").to_pandas())

    pd.testing.assert_frame_equal(run(1, 1), run(7, 13))


def test_orphan_pages_partition_invariant(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.analysis import orphan_pages
    rng = np.random.RandomState(37)
    urls = [f"https://r.example/p{i}" for i in range(60)]
    pages = pd.DataFrame({"url": urls,
                          "depth": rng.randint(0, 5, 60).astype("int64")})
    links = pd.DataFrame({
        "source_url": [urls[rng.randint(60)] for _ in range(150)],
        "target_url": [urls[rng.randint(60)] for _ in range(150)],
        "is_internal": rng.rand(150) < 0.7})

    def run(np_, nl_):
        return _sorted(orphan_pages(
            ray.data.from_pandas(pages).repartition(np_),
            ray.data.from_pandas(links).repartition(nl_),
            mode="distributed", n_buckets=4).to_pandas())

    pd.testing.assert_frame_equal(run(1, 1), run(7, 13))


def test_alpha_mixture_quota_partition_invariant(ray_session, docs_pdf):
    from seo_crawler_ray.pipelines.textops import alpha_mixture_quota
    a, b = _two_layouts(
        docs_pdf, lambda ds: alpha_mixture_quota(ds, key_col="source",
                                                 budget=997, alpha=0.3))
    pd.testing.assert_frame_equal(a, b)
