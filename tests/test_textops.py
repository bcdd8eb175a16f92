"""Training-data operators on planted fixtures: near-dup detectors must find
planted duplicates and reject unrelated docs; ANN must match brute force."""
import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def planted_docs(ray_session):
    import ray.data
    rng = np.random.RandomState(7)
    words = [f"w{i}" for i in range(500)]
    docs = []
    for i in range(60):
        docs.append(" ".join(rng.choice(words, 80)))
    # planted near-dups: 60/61 differ by one word; 62/63 differ by two
    base = " ".join(rng.choice(words, 80).tolist())
    toks = base.split()
    docs.append(base)                                   # 60
    docs.append(" ".join(toks[:-1] + ["zzz"]))          # 61
    base2 = " ".join(rng.choice(words, 80).tolist())
    t2 = base2.split()
    docs.append(base2)                                  # 62
    docs.append(" ".join(["aaa"] + t2[1:-1] + ["bbb"]))  # 63
    # exact duplicate pair: 64/65
    docs.append(docs[0])                                # 64 == 0
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs,
                       "source": ["s"] * len(docs)})
    return ray.data.from_pandas(df)


def test_dedup_exact_planted(planted_docs):
    from seo_crawler_ray.pipelines.textops import dedup_exact
    kept = dedup_exact(planted_docs).to_pandas()
    assert len(kept) == 64          # 65 docs, one exact dup collapsed
    assert 64 not in set(kept["doc_id"])  # the later copy loses


def test_minhash_finds_planted_near_dups(planted_docs):
    from seo_crawler_ray.pipelines.textops import minhash_near_dups
    pairs = minhash_near_dups(planted_docs, threshold=0.6)
    got = set(zip(pairs["a"], pairs["b"]))
    assert (60, 61) in got
    assert (62, 63) in got
    assert (0, 64) in got           # exact dup: jaccard 1.0
    # unrelated random docs should not pair at 0.6
    low_ids = {p for p in got if p[0] < 60 and p[1] < 60}
    assert not low_ids


def test_minhash_estimates_close_to_exact(planted_docs):
    from seo_crawler_ray.pipelines.textops import (
        jaccard, minhash_signature, shingle_hashes)
    tdf = planted_docs.to_pandas()
    t60, t61 = tdf["text"].iloc[60], tdf["text"].iloc[61]
    s60, s61 = (set(shingle_hashes(t).tolist()) for t in (t60, t61))
    exact = jaccard(s60, s61)
    m60, m61 = minhash_signature(shingle_hashes(t60)), minhash_signature(shingle_hashes(t61))
    est = (m60 == m61).mean()
    assert abs(est - exact) < 0.2


def test_simhash_finds_planted(planted_docs):
    from seo_crawler_ray.pipelines.textops import simhash_near_dups
    pairs = simhash_near_dups(planted_docs, max_hamming=6)
    got = set(zip(pairs["a"], pairs["b"]))
    assert (0, 64) in got           # identical text -> hamming 0
    assert (60, 61) in got          # one word changed -> few bits


def test_ngram_jaccard_pairs(planted_docs):
    from seo_crawler_ray.pipelines.textops import ngram_jaccard_pairs
    pairs = ngram_jaccard_pairs(planted_docs, max_id=66, threshold=0.9)
    got = set(zip(pairs["a"], pairs["b"]))
    assert (0, 64) in got
    assert (60, 61) in got          # unigram jaccard ~ 78/82 > 0.9


def test_langid_heuristic(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.textops import langid_batch
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["the cat is in the house and it is warm for now",
                 "der hund ist nicht in das haus und die katze",
                 "le chat est dans la maison et il est pour",
                 "这是 一个 中文 文档 测试 示例 句子"],
    })
    out = ray.data.from_pandas(df).map_batches(
        langid_batch, batch_format="pyarrow").to_pandas()
    assert out["pred_lang"].tolist() == ["en", "de", "fr", "zh"]


def test_ann_topk_matches_bruteforce(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.embedops import ann_topk
    rng = np.random.RandomState(3)
    E = rng.normal(size=(300, 64)).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(300), "embedding": list(E),
                       "label": [0] * 300})
    df["embedding"] = df["embedding"].map(list)
    ds = ray.data.from_pandas(df)
    got = ann_topk(ds, n_queries=3, k=5)
    # brute force in float64
    M = E.astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    for q in range(3):
        sims = M @ M[q]
        order = np.lexsort((np.arange(300), -np.round(sims, 6)))[:5]
        expect = order.tolist()
        mine = got[got["query_id"] == q].sort_values("rank")["neighbor_id"].tolist()
        assert mine == expect


def test_lsh_bucketed_recall(ray_session):
    # clustered embeddings: LSH buckets align with clusters, so probing a
    # fraction of buckets retrieves most true neighbors (on unstructured
    # noise LSH recall is poor by nature — that's the documented trade-off)
    import ray.data
    from seo_crawler_ray.pipelines.embedops import ann_topk, lsh_bucketed_topk
    rng = np.random.RandomState(5)
    centers = rng.normal(size=(8, 64)) * 4
    E = np.vstack([centers[i % 8] + rng.normal(size=64) * 0.3
                   for i in range(400)]).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(400), "embedding": [list(e) for e in E],
                       "label": [0] * 400})
    ds = ray.data.from_pandas(df)
    exact = ann_topk(ds, n_queries=2, k=10)
    approx = lsh_bucketed_topk(ds, n_queries=2, k=10, n_planes=6,
                               n_probe_buckets=8)
    for q in range(2):
        a = set(exact[exact["query_id"] == q]["neighbor_id"])
        b = set(approx[approx["query_id"] == q]["neighbor_id"])
        assert len(a & b) / len(a) >= 0.7


def test_multimodal_stub_gating(ray_session):
    from seo_crawler_ray.stages.multimodal import DecodeStub
    import pyarrow as pa
    with pytest.raises(NotImplementedError):
        DecodeStub(fake=False)
    stub = DecodeStub(fake=True, feature_dim=8)
    out = stub(pa.table({"url": ["u1"], "html": [b"payload"]}))
    assert len(out["feature"][0].as_py()) == 8


def test_langid_runs_on_documents(ray_session):
    """The documents table's ``lang`` labels are synthetic (the text is
    English word-soup for every label), so accuracy against them is
    meaningless — this only asserts the operator runs over the real table
    and emits one prediction per doc. Heuristic correctness is covered by
    test_langid_heuristic on genuinely multilingual text."""
    import ray.data
    from seo_crawler_ray.pipelines.textops import langid_batch
    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    pred = docs.map_batches(langid_batch, batch_format="pyarrow").to_pandas()
    assert len(pred) == docs.count()
    assert set(pred["pred_lang"]) <= {"en", "de", "fr", "es", "zh"}


def test_ivf_topk_recall(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.embedops import ann_topk, ivf_topk
    rng = np.random.RandomState(9)
    centers = rng.normal(size=(8, 64)) * 4
    E = np.vstack([centers[i % 8] + rng.normal(size=64) * 0.3
                   for i in range(400)]).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(400), "embedding": [list(e) for e in E],
                       "label": [0] * 400})
    ds = ray.data.from_pandas(df)
    exact = ann_topk(ds, n_queries=2, k=10)
    approx = ivf_topk(ds, n_queries=2, k=10, n_lists=8, n_probe=2)
    for q in range(2):
        a = set(exact[exact["query_id"] == q]["neighbor_id"])
        b = set(approx[approx["query_id"] == q]["neighbor_id"])
        assert len(a & b) / len(a) >= 0.7


def test_minhash_no_driver_text_materialization(planted_docs, monkeypatch):
    """Scale contract: the bucketed verify path must never pull text OR
    sketch blobs to the driver — only the final (a, b, jaccard) pairs."""
    import ray.data
    from seo_crawler_ray.pipelines import textops
    real = ray.data.Dataset.to_pandas

    def guarded(self, *args, **kwargs):
        cols = set(self.schema().names)
        assert not (cols & {"text", "shingles", "sh_a", "sh_b", "html",
                            "blob"}), \
            f"driver materialization of wide columns: {sorted(cols)}"
        return real(self, *args, **kwargs)

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", guarded)
    pairs = textops.minhash_near_dups(planted_docs, threshold=0.6,
                                      verify_mode="bucketed")
    got = set(zip(pairs["a"], pairs["b"]))
    assert (60, 61) in got
    assert (0, 64) in got


def test_minhash_modes_identical(planted_docs):
    """broadcast (candidate-sketch), bucketed (co-shuffle) and store
    (disk blob store + point-lookup) verify paths must produce identical
    pairs — they share candidates and exact math."""
    from seo_crawler_ray.pipelines import textops
    a = textops.minhash_near_dups(planted_docs, threshold=0.6,
                                  verify_mode="broadcast")
    b = textops.minhash_near_dups(planted_docs, threshold=0.6,
                                  verify_mode="bucketed")
    c = textops.minhash_near_dups(planted_docs, threshold=0.6,
                                  verify_mode="store")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert a.reset_index(drop=True).equals(c.reset_index(drop=True))


def test_blob_store_roundtrip(ray_session, tmp_path):
    """build_blob_store + BlobFetcher: every key returns its exact blob,
    misses return None, and part files never collide across tasks."""
    import ray.data
    from seo_crawler_ray.sources.offset_store import (
        BlobFetcher, build_blob_store)
    rng = np.random.default_rng(7)
    n = 500
    blobs = [rng.bytes(rng.integers(1, 400)) for _ in range(n)]
    ds = ray.data.from_items(
        [{"key": i, "blob": blobs[i]} for i in range(n)],
        override_num_blocks=37)       # many tasks -> many part files
    build_blob_store(ds, "key", "blob", str(tmp_path), n_buckets=16)
    f = BlobFetcher(str(tmp_path), 16)
    got = f.lookup(list(range(n)) + [n + 5, -3])
    assert got[:n] == blobs
    assert got[n:] == [None, None]
    # total indexed bytes == total part-file bytes (no overwritten parts)
    import pyarrow.parquet as _pq
    idx_dir = os.path.join(str(tmp_path), "idx")
    total_len = sum(
        _pq.read_table(os.path.join(idx_dir, p))["length"].to_pandas().sum()
        for p in os.listdir(idx_dir))
    parts_dir = os.path.join(str(tmp_path), "parts")
    disk = sum(os.path.getsize(os.path.join(parts_dir, p))
               for p in os.listdir(parts_dir))
    assert total_len == disk == sum(len(b) for b in blobs)


def test_minhash_empty_candidates(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.textops import minhash_near_dups
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["alpha beta gamma delta epsilon",
                                "one two three four five six",
                                "red green blue yellow purple"]})
    pairs = minhash_near_dups(ray.data.from_pandas(df), threshold=0.7)
    assert list(pairs.columns) == ["a", "b", "jaccard"]
    assert len(pairs) == 0


def test_registered_ann_variants_recall(ray_session):
    """ann_topk_ivf / ann_topk_lsh at their registered parameters must
    recover >=~0.9 of the exact top-k on the real embeddings table
    (deterministic: seeded quantizer/planes, fixed testdata)."""
    from seo_crawler_ray.pipelines.queries import (
        q_ann_topk, q_ann_topk_ivf, q_ann_topk_lsh)
    sf = "/root/testdata/sf0.001"
    exact = q_ann_topk(sf)

    def mean_recall(approx):
        recs = []
        for q in exact["query_id"].unique():
            a = set(exact[exact["query_id"] == q]["neighbor_id"])
            b = set(approx[approx["query_id"] == q]["neighbor_id"])
            recs.append(len(a & b) / len(a))
        return float(np.mean(recs))

    assert mean_recall(q_ann_topk_ivf(sf)) >= 0.9
    assert mean_recall(q_ann_topk_lsh(sf)) >= 0.88


def test_embedding_dup_pairs_lsh_recall(ray_session):
    """Banded-LSH embedding dup pairs must recover >=0.95 of the exact
    cosine pairs on the real embeddings table at the registered params,
    with no false positives (in-bucket verify is exact)."""
    import ray.data
    from seo_crawler_ray.pipelines.embedops import (
        embedding_dup_pairs, embedding_dup_pairs_lsh)
    ds = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = embedding_dup_pairs(ds, max_id=10**9, tau=0.35)
    approx = embedding_dup_pairs_lsh(ds, tau=0.35, n_planes=3, n_bands=16)
    e = set(zip(exact["a"], exact["b"]))
    a = set(zip(approx["a"], approx["b"]))
    assert a <= e                       # verify step is exact -> no FPs
    assert len(a & e) / len(e) >= 0.95


def test_winnow_shared_fingerprints(planted_docs):
    """Winnowing guarantee: docs sharing long substrings share selected
    fingerprints; near-dup pair (60, 61) overlaps heavily, random docs
    overlap near zero."""
    from seo_crawler_ray.pipelines.textops import winnow_batch
    out = planted_docs.map_batches(
        winnow_batch, batch_format="pyarrow").to_pandas()
    by_doc = {d: set(g["fp"]) for d, g in out.groupby("doc_id")}
    j_dup = len(by_doc[60] & by_doc[61]) / len(by_doc[60] | by_doc[61])
    j_rand = len(by_doc[0] & by_doc[1]) / len(by_doc[0] | by_doc[1])
    assert by_doc[0] == by_doc[64]      # exact dup: identical fingerprints
    assert j_dup > 0.8
    assert j_rand < 0.1


def test_frame_sample_stub(ray_session):
    import hashlib
    import pyarrow as pa
    import pytest
    from seo_crawler_ray.stages.multimodal import FrameSampleStub
    with pytest.raises(NotImplementedError):
        FrameSampleStub(fake=False)
    stub = FrameSampleStub(n_frames=4, frame_bytes=4)
    payload = bytes(range(40))
    out = stub(pa.table({"url": ["u"], "html": [payload]})).to_pandas()
    assert list(out["frame_idx"]) == [0, 1, 2, 3]
    # evenly spaced windows: offsets 0, 10, 20, 30
    for i, off in enumerate((0, 10, 20, 30)):
        frame = payload[off:off + 4]
        assert out["frame_md5"][i] == hashlib.md5(
            frame.hex().upper().encode()).hexdigest()
        assert out["frame_bytes"][i] == 4


def test_resize_stub(ray_session):
    import pyarrow as pa
    import pytest
    from seo_crawler_ray.stages.multimodal import ResizeStub
    with pytest.raises(NotImplementedError):
        ResizeStub(fake=False)
    stub = ResizeStub(target_bytes=8)
    payload = bytes(range(20))
    out = stub(pa.table({"url": ["u"], "html": [payload]})).to_pandas()
    meta = out["meta"][0]
    assert meta["orig_bytes"] == 20 and meta["out_bytes"] == 8
    assert meta["truncated"] and meta["media_type"] == "image"
    assert out["payload"][0] == payload[6:14]   # center crop
    # payload smaller than budget passes through untruncated
    out2 = stub(pa.table({"url": ["v"], "html": [b"abc"]})).to_pandas()
    assert out2["payload"][0] == b"abc" and not out2["meta"][0]["truncated"]


def test_repetition_stats(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.textops import repetition_stats_batch
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["spam spam spam eggs", "a b c d", ""]})
    out = ray.data.from_pandas(df).map_batches(
        repetition_stats_batch, batch_format="pyarrow").to_pandas() \
        .set_index("doc_id")
    assert out.loc[0, "n_words"] == 4 and out.loc[0, "top_word_n"] == 3
    assert out.loc[0, "top_word_frac_e4"] == 7500
    assert out.loc[1, "top_word_frac_e4"] == 2500
    assert out.loc[2, "n_words"] == 0 and out.loc[2, "top_word_frac_e4"] == 0


def test_simhash_mass_duplicate_bucket(ray_session):
    """Mass-duplicate corpus: identical docs share one simhash; the bucket
    compare must stay O(distinct^2) and still emit every hamming-0 pair."""
    import ray.data
    from seo_crawler_ray.pipelines.textops import simhash_near_dups
    n = 40
    df = pd.DataFrame({"doc_id": range(n + 1),
                       "text": ["same mass duplicate body text here"] * n
                               + ["completely different other words now"]})
    pairs = simhash_near_dups(ray.data.from_pandas(df), max_hamming=2)
    got = set(zip(pairs["a"], pairs["b"]))
    expect = {(i, j) for i in range(n) for j in range(i + 1, n)}
    assert got >= expect
    assert all(h == 0 for h in pairs[pairs["b"] < n]["hamming"])


def test_sample_split_deterministic(ray_session):
    """Split assignment is a pure function of the id: stable across
    repartitionings and reruns; rates land near the configured permilles."""
    import ray.data
    from seo_crawler_ray.pipelines.textops import sample_split_batch
    df = pd.DataFrame({"doc_id": range(5000)})
    a = ray.data.from_pandas(df).map_batches(
        sample_split_batch, batch_format="pyarrow").to_pandas()
    b = ray.data.from_pandas(df.sample(frac=1, random_state=1)) \
        .repartition(7).map_batches(
        sample_split_batch, batch_format="pyarrow").to_pandas()
    am = dict(zip(a["doc_id"], a["split"]))
    bm = dict(zip(b["doc_id"], b["split"]))
    assert am == bm
    frac_val = (a["split"] == "val").mean()
    frac_test = (a["split"] == "test").mean()
    assert 0.03 < frac_val < 0.07 and 0.03 < frac_test < 0.07


def test_mixture_sample_rates(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.textops import mixture_sample_batch
    n = 4000
    df = pd.DataFrame({"doc_id": range(n),
                       "source": ["a" if i % 2 else "b" for i in range(n)]})
    out = ray.data.from_pandas(df).map_batches(
        mixture_sample_batch, batch_format="pyarrow",
        fn_kwargs={"rates_permille": {"a": 250, "b": 0}}).to_pandas()
    assert set(out["source"]) == {"a"}
    kept = len(out) / (n / 2)
    assert 0.2 < kept < 0.3


def test_pack_documents_prefix_sum(ray_session):
    """Distributed scan: pack assignment equals a sequential cumulative sum
    regardless of block layout; packs are contiguous in id order and no
    pack exceeds the budget by more than one straddling document."""
    import ray.data
    from seo_crawler_ray.pipelines.textops import pack_documents
    rng = np.random.RandomState(4)
    texts = [" ".join(f"w{j}" for j in range(rng.randint(5, 60)))
             for _ in range(300)]
    df = pd.DataFrame({"doc_id": range(300), "text": texts})
    out = pack_documents(ray.data.from_pandas(df).repartition(7),
                         budget_tokens=256).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # sequential reference
    start = 0
    for _, row in out.iterrows():
        assert row["pack_id"] == start // 256
        start += row["n_tokens"]
    assert out["pack_id"].is_monotonic_increasing


def test_minhash_mass_duplicates_bounded(ray_session):
    """VERDICT r02 #3: a corpus dominated by byte-identical docs must not
    explode candidate generation. 10^4 identical docs + planted uniques:
    expand_identical=False completes quickly with O(dups) member edges
    (one (rep, member, 1.0) row per duplicate), and the near-dup pair
    among the uniques is still found."""
    import time

    import ray.data
    from seo_crawler_ray.pipelines.textops import minhash_near_dups

    n_dup = 10_000
    rng = np.random.RandomState(11)
    words = [f"w{i}" for i in range(400)]
    uniq = [" ".join(rng.choice(words, 60)) for _ in range(20)]
    near_a = " ".join(rng.choice(words, 60).tolist())
    near_b = " ".join(near_a.split()[:-1] + ["zzz"])
    texts = (["the same exact document body repeated"] * n_dup
             + uniq + [near_a, near_b])
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    t0 = time.monotonic()
    pairs = minhash_near_dups(ray.data.from_pandas(df), threshold=0.6,
                              expand_identical=False)
    wall = time.monotonic() - t0
    assert wall < 120, f"mass-dup corpus took {wall:.0f}s"
    # member edges: rep (doc 0) to each of the other 9,999 duplicates
    edges = pairs[pairs["jaccard"] == 1.0]
    assert len(edges) == n_dup - 1
    assert (edges["a"] == 0).all()
    assert set(edges["b"]) == set(range(1, n_dup))
    # the planted near-dup pair among the uniques still survives
    ids = set(zip(pairs["a"], pairs["b"]))
    assert (n_dup + 20, n_dup + 21) in ids
    # O(dups) output: nothing quadratic leaked through
    assert len(pairs) < n_dup + 50


def test_minhash_expand_identical_matches_bruteforce(ray_session):
    """expand_identical=True must reproduce the full legacy pair contract:
    identical groups become 1.0-cliques and members inherit their rep's
    verified near-dup pairs."""
    import ray.data
    from seo_crawler_ray.pipelines.textops import (
        _jaccard_blobs, minhash_near_dups, shingle_hashes)

    rng = np.random.RandomState(3)
    words = [f"w{i}" for i in range(300)]
    base = " ".join(rng.choice(words, 60).tolist())
    near = " ".join(base.split()[:-1] + ["qqq"])
    texts = [base] * 4 + [near] * 2 + \
        [" ".join(rng.choice(words, 60)) for _ in range(10)]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    pairs = minhash_near_dups(ray.data.from_pandas(df), threshold=0.6)
    got = {(a, b): j for a, b, j in zip(pairs["a"], pairs["b"], pairs["jaccard"])}
    # cliques: {0,1,2,3} and {4,5}
    for i in range(4):
        for j in range(i + 1, 4):
            assert got.get((i, j)) == 1.0
    assert got.get((4, 5)) == 1.0
    # cross products: every base member pairs with every near member at the
    # exact base/near jaccard
    jx = _jaccard_blobs(shingle_hashes(base).tobytes(),
                        shingle_hashes(near).tobytes())
    assert jx >= 0.6
    for i in range(4):
        for j in (4, 5):
            assert abs(got[(i, j)] - jx) < 1e-6   # verify rounds to 6 dp
    # no unexpected pairs among the randoms
    assert all(a < 6 and b < 6 for (a, b) in got)


def test_dedup_clusters_propagate_matches_unionfind(ray_session):
    """The distributed min-label propagation must equal driver union-find
    on chain, star, and merged components — including a chain long enough
    to need several propagation rounds."""
    import ray.data
    from seo_crawler_ray.pipelines.textops import (_union_find_labels,
                                                   dedup_clusters)

    n = 40
    # chain 0-..-7 (needs 7 propagation rounds), star 20<-{21..29},
    # two merged pairs {30,31,32}, singletons elsewhere
    a = list(range(7)) + [20] * 9 + [30, 31]
    b = list(range(1, 8)) + list(range(21, 30)) + [31, 32]
    edges = pd.DataFrame({"a": a, "b": b})
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(n), "text": ["t"] * n})).repartition(4)

    expect = _union_find_labels(edges["a"].to_numpy(), edges["b"].to_numpy())
    for mode in ("broadcast", "propagate"):
        out = dedup_clusters(docs, edges, mode=mode).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert len(out) == n
        for doc, lab, keep in zip(out["doc_id"], out["cluster_id"], out["keep"]):
            assert lab == expect.get(doc, doc), (mode, doc)
            assert keep == int(doc == lab)
        # exactly one kept representative per cluster
        kept = out[out["keep"] == 1]
        assert set(kept["doc_id"]) == set(out["cluster_id"].unique())


def test_dedup_clusters_over_minhash_edges(planted_docs):
    """End-to-end capstone: minhash pairs (expand_identical=False) ->
    clusters. Docs 0/64 are byte-identical and 60/61, 62/63 are planted
    near-dups: each must collapse to one kept representative."""
    from seo_crawler_ray.pipelines.textops import dedup_clusters, minhash_near_dups

    pairs = minhash_near_dups(planted_docs, threshold=0.6,
                              expand_identical=False)
    out = dedup_clusters(planted_docs, pairs).to_pandas()
    lab = dict(zip(out["doc_id"], out["cluster_id"]))
    assert lab[64] == lab[0] == 0
    assert lab[61] == lab[60] == 60
    assert lab[63] == lab[62] == 62
    kept = out[out["keep"] == 1]["doc_id"]
    assert 0 in set(kept) and 64 not in set(kept)


def test_embedding_lsh_auto_params_recall_and_bucket_bound(ray_session):
    """VERDICT r02 #4: auto-derived planes must grow with log2(n) so the
    per-(band, code) verify bucket stays bounded, while the auto band count
    holds recall against the exact operator."""
    import ray.data
    from seo_crawler_ray.pipelines.embedops import (
        embedding_dup_pairs, embedding_dup_pairs_lsh, lsh_params_for)

    # plane growth: each 64x in n adds 6 planes; bands re-derived for recall
    p1, _ = lsh_params_for(1_000, 0.35)
    p2, _ = lsh_params_for(1_000_000, 0.35)
    p3, b3 = lsh_params_for(1_000_000_000, 0.35)
    assert p2 >= p1 + 9 and p3 >= p2 + 9
    assert p3 >= int(np.ceil(np.log2(1e9))) - 6 and b3 <= 256

    ds = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = ds.count()
    exact = embedding_dup_pairs(ds, max_id=10**9, tau=0.35)
    approx = embedding_dup_pairs_lsh(ds, tau=0.35)   # auto planes/bands
    e = set(zip(exact["a"], exact["b"]))
    a = set(zip(approx["a"], approx["b"]))
    assert a <= e                        # in-bucket verify is exact: no FPs
    assert len(a & e) / len(e) >= 0.95

    # bucket bound: expected per-band bucket size n / 2^planes <= 64; on
    # hashed codes allow generous skew slack but nothing near O(n)
    planes, bands = lsh_params_for(n, 0.35)
    assert n / (2 ** planes) <= 64


# ------------------------------------------ heavy hitters / retrieval ----
@pytest.fixture(scope="module")
def zipf_docs(ray_session):
    """Wide vocabulary with a planted zipf head, in enough blocks that
    m=64 truncation really drops terms per batch."""
    import ray.data
    rng = np.random.RandomState(11)
    vocab = np.array([f"tok{i:04d}" for i in range(3000)])
    # zipf-ish weights: head terms dominate but tail is broad
    w = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    w /= w.sum()
    docs = [" ".join(rng.choice(vocab, 120, p=w)) for _ in range(400)]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    return ray.data.from_pandas(df).repartition(16)


def _exact_top(docs_pdf, k):
    from collections import Counter
    import re
    ctr = Counter()
    for t in docs_pdf["text"]:
        ctr.update(re.findall(r"[a-z0-9]+", t.lower()))
    return sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_top_terms_exact(zipf_docs):
    from seo_crawler_ray.pipelines.textops import top_terms
    got = top_terms(zipf_docs, k=30).to_pandas()
    want = _exact_top(zipf_docs.to_pandas(), 30)
    assert list(zip(got["term"], got["n"])) == want


def test_top_terms_sketch_truncation_exact(zipf_docs):
    """m=64 << per-batch vocab, so every batch truncates and the error
    budget E > 0 — and the recount pass must still be exactly equal to
    the full groupby answer."""
    from seo_crawler_ray.pipelines.textops import top_terms, top_terms_sketch
    got = top_terms_sketch(zipf_docs, k=30, m=64).to_pandas()
    want = top_terms(zipf_docs, k=30).to_pandas()
    assert list(zip(got["term"], got["n"])) == \
        list(zip(want["term"], want["n"]))


def test_top_terms_sketch_candidate_cap(zipf_docs):
    from seo_crawler_ray.pipelines.textops import top_terms_sketch
    with pytest.raises(ValueError, match="candidate set"):
        top_terms_sketch(zipf_docs, k=30, m=2, candidate_cap=10)


def test_bm25_matches_brute_force(zipf_docs):
    """BM25 top-k equals a single-process numpy reference on the same
    formula (same constants, same accumulation order)."""
    import math
    import re
    from seo_crawler_ray.pipelines.textops import bm25_topk
    qt = ("tok0000", "tok0005", "tok0100")
    ds, consts = bm25_topk(zipf_docs, qt, k=15)
    got = ds.to_pandas()

    pdf = zipf_docs.to_pandas()
    word_lists = [re.findall(r"[a-z0-9]+", t.lower()) for t in pdf["text"]]
    n = len(pdf)
    dls = np.array([len(ws) for ws in word_lists], dtype=np.float64)
    avgdl = float(sum(len(ws) for ws in word_lists)) / n
    rows = []
    for doc_id, ws, dl in zip(pdf["doc_id"], word_lists, dls):
        s = 0.0
        for term in qt:
            df_t = sum(1 for wl in word_lists if term in set(wl))
            idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
            tf = float(sum(1 for w in ws if w == term))
            s = s + idf * ((tf * (1.2 + 1.0))
                           / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))))
        scaled = int(np.floor(s * 1e4 + 0.5))
        if scaled > 0:
            rows.append((doc_id, scaled))
    rows.sort(key=lambda r: (-r[1], r[0]))
    want = rows[:15]
    assert list(zip(got["doc_id"], got["score_i4"])) == want
    assert consts["n_docs"] == n


def test_length_quantiles_exact(zipf_docs):
    """Histogram-combiner percentiles equal the brute-force definition."""
    from seo_crawler_ray.pipelines.textops import length_quantiles
    import re
    got = length_quantiles(zipf_docs).to_pandas()
    lens = sorted(len(re.findall(r"[a-z0-9]+", t.lower()))
                  for t in zipf_docs.to_pandas()["text"])
    n = len(lens)
    for q, v in zip(got["q"], got["value"]):
        thresh = (q * n + 99) // 100
        assert v == lens[thresh - 1]


def test_inverted_index_matches_bruteforce(zipf_docs):
    from collections import Counter
    import re
    from seo_crawler_ray.pipelines.textops import inverted_index
    got = inverted_index(zipf_docs).to_pandas() \
        .sort_values("term").reset_index(drop=True)
    pdf = zipf_docs.to_pandas()
    post = {}
    for did, text in zip(pdf["doc_id"], pdf["text"]):
        for term, tf in Counter(re.findall(r"[a-z0-9]+", text.lower())).items():
            post.setdefault(term, []).append((did, tf))
    rows = []
    for term in sorted(post):
        ps = sorted(post[term])
        rows.append((term, len(ps), sum(t for _, t in ps),
                     ",".join(f"{d}:{t}" for d, t in ps)))
    want = pd.DataFrame(rows, columns=["term", "df", "cf", "postings"])
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)


# ---------------------------------------------------------------- kmeans --
def test_kmeans_matches_numpy_reference(ray_session):
    """On well-separated clusters the distributed partial-sum iteration
    must land on the same assignment as a single-process Lloyd reference
    with the identical deterministic init (first k vectors by id)."""
    import ray.data
    from seo_crawler_ray.pipelines.embedops import kmeans
    rng = np.random.RandomState(9)
    k, d = 5, 16
    centers = rng.normal(size=(k, d)) * 10          # far apart vs noise 0.2
    E = np.vstack([centers[i % k] + rng.normal(size=d) * 0.2
                   for i in range(300)]).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(300),
                       "embedding": [list(e) for e in E],
                       "label": [0] * 300})
    ds = ray.data.from_pandas(df).repartition(6)
    out, C, inertia = kmeans(ds, k=k, n_iter=8)
    got = out.to_pandas().sort_values("vec_id")["cluster"].to_numpy()

    X = E.astype(np.float64)
    Cr = X[:k].copy()
    for _ in range(8):
        d2 = ((X[:, None, :] - Cr[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for c in range(k):
            if (a == c).any():
                Cr[c] = X[a == c].mean(axis=0)
    d2 = ((X[:, None, :] - Cr[None, :, :]) ** 2).sum(axis=2)
    want = np.argmin(d2, axis=1)
    assert (got == want).all()
    sizes = np.bincount(got, minlength=k)
    assert sizes.sum() == 300 and (sizes > 0).all()
    assert np.isfinite(inertia) and inertia > 0


def test_kmeans_inertia_non_increasing(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.embedops import kmeans
    rng = np.random.RandomState(21)
    E = rng.normal(size=(200, 8)).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(200),
                       "embedding": [list(e) for e in E],
                       "label": [0] * 200})
    ds = ray.data.from_pandas(df).repartition(4)
    prev = float("inf")
    for it in (1, 3, 6):
        _, _, inertia = kmeans(ds, k=4, n_iter=it)
        assert inertia <= prev + 1e-6
        prev = inertia


# --------------------------------------- PII / chunking / contamination --
def test_redact_pii_planted(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.textops import redact_pii_batch, md5_hex
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["Contact Bob.Smith+x@Example.COM or 555-123-4567 now",
                 "servers 10.0.0.1 and 192.168.1.255; a@b.io c@d.org",
                 "clean text with no pii at all"],
    })
    got = ray.data.from_pandas(docs).map_batches(
        redact_pii_batch, batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["n_emails"].tolist() == [1, 2, 0]
    assert got["n_phones"].tolist() == [1, 0, 0]
    assert got["n_ips"].tolist() == [0, 2, 0]
    assert got.loc[0, "redacted_md5"] == md5_hex(
        "contact <EMAIL> or <PHONE> now")
    assert got.loc[1, "redacted_md5"] == md5_hex(
        "servers <IP> and <IP>; <EMAIL> <EMAIL>")


def test_redact_pii_sql_parity_on_planted(ray_session, tmp_path):
    """The DuckDB regexp chain reproduces the Python redaction exactly on
    PII-bearing text (the driver corpus is PII-free, so this pins the
    non-trivial path)."""
    import duckdb
    import ray.data
    from seo_crawler_ray.pipelines.textops import (redact_pii_batch,
                                                   redact_pii_sql)
    docs = pd.DataFrame({
        "doc_id": range(4),
        "text": ["mail me: First.Last@sub.domain.org!",
                 "call 800-555-0100 or 800.555.0199 at 8.8.8.8",
                 "edge: a@b.cd 1.2.3.4.5 999-99-9999",
                 "nothing here"],
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(redact_pii_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)
    got = ray.data.from_pandas(docs).map_batches(
        redact_pii_batch, batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()],
                                  check_dtype=False)


def test_doc_chunks_edges(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.textops import doc_chunks
    toks = [f"w{i}" for i in range(100)]
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [" ".join(toks),          # 100 toks: chunks at 0,48,96
                 " ".join(toks[:64]),     # exactly chunk: 0 and tail 48
                 " ".join(toks[:10]),     # short: one chunk
                 "!!!"],                  # zero tokens: no chunks
    })
    got = doc_chunks(ray.data.from_pandas(docs), chunk=64, stride=48) \
        .to_pandas().sort_values(["doc_id", "chunk_id"]) \
        .reset_index(drop=True)
    assert got[got["doc_id"] == 0]["n_tokens"].tolist() == [64, 52, 4]
    assert got[got["doc_id"] == 1]["n_tokens"].tolist() == [64, 16]
    assert got[got["doc_id"] == 2]["n_tokens"].tolist() == [10]
    assert (got["doc_id"] != 3).all()
    row = got[(got["doc_id"] == 0) & (got["chunk_id"] == 2)].iloc[0]
    assert row["chunk_text"] == " ".join(toks[96:100])


def test_contamination_probes_counts(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.textops import contamination_probes
    docs = pd.DataFrame({
        "doc_id": range(5),
        "text": ["Alpha BETA gamma", "beta delta", "epsilon",
                 "alphabet soup", "ALPHA beta"],
    })
    got = contamination_probes(ray.data.from_pandas(docs).repartition(3),
                               ("alpha", "beta", "zeta")).to_pandas()
    m = dict(zip(got["probe"], got["n_docs"]))
    assert m == {"alpha": 3, "beta": 3, "zeta": 0}


def test_length_quantiles_by_matches_per_group_bruteforce(zipf_docs):
    import re
    import ray.data
    from seo_crawler_ray.pipelines.textops import length_quantiles_by
    pdf = zipf_docs.to_pandas()
    pdf["source"] = ["s" + str(i % 3) for i in range(len(pdf))]
    ds = ray.data.from_pandas(pdf).repartition(8)
    got = length_quantiles_by(ds, key_col="source").to_pandas()
    for src, g in pdf.groupby("source"):
        lens = sorted(len(re.findall(r"[a-z0-9]+", t.lower()))
                      for t in g["text"])
        n = len(lens)
        sub = got[got["source"] == src]
        for q, v in zip(sub["q"], sub["value"]):
            assert v == lens[(q * n + 99) // 100 - 1]


def test_stratified_sample_exact_quotas(zipf_docs):
    import hashlib
    import ray.data
    from seo_crawler_ray.pipelines.textops import stratified_sample
    pdf = zipf_docs.to_pandas()
    pdf["source"] = ["s" + str(i % 4) for i in range(len(pdf))]
    ds = ray.data.from_pandas(pdf).repartition(8)
    got = stratified_sample(ds, k=7).to_pandas()
    assert (got.groupby("source").size() == 7).all()
    for src, g in got.groupby("source"):
        ids = pdf[pdf["source"] == src]["doc_id"]
        want = sorted(ids, key=lambda i: (
            hashlib.md5(str(i).encode()).hexdigest(), i))[:7]
        sub = g.sort_values("sample_rank")
        assert list(sub["doc_id"]) == want
        assert list(sub["sample_rank"]) == list(range(1, 8))


def test_lm_surprisal_matches_bruteforce(zipf_docs):
    import math
    import re
    from collections import Counter
    from seo_crawler_ray.pipelines.textops import lm_surprisal
    pdf = zipf_docs.to_pandas()
    ctr: Counter = Counter()
    toks = {}
    for did, t in zip(pdf["doc_id"], pdf["text"]):
        toks[did] = re.findall(r"[a-z0-9]+", t.lower())
        ctr.update(toks[did])
    n = sum(ctr.values())
    sup = {w: int(math.floor(1e6 * math.log(n / c)))
           for w, c in ctr.items()}
    got = lm_surprisal(zipf_docs).to_pandas().set_index("doc_id")
    assert len(got) == len(pdf)
    for did in list(pdf["doc_id"])[:50]:
        assert got.loc[did, "surprisal"] == sum(sup[w] for w in toks[did])
        assert got.loc[did, "n_tokens"] == len(toks[did])


def test_lm_surprisal_top_v_oov_floor(ray_session):
    import math
    import ray.data
    from seo_crawler_ray.pipelines.textops import lm_surprisal
    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": ["a a a b", "rare a"]})
    got = lm_surprisal(ray.data.from_pandas(df), top_v=2) \
        .to_pandas().set_index("doc_id")
    # counts: a=4, b=1, rare=1, N=6; top_v=2 keeps a and b (count desc,
    # term asc tie-break) -> 'rare' scores the OOV floor ln(6)
    sa = int(math.floor(1e6 * math.log(6 / 4)))
    sb = int(math.floor(1e6 * math.log(6 / 1)))
    oov = int(math.floor(1e6 * math.log(6)))
    assert got.loc[0, "surprisal"] == 3 * sa + sb
    assert got.loc[1, "surprisal"] == oov + sa


def test_tfidf_top_terms_bruteforce(zipf_docs):
    import math
    import re
    from collections import Counter
    from seo_crawler_ray.pipelines.textops import tfidf_top_terms
    pdf = zipf_docs.to_pandas()
    df_ctr: Counter = Counter()
    tfs = {}
    for did, t in zip(pdf["doc_id"], pdf["text"]):
        tf = Counter(re.findall(r"[a-z0-9]+", t.lower()))
        tfs[did] = tf
        df_ctr.update(tf.keys())
    nd = len(pdf)
    idf = {w: int(math.floor(1e6 * math.log(nd / d)))
           for w, d in df_ctr.items()}
    got = tfidf_top_terms(zipf_docs, k=3).to_pandas()
    assert len(got) == 3 * nd
    for did in list(pdf["doc_id"])[:25]:
        want = sorted(((tf * idf[w], w) for w, tf in tfs[did].items()),
                      key=lambda sv: (-sv[0], sv[1]))[:3]
        sub = got[got["doc_id"] == did].sort_values("term_rank")
        assert list(sub["term"]) == [w for _, w in want]
        assert list(sub["score"]) == [s for s, _ in want]


def test_decontaminate_ngrams_planted(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.textops import decontaminate_ngrams
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["the quick brown fox jumps",   # probe 3-grams hit twice
                 "quick brown cow",             # no full 3-gram overlap
                 "THE QUICK BROWN dog",         # case-folded hit
                 ""]})
    got = decontaminate_ngrams(
        ray.data.from_pandas(df).repartition(2),
        probes=("the quick brown fox",), n=3) \
        .to_pandas().set_index("doc_id")
    # probe grams: {the quick brown, quick brown fox}
    assert got.loc[0, "n_hits"] == 2 and got.loc[0, "contaminated"] == 1
    assert got.loc[1, "n_hits"] == 0 and got.loc[1, "contaminated"] == 0
    assert got.loc[2, "n_hits"] == 1 and got.loc[2, "contaminated"] == 1
    assert got.loc[3, "n_hits"] == 0 and len(got) == 4


# -------------------------------------------------------------- SemDeDup --
def test_semantic_dedup_planted_and_bruteforce(ray_session):
    """Planted near-identical vectors must be dropped (keep=min id per dup
    group); the full keep set must match a single-process reference that
    runs the same policy on the same kmeans assignment."""
    import ray.data
    from seo_crawler_ray.pipelines.embedops import (_norm_rows, kmeans,
                                                    semantic_dedup)
    rng = np.random.RandomState(13)
    k, d = 4, 16
    centers = rng.normal(size=(k, d)) * 10
    # noise sigma=3: same-cluster cosine ~0.91 (below tau), planted
    # perturbations at 1e-3 are ~1.0 (above tau)
    rows = [centers[i % k] + rng.normal(size=d) * 3.0 for i in range(120)]
    # planted semantic dups: 120/121 are tiny perturbations of row 0,
    # 122 duplicates row 5 exactly
    rows.append(rows[0] + rng.normal(size=d) * 1e-3)     # 120 ~ 0
    rows.append(rows[0] + rng.normal(size=d) * 1e-3)     # 121 ~ 0
    rows.append(rows[5].copy())                          # 122 == 5
    E = np.vstack(rows).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(len(rows)),
                       "embedding": [list(e) for e in E],
                       "label": [0] * len(rows)})
    ds = ray.data.from_pandas(df).repartition(6)
    tau = 0.99
    got = semantic_dedup(ds, k=k, tau=tau, n_iter=8).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert len(got) == len(rows)
    gm = dict(zip(got["vec_id"], got["keep"]))
    assert gm[0] == 1 and gm[120] == 0 and gm[121] == 0
    assert gm[5] == 1 and gm[122] == 0

    # reference: same assignments (from the operator's own kmeans),
    # same greedy keep-first-by-id policy
    assign_ds, _, _ = kmeans(ds, k=k, n_iter=8)
    assign = assign_ds.to_pandas().set_index("vec_id")["cluster"]
    X = _norm_rows(E.astype(np.float64))
    want_keep = {}
    for c in sorted(assign.unique()):
        ids = sorted(assign[assign == c].index)
        kept = []
        for i in ids:
            dup = any(X[i] @ X[j] > tau for j in kept)
            want_keep[i] = 0 if dup else 1
            if not dup:
                kept.append(i)
    for vid in range(len(rows)):
        assert gm[vid] == want_keep[vid], vid


# ------------------------------------------------------ quality logreg --
def test_quality_classifier_separable_and_numpy_parity(ray_session):
    """Separable planted corpus: 'en' docs are stopword-rich, 'xx' docs
    stopword-free. Training must reach 100% accuracy AND land on the
    same weights as a single-process numpy GD with identical init/lr."""
    import math
    import re
    import ray.data
    from seo_crawler_ray.pipelines.textops import (
        STOPWORDS, train_quality_classifier)
    rng = np.random.RandomState(17)
    stop = sorted(STOPWORDS)
    other = [f"w{i}" for i in range(50)]
    docs, langs = [], []
    for i in range(80):
        if i % 2 == 0:
            toks = list(rng.choice(stop, 15)) + list(rng.choice(other, 10))
            langs.append("en")
        else:
            toks = list(rng.choice(other, 25))
            langs.append("xx")
        rng.shuffle(toks)
        docs.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": range(80), "text": docs, "lang": langs})
    ds = ray.data.from_pandas(df).repartition(4)
    n_iter, lr = 60, 0.5
    w, scored = train_quality_classifier(ds, n_iter=n_iter, lr=lr)
    got = scored.to_pandas().sort_values("doc_id")
    want_y = (df["lang"] == "en").astype(int).to_numpy()
    assert (got["pred"].to_numpy() == want_y).all()

    # numpy reference with identical features/order-insensitive sums
    X, Y = [], []
    for t, lg in zip(df["text"], df["lang"]):
        ws = re.findall(r"[a-z0-9]+", t.lower())
        n = len(ws)
        X.append([1.0, n / 100.0, len(set(ws)) / n,
                  sum(tok in STOPWORDS for tok in ws) / n])
        Y.append(1.0 if lg == "en" else 0.0)
    X, Y = np.array(X), np.array(Y)
    wr = np.zeros(4)
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(X @ wr)))
        wr = wr - lr * (X.T @ (p - Y)) / len(Y)
    assert np.allclose(w, wr, atol=1e-8)


def test_semantic_dedup_transitive_chain_keeps_endpoints(ray_session):
    """a~b, b~c, a!~c (a chain): greedy keep-first must keep a AND c —
    dropping c because of the already-dropped b would over-delete."""
    import ray.data
    from seo_crawler_ray.pipelines.embedops import semantic_dedup
    # 2-d unit vectors at 0, 18 and 36 degrees: cos(18deg)=0.951 > tau,
    # cos(36deg)=0.809 < tau
    ang = np.deg2rad([0.0, 18.0, 36.0])
    E = np.column_stack([np.cos(ang), np.sin(ang)])
    df = pd.DataFrame({"vec_id": [0, 1, 2],
                       "embedding": [list(e) for e in E],
                       "label": [0, 0, 0]})
    got = semantic_dedup(ray.data.from_pandas(df), k=1, tau=0.95,
                         n_iter=2).to_pandas()
    keep = dict(zip(got["vec_id"], got["keep"]))
    assert keep == {0: 1, 1: 0, 2: 1}


def test_cross_split_leakage_planted(ray_session):
    """Planted leak: a train doc sharing a 3-gram with a val doc must be
    flagged with the exact position count; clean train docs must be 0.
    doc_ids chosen so the md5 split buckets put them where planted
    (checked inline)."""
    import hashlib
    import ray.data
    from seo_crawler_ray.pipelines.textops import cross_split_leakage

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000

    val_ids = [i for i in range(2000) if bucket(i) < 50][:2]
    train_ids = [i for i in range(2000) if bucket(i) >= 100][:3]
    leak = "alpha beta gamma"
    rows = [
        (val_ids[0], f"xx yy {leak} zz"),
        (val_ids[1], "unrelated val words here"),
        # train doc with the leaked 3-gram twice (two positions)
        (train_ids[0], f"{leak} filler {leak}"),
        (train_ids[1], "totally clean train doc"),
        (train_ids[2], "unrelated val words here"),  # full-text leak: 2
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    got = cross_split_leakage(
        ray.data.from_pandas(df).repartition(3), n=3) \
        .to_pandas().set_index("doc_id")
    assert len(got) == 3
    assert got.loc[train_ids[0], "n_hits"] == 2
    assert got.loc[train_ids[0], "contaminated"] == 1
    assert got.loc[train_ids[1], "n_hits"] == 0
    assert got.loc[train_ids[1], "contaminated"] == 0
    assert got.loc[train_ids[2], "n_hits"] == 2   # 4 tokens -> 2 grams


def test_winnow_dup_pairs_planted(planted_docs):
    """Exact duplicates share every fingerprint; near-identical docs share
    most; unrelated short-vocab docs stay under a high min_shared."""
    from seo_crawler_ray.pipelines.textops import winnow_dup_pairs
    got = winnow_dup_pairs(planted_docs, min_shared=10).to_pandas()
    pairs = set(zip(got["a"], got["b"]))
    assert (0, 64) in pairs            # exact dup: identical fp sets
    assert (60, 61) in pairs           # one-word edit: most fps survive
    srow = got[(got["a"] == 0) & (got["b"] == 64)].iloc[0]
    # identical text -> shared == each doc's full fp count
    from seo_crawler_ray.pipelines.textops import winnow_batch
    import pyarrow as pa
    t0 = planted_docs.to_pandas().iloc[0]
    fps0 = winnow_batch(pa.table({"doc_id": [0], "text": [t0["text"]]}))
    assert srow["shared"] == fps0.num_rows


def test_winnow_dup_pairs_group_cap_skips_boilerplate(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.textops import winnow_dup_pairs
    # 30 identical docs: with group_cap below 30 every fp group is
    # skipped -> no pairs at all (the degenerate-input escape hatch)
    df = pd.DataFrame({"doc_id": range(30),
                       "text": ["same text body repeated here ok"] * 30})
    got = winnow_dup_pairs(ray.data.from_pandas(df), min_shared=1,
                           group_cap=10).to_pandas()
    assert len(got) == 0


def test_top_terms_by_matches_bruteforce(zipf_docs):
    import re
    import ray.data
    from collections import Counter
    from seo_crawler_ray.pipelines.textops import top_terms_by
    pdf = zipf_docs.to_pandas()
    pdf["source"] = ["s" + str(i % 3) for i in range(len(pdf))]
    ds = ray.data.from_pandas(pdf).repartition(8)
    got = top_terms_by(ds, key_col="source", k=4).to_pandas()
    for src, g in pdf.groupby("source"):
        ctr: Counter = Counter()
        for t in g["text"]:
            ctr.update(re.findall(r"[a-z0-9]+", t.lower()))
        want = sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
        sub = got[got["source"] == src].sort_values("term_rank")
        assert list(sub["term"]) == [t for t, _ in want]
        assert list(sub["n"]) == [n for _, n in want]


def test_knn_label_accuracy_clustered(ray_session):
    """Clustered embeddings with cluster-aligned labels: kNN votes must be
    ~perfect; output contract (one row per query, correct flag) pinned."""
    import ray.data
    from seo_crawler_ray.pipelines.embedops import knn_label_accuracy
    rng = np.random.RandomState(23)
    k_cl, d = 4, 32
    centers = rng.normal(size=(k_cl, d)) * 8
    E = np.vstack([centers[i % k_cl] + rng.normal(size=d) * 0.5
                   for i in range(200)]).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(200),
                       "embedding": [list(e) for e in E],
                       "label": [i % k_cl for i in range(200)]})
    out = knn_label_accuracy(ray.data.from_pandas(df).repartition(4),
                             n_queries=16, k=5)
    assert len(out) == 16
    assert list(out["query_id"]) == list(range(16))
    assert out["correct"].mean() == 1.0
    assert (out["pred_label"] == out["true_label"]).all()


def test_validate_documents_planted_violations(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.textops import validate_documents
    df = pd.DataFrame({
        "doc_id": [1, 2, 2, 3, 4, 5],       # doc_id 2 duplicated (1 extra)
        "text": ["ok text", "", "also ok", "bad count", None, "x"],
        "lang": ["en", "", "en", None, "en", "en"],
        "source": ["s", "s", "", "s", "s", "s"],
        # 999 != len("bad count")=9; None n_chars is a violation too
        "n_chars": pd.array([7, 0, 7, 999, 0, None], dtype="Int64")})
    got = validate_documents(ray.data.from_pandas(df).repartition(3)) \
        .to_pandas().set_index("check")["n_violations"]
    assert got["empty_text"] == 2            # "" and None
    assert got["null_lang"] == 2             # "" and None
    assert got["null_source"] == 1
    assert got["n_chars_mismatch"] == 2      # 999 and NULL
    assert got["duplicate_doc_id"] == 1


def test_validate_documents_clean_corpus_zeroes(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.textops import validate_documents
    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    got = validate_documents(ds).to_pandas().set_index("check")
    assert (got["n_violations"] == 0).all()
    assert len(got) == 5


def test_winnow_dup_pairs_duplicate_ids_collapse(ray_session):
    """Duplicate doc_id rows must not create self-pairs or inflated
    shared counts (DISTINCT + a<b oracle parity)."""
    import ray.data
    from seo_crawler_ray.pipelines.textops import winnow_dup_pairs
    t = "a long enough duplicated body of text for fingerprints"
    df = pd.DataFrame({"doc_id": [1, 1, 2], "text": [t, t, t]})
    got = winnow_dup_pairs(ray.data.from_pandas(df).repartition(2),
                           min_shared=1).to_pandas()
    assert set(zip(got["a"], got["b"])) == {(1, 2)}


# -------------------------------------------------------------- BPE ------
def test_bpe_train_sennrich_example(ray_session):
    """The canonical worked example (Sennrich et al. 2016 §3.2): corpus
    word freqs low:5 lower:2 newest:6 widest:3. Pair counts give the
    hand-derivable merge order below (ties: count desc, pair lex asc)."""
    import ray.data
    from seo_crawler_ray.pipelines.textops import bpe_train
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    # spread across docs/blocks so the distributed count is exercised
    df = pd.DataFrame({"doc_id": range(8),
                       "text": [" ".join(words[i::8]) for i in range(8)]})
    merges = bpe_train(ray.data.from_pandas(df).repartition(4),
                       n_merges=5)
    got = [(left, right) for _, left, right in merges]
    # counts round 1: (e,s)=9, (s,t)=9, (t,</w>)=9, (l,o)=7, (o,w)=7,
    # (w,e)=8, ... -> lex-smallest of the 9s is ('e','s')
    assert got[0] == ("e", "s")
    # round 2: ('es','t') = 9 is the unique max
    assert got[1] == ("es", "t")
    # round 3: ('est','</w>') = 9 unique max
    assert got[2] == ("est", "</w>")
    # round 4: ('l','o') = 7 ties ('o','w') = 7; lex-smallest wins
    assert got[3] == ("l", "o")
    # round 5: after the lo merge, ('lo','w') = 7 is the unique max
    assert got[4] == ("lo", "w")
    assert merges[4][0] == 4                   # rank recorded


def test_bpe_encode_counts(ray_session):
    """After the 3 'est' merges, 'newest' is n-e-w-est</w> = 4 tokens and
    'low' is l-o-w-</w> = 4; encode must apply merges by rank."""
    import pyarrow as pa
    from seo_crawler_ray.pipelines.textops import (bpe_encode_batch,
                                                   bpe_train)
    import ray.data
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    df = pd.DataFrame({"doc_id": [0], "text": [" ".join(words)]})
    merges = bpe_train(ray.data.from_pandas(df), n_merges=3)
    out = bpe_encode_batch(
        pa.table({"doc_id": [0, 1], "text": ["newest", "low lower"]}),
        merges)
    m = dict(zip(out["doc_id"].to_pylist(),
                 out["bpe_tokens"].to_pylist()))
    assert m[0] == 4            # n e w est</w>
    assert m[1] == 4 + 6        # l o w </w>  +  l o w e r </w>


def test_dup_ngram_spans_hand_computed(ray_session):
    """Exact-substring duplication on a hand-computed fixture (k=3):
    cross-doc shared phrases, a within-doc repeat (counts toward the
    >1 total), span merging (gap < k) vs separate spans (gap >= k)."""
    import ray.data
    from seo_crawler_ray.pipelines.textops import dup_ngram_spans
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b c d e f g",          # grams at pos 0,1 duplicated
                 "x a b c d y z",          # grams at pos 1,2 duplicated
                 "p q r s t u v",          # unique
                 "a b c q q a b c"],       # 'a b c' at pos 0 and 5
    })
    got = dup_ngram_spans(ray.data.from_pandas(docs), k=3) \
        .to_pandas().set_index("doc_id").sort_index()
    # doc 0: 5 grams; dup positions {0,1} -> one span covering 4 tokens
    assert got.loc[0].tolist() == [5, 2, 1, 4]
    # doc 1: dup positions {1,2} -> one span of 4
    assert got.loc[1].tolist() == [5, 2, 1, 4]
    # doc 2: nothing duplicated
    assert got.loc[2].tolist() == [5, 0, 0, 0]
    # doc 3: 6 grams; dup positions {0,5}, gap 5 >= k -> two spans of 3
    assert got.loc[3].tolist() == [6, 2, 2, 6]


def test_dup_ngram_spans_overlap_merge(ray_session):
    """Positions 0 and 2 with k=3 overlap (gap 2 < k): one merged span
    covering pos 0..4 = 5 tokens."""
    import ray.data
    from seo_crawler_ray.pipelines.textops import dup_ngram_spans
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a b c d e f",        # 'a b c' pos0, 'c d e' pos2 dup'd
                 "a b c x c d e",      # sources of the duplicates
                 "zz yy xx ww vv"],
    })
    got = dup_ngram_spans(ray.data.from_pandas(docs), k=3) \
        .to_pandas().set_index("doc_id").sort_index()
    assert got.loc[0, "dup_grams"] == 2
    assert got.loc[0, "dup_spans"] == 1
    assert got.loc[0, "dup_tokens"] == 5


def test_dsir_weights_directionality(ray_session):
    """Docs made of target-vocabulary tokens must score higher than docs
    of off-target tokens, and the per-feature log-ratio table must match
    a numpy reference computed from the same Laplace-smoothed counts."""
    import math

    import ray.data
    from seo_crawler_ray.pipelines.textops import (_feature_bucket_of,
                                                   dsir_weights)
    rng = np.random.RandomState(11)
    tvoc = [f"t{i}" for i in range(20)]      # target-only vocabulary
    rvoc = [f"r{i}" for i in range(20)]      # raw-only vocabulary
    docs = []
    for i in range(30):                      # target split: pure tvoc
        docs.append(("tgt", " ".join(rng.choice(tvoc, 40))))
    for i in range(30):                      # raw-only split: pure rvoc
        docs.append(("other", " ".join(rng.choice(rvoc, 40))))
    df = pd.DataFrame({"doc_id": range(60),
                       "text": [t for _, t in docs],
                       "source": [s for s, _ in docs]})
    B = 64
    got = dsir_weights(ray.data.from_pandas(df), target_sources=("tgt",),
                       n_features=B).to_pandas().set_index("doc_id")
    tgt_scores = got.loc[:29, "logweight"]
    raw_scores = got.loc[30:, "logweight"]
    assert tgt_scores.min() > raw_scores.max()

    # numpy reference for one document's weight
    toks = df.loc[0, "text"].split()
    q = np.zeros(B, np.int64)
    p = np.zeros(B, np.int64)
    for _, row in df.iterrows():
        tk = np.array(row["text"].split(), object)
        bk = _feature_bucket_of(tk, B)
        np.add.at(q, bk, 1)
        if row["source"] == "tgt":
            np.add.at(p, bk, 1)
    qt, pt = int(q.sum()), int(p.sum())
    expect = sum(
        math.floor(1e6 * math.log((p[b] + 1.0) / (pt + B)))
        - math.floor(1e6 * math.log((q[b] + 1.0) / (qt + B)))
        for b in _feature_bucket_of(np.array(toks, object), B))
    assert got.loc[0, "logweight"] == expect
    assert got.loc[0, "n_tokens"] == len(toks)


def test_dup_ngram_spans_short_and_empty_docs(ray_session):
    """Docs with fewer than k tokens (including empty text) emit zero
    grams but still appear with n_grams=0 — the left-join base-row
    semantics the SQL oracle encodes."""
    import ray.data
    from seo_crawler_ray.pipelines.textops import dup_ngram_spans
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["", "one two", "a b c d e", "a b c d e"],
    })
    got = dup_ngram_spans(ray.data.from_pandas(docs), k=3) \
        .to_pandas().set_index("doc_id").sort_index()
    assert len(got) == 4
    assert got.loc[0].tolist() == [0, 0, 0, 0]
    assert got.loc[1].tolist() == [0, 0, 0, 0]   # 2 tokens < k
    # docs 2/3 are identical: every gram duplicated, one span of 5
    assert got.loc[2].tolist() == [3, 3, 1, 5]
    assert got.loc[3].tolist() == [3, 3, 1, 5]


def test_dsir_weights_drops_zero_token_docs(ray_session):
    """Zero-token docs drop from the output (SQL token-join parity);
    docs made only of non-[a-z0-9] characters count as zero-token."""
    import ray.data
    from seo_crawler_ray.pipelines.textops import dsir_weights
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["hello world", "", "!!! ---"],
        "source": ["tgt", "tgt", "other"],
    })
    got = dsir_weights(ray.data.from_pandas(docs),
                       target_sources=("tgt",), n_features=16).to_pandas()
    assert sorted(got["doc_id"]) == [0]
    assert got.iloc[0]["n_tokens"] == 2


def test_dup_ngram_spans_sizing_invariant(ray_session, tmp_path):
    """Auto-sized vs hand-tuned must be byte-identical: bucket count and
    wave split partition the gram space, never the answer (VERDICT r4 #2:
    bucket count + spill-wave mode are self-deriving)."""
    import ray.data
    from seo_crawler_ray.pipelines.textops import dup_ngram_spans

    rng = np.random.RandomState(59)
    vocab = np.array([f"w{i}" for i in range(40)])
    texts = [" ".join(rng.choice(vocab, rng.randint(4, 50)))
             for _ in range(120)]
    texts[30] = texts[2]                      # planted exact dup
    texts[31] = texts[2] + " extra tail words here"
    docs = pd.DataFrame({"doc_id": range(120), "text": texts})

    def run(**kw):
        return (dup_ngram_spans(ray.data.from_pandas(docs), k=4, **kw)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    auto = run()                                       # n_buckets=0, waves=0
    assert auto.loc[30, "dup_grams"] > 0
    for alt in (run(n_buckets=7),
                run(n_buckets=101, n_waves=1),
                run(n_buckets=64, n_waves=3,
                    scratch_dir=str(tmp_path / "waves3")),
                run(n_buckets=13, n_waves=5,
                    scratch_dir=str(tmp_path / "waves5"))):
        pd.testing.assert_frame_equal(auto, alt)

    # a tiny store budget must force multi-wave and still be identical
    forced = run(n_buckets=32, store_budget_bytes=1,
                 scratch_dir=str(tmp_path / "forced"))
    pd.testing.assert_frame_equal(auto, forced)
    # the forced run actually took the wave path (scratch populated)
    import glob
    assert glob.glob(str(tmp_path / "forced" / "wave-*" / "*.parquet"))


def test_epoch_shuffle_matches_reference(ray_session):
    """Engine order == a straight-line pure-Python splitmix64 reference;
    output is a permutation; shards stripe round-robin; seeds decorrelate."""
    import ray.data

    from seo_crawler_ray.pipelines.textops import epoch_shuffle

    def ref_key(x, seed):
        fold = (0x9E3779B97F4A7C15 * (2 * seed + 1)) % 2 ** 64
        z = (x + fold) % 2 ** 64
        z ^= z >> 30
        z = (z * 0xBF58476D1CE4E5B9) % 2 ** 64
        z ^= z >> 27
        z = (z * 0x94D049BB133111EB) % 2 ** 64
        z ^= z >> 31
        return z

    ids = list(range(0, 400, 3))
    df = pd.DataFrame({"doc_id": ids, "text": ["t"] * len(ids)})
    got = epoch_shuffle(ray.data.from_pandas(df).repartition(9),
                        seed=5, n_shards=4).to_pandas() \
        .sort_values("pos").reset_index(drop=True)
    want_order = [i for i, _ in sorted(
        ((i, ref_key(i, 5)) for i in ids), key=lambda t: (t[1], t[0]))]
    assert got["doc_id"].tolist() == want_order
    assert sorted(got["pos"]) == list(range(len(ids)))      # permutation
    assert (got["shard"] == got["pos"] % 4).all()
    other = epoch_shuffle(ray.data.from_pandas(df), seed=6,
                          n_shards=4).to_pandas().sort_values("pos")
    assert other["doc_id"].tolist() != want_order           # seed matters


def test_ppl_buckets_matches_reference(ray_session):
    """CCNet terciles == a straight-line local reference: same unigram
    surprisal model, score = (surprisal * 1000) // n_tokens, NTILE(3)
    per lang over (score, doc_id) with larger groups first; zero-token
    docs absent; multi-block layout irrelevant."""
    import math
    import re
    from collections import Counter

    import ray.data

    from seo_crawler_ray.pipelines.textops import ppl_buckets

    rng = np.random.RandomState(11)
    words = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(61):                       # 61 docs over 3 langs:
        lang = ["en", "fr", "de"][i % 3]      # 21/20/20 -> NTILE sizes
        text = " ".join(rng.choice(words, rng.randint(3, 30)))
        rows.append({"doc_id": i, "text": text, "lang": lang})
    rows.append({"doc_id": 61, "text": "???", "lang": "en"})  # 0 tokens
    pdf = pd.DataFrame(rows)

    ctr: Counter = Counter()
    toks = {}
    for did, t in zip(pdf["doc_id"], pdf["text"]):
        toks[did] = re.findall(r"[a-z0-9]+", t.lower())
        ctr.update(toks[did])
    n = sum(ctr.values())
    sup = {w: int(math.floor(1e6 * math.log(n / c))) for w, c in ctr.items()}
    want = {}
    for lang in ("en", "fr", "de"):
        scored = sorted(
            (( (sum(sup[w] for w in toks[did]) * 1000) // len(toks[did]),
               did)
             for did in pdf.loc[pdf["lang"] == lang, "doc_id"]
             if len(toks[did]) > 0))
        m = len(scored)
        base, rem = divmod(m, 3)
        s1 = base + (1 if rem > 0 else 0)
        s12 = s1 + base + (1 if rem > 1 else 0)
        for r, (score, did) in enumerate(scored):
            want[did] = (score,
                         "head" if r < s1 else
                         "middle" if r < s12 else "tail")

    got = ppl_buckets(
        ray.data.from_pandas(pdf.sample(frac=1, random_state=3))
        .repartition(7)).to_pandas()
    assert len(got) == len(want)              # doc 61 (0 tokens) absent
    for _, row in got.iterrows():
        assert want[row["doc_id"]] == (row["score"], row["ppl_bucket"]), \
            row["doc_id"]


def test_ppl_buckets_tiny_languages_match_duckdb_ntile(ray_session):
    """Languages with fewer than 3 docs: NTILE(3) short groups must match
    DuckDB exactly (1 doc -> head; 2 docs -> head, middle)."""
    import duckdb
    import ray.data

    from seo_crawler_ray.pipelines.textops import ppl_buckets, \
        ppl_buckets_sql

    pdf = pd.DataFrame({
        "doc_id": range(6),
        "text": ["alpha beta", "beta gamma delta", "alpha alpha",
                 "delta", "epsilon zeta eta", "zeta"],
        "lang": ["solo", "duo", "duo", "trio", "trio", "trio"]})
    got = (ppl_buckets(ray.data.from_pandas(pdf).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (con.execute(ppl_buckets_sql()).df()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)


# --------------------------------------------- C4 line/doc quality filters
def test_c4_filters_matches_sql(ray_session, tmp_path):
    """The per-line keep predicate, doc gates and kept-line md5 must match
    the DuckDB lambda oracle byte-for-byte, including the traps: trailing
    newline (empty last line), multi-space word counting, case-folded
    javascript/lorem mentions, terminal-quote lines, empty kept set."""
    import duckdb
    import pandas as pd
    import ray.data
    from seo_crawler_ray.pipelines.textops import c4_filters, c4_filters_sql

    texts = [
        "Good line one here.\nAnother fine line!\nIs this kept?\nyes it is.",
        "Short.\ntwo words.\nends with quote here\"\nx y z.",   # quote line
        "uses JavaScript heavily here.\nok line number two.\nthird good line.\nfourth good line.",
        "lorem ipsum dolor sit amet.\nline two is fine.\nline three is fine.\nline four is fine.",
        "has a { brace.\nline two is fine.\nline three is fine.\nline four is fine.",
        "trailing newline line one.\nsecond line kept too.\nthird line kept.\n",
        "many   spaces   between   words.\nno terminal punct on this line\nshort.\n.",
        "",                                     # dropped by text <> ''
        "no newlines at all just one long line without punct",
    ]
    pdf = pd.DataFrame({
        "url": [f"https://h.example/p{i}" for i in range(len(texts))],
        "text": texts})
    pdf.to_parquet(tmp_path / "pages.parquet")
    got = c4_filters(ray.data.from_pandas(pdf).repartition(3)).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    want = duckdb.sql(c4_filters_sql(str(tmp_path / "pages.parquet"))).df() \
        .sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == len(texts) - 1          # empty text dropped
    by = dict(zip(got["url"], got["keep"]))
    assert by["https://h.example/p0"]          # clean doc kept
    assert not by["https://h.example/p3"]      # lorem ipsum
    assert not by["https://h.example/p4"]      # curly brace


# ------------------------------------------- PMI bigram collocations ------
def test_pmi_bigrams_matches_sql(ray_session, tmp_path):
    """Integerized-log PMI against the DuckDB oracle on a corpus with
    real collocation structure (some pairs always adjacent), plus the
    edge cases: empty text, single-token doc, sub-min_count pairs."""
    import duckdb
    import pandas as pd
    import ray.data
    from seo_crawler_ray.pipelines.textops import (pmi_bigrams,
                                                   pmi_bigrams_sql)
    rng = np.random.RandomState(23)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for _ in range(120):
        toks = list(rng.choice(vocab, rng.randint(2, 40)))
        if rng.rand() < 0.6:
            toks += ["strong", "pair"] * rng.randint(1, 4)   # collocation
        texts.append(" ".join(toks))
    texts += ["", "solo", "rare1 rare2"]   # no bigrams / sub-min_count
    pdf = pd.DataFrame({"text": texts})
    pdf.to_parquet(tmp_path / "docs.parquet")
    got = pmi_bigrams(ray.data.from_pandas(pdf).repartition(7),
                      min_count=4, k=50).to_pandas()
    want = duckdb.sql(pmi_bigrams_sql(
        min_count=4, k=50,
        docs=f"read_parquet('{tmp_path / 'docs.parquet'}')")).df()
    pd.testing.assert_frame_equal(got, want)
    assert got.iloc[0][["w1", "w2"]].tolist() == ["strong", "pair"]


def test_pmi_bigrams_empty_corpus(ray_session):
    import pandas as pd
    import ray.data
    from seo_crawler_ray.pipelines.textops import pmi_bigrams
    ds = ray.data.from_pandas(pd.DataFrame({"text": ["", "one"]}))
    out = pmi_bigrams(ds, min_count=1, k=10)
    # schema survives the empty path (to_pandas drops columns at 0 rows —
    # a Ray quirk — so assert on the Dataset schema)
    assert out.schema().names == ["w1", "w2", "n", "pmi_i"]
    assert out.count() == 0


# ------------------------------------------ Heaps-law vocabulary growth ---
def test_vocab_growth_matches_sql(ray_session, tmp_path):
    """Decile checkpoints + first-occurrence counting vs the DuckDB
    oracle, including non-contiguous doc_ids and checkpoint-boundary
    terms (f == checkpoint is NOT counted at that k)."""
    import duckdb
    import pandas as pd
    import ray.data
    from seo_crawler_ray.pipelines.textops import (vocab_growth,
                                                   vocab_growth_sql)
    rng = np.random.RandomState(29)
    vocab = [f"t{i}" for i in range(60)]
    ids = sorted(rng.choice(2000, 90, replace=False))  # non-contiguous
    pdf = pd.DataFrame({
        "doc_id": ids,
        "text": [" ".join(rng.choice(vocab, rng.randint(1, 25)))
                 for _ in ids]})
    pdf.to_parquet(tmp_path / "docs.parquet")
    got = vocab_growth(ray.data.from_pandas(pdf).repartition(5)) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    want = duckdb.sql(vocab_growth_sql(
        docs=f"read_parquet('{tmp_path / 'docs.parquet'}')")).df() \
        .sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert got["vocab"].is_monotonic_increasing
    n_distinct = len({w for t in pdf["text"] for w in t.split()})
    assert got["vocab"].iloc[-1] == n_distinct   # last checkpoint = all


# --------------------------------- temperature (alpha) mixture quotas -----
def test_alpha_mixture_quota_matches_sql(ray_session, tmp_path):
    """Skewed group sizes vs the DuckDB oracle; quotas must sum exactly
    to the budget and upweight the smallest group relative to its raw
    share (the point of alpha < 1)."""
    import duckdb
    import pandas as pd
    import ray.data
    from seo_crawler_ray.pipelines.textops import (alpha_mixture_quota,
                                                   alpha_mixture_quota_sql)
    sizes = {"aa": 700, "bb": 150, "cc": 90, "dd": 47, "ee": 13}
    rows = [{"lang": k, "text": f"doc {k} {i}"}
            for k, n in sizes.items() for i in range(n)]
    pdf = pd.DataFrame(rows)
    pdf.to_parquet(tmp_path / "docs.parquet")
    got = alpha_mixture_quota(ray.data.from_pandas(pdf).repartition(6),
                              budget=1000, alpha=0.3) \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    want = duckdb.sql(alpha_mixture_quota_sql(
        budget=1000, alpha=0.3,
        docs=f"read_parquet('{tmp_path / 'docs.parquet'}')")).df() \
        .sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert got["quota"].sum() == 1000
    share = dict(zip(got["lang"], got["quota"]))
    # alpha=0.3 lifts ee above its raw 1.3% share and caps aa below 70%
    assert share["ee"] / 1000 > sizes["ee"] / 1000
    assert share["aa"] / 1000 < sizes["aa"] / 1000


def test_alpha_mixture_quota_uniform_and_single(ray_session):
    import pandas as pd
    import ray.data
    from seo_crawler_ray.pipelines.textops import alpha_mixture_quota
    pdf = pd.DataFrame({"lang": ["x"] * 10 + ["y"] * 10, "text": "t"})
    out = alpha_mixture_quota(ray.data.from_pandas(pdf),
                              budget=7, alpha=0.3).to_pandas()
    assert out["quota"].sum() == 7
    assert sorted(out["quota"]) == [3, 4]   # tie -> key-ascending leftover
    assert out.loc[out["lang"] == "x", "quota"].iloc[0] == 4
