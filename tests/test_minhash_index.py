"""Incremental MinHash index: query(new, index(history)) must equal the
cross-side subset of the batch operator run on the union — the index is a
persisted factorization of ``minhash_near_dups``, not a new similarity
definition."""
import os

import pandas as pd
import pytest


def _split_ds(sf_dir, pred):
    """pred: vectorized numpy mask over the doc_id array."""
    import pyarrow as pa
    import ray.data

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(pred(b["doc_id"].to_numpy())))

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]).map_batches(keep, batch_format="pyarrow")


def _cross_pairs(all_pairs: pd.DataFrame, old_ids: set, new_ids: set):
    """(new, old) orientation of the batch result's cross-side pairs."""
    rows = []
    for a, b, j in zip(all_pairs["a"], all_pairs["b"], all_pairs["jaccard"]):
        if a in old_ids and b in new_ids:
            rows.append((int(b), int(a), round(float(j), 6)))
        elif b in old_ids and a in new_ids:
            rows.append((int(a), int(b), round(float(j), 6)))
    return sorted(rows)


SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_parity(ray_session, tmp_path_factory):
    """Build on even doc_ids, query odd ones; batch run on the union is
    the expected answer."""
    from seo_crawler_ray.pipelines.minhash_index import (
        build_minhash_index, query_minhash_index)
    from seo_crawler_ray.pipelines.textops import minhash_near_dups
    import ray.data

    idx_dir = str(tmp_path_factory.mktemp("mh_idx") / "idx")
    hist = _split_ds(SF, lambda i: i % 2 == 0)
    newd = _split_ds(SF, lambda i: i % 2 == 1)
    build_minhash_index(hist, idx_dir)
    got = query_minhash_index(newd, idx_dir, threshold=0.5)

    union = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"])
    allp = minhash_near_dups(union, threshold=0.5)
    old_ids = set(hist.to_pandas()["doc_id"])
    new_ids = set(newd.to_pandas()["doc_id"])
    want = _cross_pairs(allp, old_ids, new_ids)
    return got, want, idx_dir


def test_query_matches_batch_cross_pairs(index_parity):
    got, want, _ = index_parity
    got_rows = sorted(zip(got["new"].astype(int), got["old"].astype(int),
                          got["jaccard"].round(6)))
    assert got_rows == want
    assert len(want) > 0            # fixture actually exercises matches


def test_append_generation_equivalent_to_monolithic(ray_session,
                                                    tmp_path_factory):
    """history split across two generations == one generation: query sees
    the union of all generations."""
    from seo_crawler_ray.pipelines.minhash_index import (
        append_minhash_index, build_minhash_index, query_minhash_index)

    newd = _split_ds(SF, lambda i: i % 3 == 2)

    mono = str(tmp_path_factory.mktemp("mh_mono") / "idx")
    build_minhash_index(_split_ds(SF, lambda i: i % 3 != 2), mono)
    want = query_minhash_index(newd, mono, threshold=0.5)

    lsm = str(tmp_path_factory.mktemp("mh_lsm") / "idx")
    build_minhash_index(_split_ds(SF, lambda i: i % 3 == 0), lsm)
    append_minhash_index(_split_ds(SF, lambda i: i % 3 == 1), lsm)
    got = query_minhash_index(newd, lsm, threshold=0.5)

    assert got.values.tolist() == want.values.tolist()
    assert len(got) > 0


def test_query_no_matches_and_guards(ray_session, tmp_path_factory):
    from seo_crawler_ray.pipelines.minhash_index import (
        append_minhash_index, build_minhash_index, query_minhash_index)
    import ray.data

    idx_dir = str(tmp_path_factory.mktemp("mh_empty") / "idx")
    hist = _split_ds(SF, lambda i: i < 50)
    build_minhash_index(hist, idx_dir)

    # unrelated text: no pairs, empty typed frame
    alien = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [10_000], "text": ["zq xv qq zz yy ww vv uu tt ss"]}))
    got = query_minhash_index(alien, idx_dir, threshold=0.5)
    assert list(got.columns) == ["new", "old", "jaccard"]
    assert len(got) == 0

    # double-build refuses; append to missing dir refuses
    with pytest.raises(ValueError):
        build_minhash_index(hist, idx_dir)
    with pytest.raises(ValueError):
        append_minhash_index(hist, str(tmp_path_factory.mktemp("nope")))


def test_identical_doc_hits_index_at_one(ray_session, tmp_path_factory):
    """A byte-identical new doc must come back with jaccard exactly 1.0."""
    from seo_crawler_ray.pipelines.minhash_index import (
        build_minhash_index, query_minhash_index)
    import pyarrow.parquet as pq
    import ray.data

    idx_dir = str(tmp_path_factory.mktemp("mh_ident") / "idx")
    hist = _split_ds(SF, lambda i: i < 100)
    build_minhash_index(hist, idx_dir)
    t = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text"]).to_pandas()
    clone = pd.DataFrame({"doc_id": [99_991],
                          "text": [t["text"].iloc[3]]})
    got = query_minhash_index(ray.data.from_pandas(clone), idx_dir,
                              threshold=0.9)
    hits = got[got["old"] == int(t["doc_id"].iloc[3])]
    assert len(hits) == 1
    assert float(hits["jaccard"].iloc[0]) == 1.0


def test_compaction_preserves_query_and_reduces_probe_reads(
        ray_session, tmp_path_factory):
    """Major compaction: pairs identical pre/post, one generation remains,
    and the probe pays O(touched buckets) partition reads instead of
    O(generations x buckets)."""
    from seo_crawler_ray.pipelines.minhash_index import (
        _BucketProbe, _bands_with_bucket, _generations, append_minhash_index,
        build_minhash_index, compact_minhash_index, query_minhash_index)
    from seo_crawler_ray.pipelines.textops import shingle_blob_batch
    import pyarrow as pa

    idx_dir = str(tmp_path_factory.mktemp("mh_compact") / "idx")
    build_minhash_index(_split_ds(SF, lambda i: i % 3 == 0), idx_dir)
    append_minhash_index(_split_ds(SF, lambda i: i % 3 == 1), idx_dir)
    append_minhash_index(_split_ds(SF, lambda i: i % 3 == 2), idx_dir)
    assert len(_generations(idx_dir)) == 3

    newd = _split_ds(SF, lambda i: i < 40)
    want = query_minhash_index(newd, idx_dir, threshold=0.5)
    assert len(want) > 0

    # probe-read count on the same band rows, before vs after
    probe_in = _bands_with_bucket(shingle_blob_batch(
        pa.table(newd.to_pandas()[["doc_id", "text"]]),
        text_col="text", id_col="doc_id")).to_pandas()
    touched = probe_in["bucket"].nunique()

    def reads(gen_dirs):
        p = _BucketProbe(tuple(gen_dirs))
        p._LRU = 10_000                     # count distinct reads only
        srt = probe_in.sort_values("bucket").reset_index(drop=True)
        for i in range(0, len(srt), 512):
            p(srt.iloc[i:i + 512])
        return p.partition_reads

    pre = reads(_generations(idx_dir))

    meta = compact_minhash_index(idx_dir)
    gens = _generations(idx_dir)
    assert len(gens) == 1
    assert meta["compacted_from"] == 3

    got = query_minhash_index(newd, idx_dir, threshold=0.5)
    pd.testing.assert_frame_equal(got, want)

    post = reads(gens)
    assert post <= touched
    assert post < pre                       # strictly fewer disk reads

    # nothing left to compact
    with pytest.raises(ValueError):
        compact_minhash_index(idx_dir)


def test_query_reads_pre_layout2_hive_generation(ray_session,
                                                 tmp_path_factory):
    """band_layout 1 (hive bucket=<b>/ dirs, written by earlier builds)
    must still be readable by the probe (ADVICE r4: the flat-file rename
    silently returned zero pairs on old indexes), and compaction must
    refuse it loudly rather than merge a layout it does not know."""
    import glob
    import json as _json
    import shutil

    from seo_crawler_ray.pipelines.minhash_index import (
        append_minhash_index, build_minhash_index, compact_minhash_index,
        query_minhash_index)

    idx_dir = str(tmp_path_factory.mktemp("mh_hive") / "idx")
    build_minhash_index(_split_ds(SF, lambda i: i % 4 == 0), idx_dir)
    # second (layout-2) generation so compaction reaches the layout check
    append_minhash_index(_split_ds(SF, lambda i: i % 4 == 2), idx_dir)
    newd = _split_ds(SF, lambda i: i % 2 == 1)
    want = query_minhash_index(newd, idx_dir, threshold=0.5)
    assert len(want) > 0

    # rewrite gen-000000's bands into the old hive layout and strip the
    # meta marker, exactly what a pre-layout-2 build left on disk
    gen = os.path.join(idx_dir, "gen-000000")
    for f in glob.glob(os.path.join(gen, "bands", "bucket-*.parquet")):
        b = int(os.path.basename(f).split("-")[1].split(".")[0])
        d = os.path.join(gen, "bands", f"bucket={b}")
        os.makedirs(d)
        shutil.move(f, os.path.join(d, "part-0.parquet"))
    mp = os.path.join(gen, "meta.json")
    meta = _json.load(open(mp))
    del meta["band_layout"]
    _json.dump(meta, open(mp, "w"))

    got = query_minhash_index(newd, idx_dir, threshold=0.5)
    pd.testing.assert_frame_equal(got, want)

    with pytest.raises(ValueError, match="band_layout"):
        compact_minhash_index(idx_dir)
