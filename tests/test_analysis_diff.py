"""Anchor-text profiles and recrawl diff: distributed results vs
single-process pandas references, including the branches the driver query
can't reach (removed/changed rows, anchor frequency ties)."""
import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def anchor_links(ray_session):
    import ray.data
    rng = np.random.RandomState(7)
    targets = [f"https://ex.com/t{i}" for i in range(40)]
    anchors = ["home", "read more", "click here", "", "docs"]
    rows = []
    for i in range(600):
        rows.append((f"https://ex.com/s{rng.randint(50)}",
                     targets[rng.randint(40)],
                     anchors[rng.randint(len(anchors))], True))
    # external links must be ignored
    rows.append(("https://ex.com/s0", "https://other.com/x", "out", False))
    # a tie case: two anchors with equal counts -> lexicographic winner
    rows += [("https://ex.com/sA", "https://ex.com/tie", "beta", True),
             ("https://ex.com/sB", "https://ex.com/tie", "alpha", True)]
    df = pd.DataFrame(rows, columns=["source_url", "target_url",
                                     "anchor_text", "is_internal"])
    return ray.data.from_pandas(df).repartition(8), df


def test_anchor_profiles_matches_pandas(anchor_links):
    from seo_crawler_ray.pipelines.analysis import anchor_profiles
    links_ds, df = anchor_links
    got = anchor_profiles(links_ds).to_pandas() \
        .sort_values("target_url").reset_index(drop=True)

    d = df[df["is_internal"]]
    cnt = d.groupby(["target_url", "anchor_text"]).size().reset_index(name="n")
    cnt = cnt.sort_values(["target_url", "n", "anchor_text"],
                          ascending=[True, False, True])
    want = cnt.groupby("target_url").agg(
        n_links=("n", "sum"), n_anchors=("n", "size"),
        top_anchor=("anchor_text", "first"), top_anchor_n=("n", "first")) \
        .reset_index().sort_values("target_url").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()].astype(want.dtypes.to_dict()), want)
    tie = got[got["target_url"] == "https://ex.com/tie"].iloc[0]
    assert tie["top_anchor"] == "alpha" and tie["top_anchor_n"] == 1


def test_recrawl_diff_all_change_types(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.analysis import recrawl_diff
    old = pd.DataFrame({
        "url": ["u/a", "u/b", "u/c", "u/d", "u/f", "u/g"],
        "status_code": [200, 200, 404, 200, 200, 200],
        "word_count": [10, 20, 0, 30, 1, 2],
        "title": ["A", "B", "", "D", None, None],
    })
    new = pd.DataFrame({
        "url": ["u/a", "u/b", "u/d", "u/e", "u/f", "u/g"],
        "status_code": [200, 500, 200, 200, 200, 200],  # b: status change
        "word_count": [10, 20, 31, 5, 1, 2],            # d: wc change
        # a: unchanged; e: added; f: null title BOTH sides -> unchanged;
        # g: null vs value -> NOT a change under SQL <> null semantics
        "title": ["A", "B", "D", "E", None, "G"],
    })
    got = recrawl_diff(ray.data.from_pandas(old).repartition(3),
                       ray.data.from_pandas(new).repartition(2)) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    want = pd.DataFrame({
        "url": ["u/b", "u/c", "u/d", "u/e"],
        "change": ["changed", "removed", "changed", "added"],
        "old_status": [200, 404, 200, -1],
        "new_status": [500, -1, 200, 200],
    })
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)


def test_recrawl_diff_identical_inputs_empty(ray_session):
    import ray.data
    from seo_crawler_ray.pipelines.analysis import recrawl_diff
    df = pd.DataFrame({"url": [f"u/{i}" for i in range(50)],
                       "status_code": [200] * 50,
                       "word_count": list(range(50)),
                       "title": [f"t{i}" for i in range(50)]})
    ds = ray.data.from_pandas(df).repartition(4)
    assert recrawl_diff(ds, ds).count() == 0
