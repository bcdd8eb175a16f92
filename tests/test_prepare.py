"""End-to-end training-data prepare pipeline: output must equal a
single-process reference applying the same rules, layout must be
partitioned by split, and _DONE-based resume must not rewrite shards."""
import glob
import hashlib
import json
import os
import re

import numpy as np
import pandas as pd
import pytest

DOCS = "/root/testdata/sf0.001/documents.parquet"
PROBES = ("the fast key order sort", "batch batch batch stream")


def _reference(pdf: pd.DataFrame, min_tokens: int, probes, n: int = 3):
    grams = set()
    for p in probes:
        w = re.findall(r"[a-z0-9]+", p.lower())
        grams.update(" ".join(w[i:i + n]) for i in range(len(w) - n + 1))
    rows = []
    for _, r in pdf.iterrows():
        w = re.findall(r"[a-z0-9]+", r["text"].lower())
        if len(w) < min_tokens:
            continue
        if any(" ".join(w[i:i + n]) in grams
               for i in range(len(w) - n + 1)):
            continue
        rows.append((r["doc_id"], r["text"], len(w)))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "n_tokens"])
    # exact dedup: keep min doc_id per md5(text)
    df["h"] = [hashlib.md5(t.encode()).hexdigest() for t in df["text"]]
    df = df.sort_values("doc_id").groupby("h", sort=False).head(1)
    bucket = df["doc_id"].map(
        lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        % 1000)
    df["split"] = np.where(bucket < 50, "val",
                           np.where(bucket < 100, "test", "train"))
    return df


def test_prepare_matches_reference_and_resumes(ray_session, tmp_path):
    from seo_crawler_ray.pipelines.prepare import prepare_training_data
    out = str(tmp_path / "prep")
    manifest = prepare_training_data(DOCS, out, min_tokens=5,
                                     probes=PROBES)
    want = _reference(pd.read_parquet(DOCS), 5, PROBES)

    import ray.data
    got = ray.data.read_parquet(os.path.join(out, "data")).to_pandas()
    assert set(got["doc_id"]) == set(want["doc_id"])
    gsplit = got.set_index("doc_id")["split"]
    for did, s in zip(want["doc_id"], want["split"]):
        assert gsplit[did] == s
    for s, grp in want.groupby("split"):
        assert manifest["splits"][s]["n_docs"] == len(grp)
        assert manifest["splits"][s]["n_tokens"] == int(
            grp["n_tokens"].sum())
    # layout: hive-partitioned by split, more than one file overall
    for s in want["split"].unique():
        assert glob.glob(os.path.join(out, "data", f"split={s}",
                                      "*.parquet"))
    assert os.path.exists(os.path.join(out, "_DONE"))

    # resume: identical manifest, shards untouched
    files = sorted(glob.glob(os.path.join(out, "data", "**", "*.parquet"),
                             recursive=True))
    mtimes = [os.path.getmtime(f) for f in files]
    again = prepare_training_data(DOCS, out, min_tokens=5, probes=PROBES,
                                  resume=True)
    assert again == manifest
    assert [os.path.getmtime(f) for f in files] == mtimes

    # non-resume rerun overwrites cleanly (no APPEND duplication)
    third = prepare_training_data(DOCS, out, min_tokens=5, probes=PROBES)
    assert third["splits"] == manifest["splits"]
    total = sum(v["n_docs"] for v in third["splits"].values())
    assert ray.data.read_parquet(
        os.path.join(out, "data")).count() == total


def test_prepare_min_tokens_gate(ray_session, tmp_path):
    from seo_crawler_ray.pipelines.prepare import prepare_training_data
    out = str(tmp_path / "prep_hi")
    manifest = prepare_training_data(DOCS, out, min_tokens=60)
    want = _reference(pd.read_parquet(DOCS), 60, ())
    assert sum(v["n_docs"] for v in manifest["splits"].values()) == len(want)


def test_prepare_reads_jsonl_and_csv(ray_session, tmp_path):
    """Same pipeline over the same rows in JSONL and CSV must produce the
    same manifest as the parquet run (format-agnostic ingestion)."""
    from seo_crawler_ray.pipelines.prepare import prepare_training_data
    pdf = pd.read_parquet(DOCS)
    jl = str(tmp_path / "docs.jsonl")
    pdf.to_json(jl, orient="records", lines=True)
    cv = str(tmp_path / "docs.csv")
    pdf.to_csv(cv, index=False)
    m_pq = prepare_training_data(DOCS, str(tmp_path / "o1"), min_tokens=5)
    m_jl = prepare_training_data(jl, str(tmp_path / "o2"), min_tokens=5)
    m_cv = prepare_training_data(cv, str(tmp_path / "o3"), min_tokens=5)
    assert m_jl["splits"] == m_pq["splits"]
    assert m_cv["splits"] == m_pq["splits"]


def test_prepare_all_filtered_is_empty_not_crash(ray_session, tmp_path):
    """min_tokens above every doc: valid empty manifest, and a prior
    run's shards must survive the failed/empty rerun (temp-dir swap)."""
    from seo_crawler_ray.pipelines.prepare import prepare_training_data
    out = str(tmp_path / "prep_empty")
    full = prepare_training_data(DOCS, out, min_tokens=5)
    assert sum(v["n_docs"] for v in full["splits"].values()) > 0
    empty = prepare_training_data(DOCS, out, min_tokens=10_000)
    assert empty["splits"] == {}
    assert not glob.glob(os.path.join(out, "data", "**", "*.parquet"),
                         recursive=True)


def test_prepare_kill_then_rerun_recovers(tmp_path):
    """Crash-safety probe (subprocess, own Ray): kill a prepare run at
    varying points; at every point the out_dir must remain recoverable —
    a rerun produces the same manifest as a clean run, and a previously
    COMPLETED run's data is either intact or superseded, never
    half-deleted."""
    import json
    import subprocess
    import sys

    out = str(tmp_path / "prep_kill")
    env = dict(os.environ)
    cmd = [sys.executable, "-m", "seo_crawler_ray", "prepare",
           "--docs", DOCS, "--out", out, "--min-tokens", "5"]
    clean = subprocess.run(cmd, capture_output=True, text=True,
                           cwd="/root/repo", env=env, check=True)
    want = json.loads(clean.stdout.strip().splitlines()[-1])

    for kill_after in (3, 6):
        p = subprocess.Popen(cmd, cwd="/root/repo", env=env,
                             stdout=subprocess.DEVNULL,
                             stderr=subprocess.DEVNULL)
        try:
            p.wait(timeout=kill_after)
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()
        # invariant: if _DONE exists the data dir must be complete and
        # readable; killed-midway states must never lose BOTH dirs
        assert (os.path.exists(os.path.join(out, "data"))
                or os.path.exists(os.path.join(out, "data.old")))
        rerun = subprocess.run(cmd + ["--resume"], capture_output=True,
                               text=True, cwd="/root/repo", env=env,
                               check=True)
        got = json.loads(rerun.stdout.strip().splitlines()[-1])
        assert got["splits"] == want["splits"]
        assert not os.path.exists(os.path.join(out, "data.tmp"))
        assert not os.path.exists(os.path.join(out, "data.old"))


def test_prepare_jsonl_output_matches_parquet(ray_session, tmp_path):
    """JSONL shards: same manifest as the parquet run, one JSON doc per
    line, readable back with identical (doc_id, split) assignments."""
    import json
    import ray.data
    from seo_crawler_ray.pipelines.prepare import prepare_training_data
    m_pq = prepare_training_data(DOCS, str(tmp_path / "pq"), min_tokens=5)
    m_jl = prepare_training_data(DOCS, str(tmp_path / "jl"), min_tokens=5,
                                 output_format="jsonl")
    assert m_jl["splits"] == m_pq["splits"]
    files = glob.glob(str(tmp_path / "jl" / "data" / "split=*" / "*"))
    assert files and all(f.endswith(".json") for f in files)
    # each line is one JSON object with the full row schema
    with open(files[0]) as f:
        row = json.loads(f.readline())
    assert {"doc_id", "text", "split", "n_tokens"} <= set(row)
    back = ray.data.read_json(glob.glob(
        str(tmp_path / "jl" / "data" / "split=*"))).to_pandas()
    pq = ray.data.read_parquet(str(tmp_path / "pq" / "data")).to_pandas()
    assert set(zip(back["doc_id"], back["split"])) == \
        set(zip(pq["doc_id"], pq["split"]))
