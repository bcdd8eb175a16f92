"""The bench.py driver contract: one JSON line on stdout with the agreed
keys — a regression here breaks the external grader's BENCH_r{N} record
silently, so it gets its own smoke test (crawl-only at sf0.001 to keep
it fast; the subprocess owns its Ray session per the contract)."""
import json
import os
import subprocess
import sys


def test_bench_json_contract():
    env = dict(os.environ, GRAFT_SF_DIR="/root/testdata/sf0.001",
               RAY_GRAFT_CPUS="4", RAY_GRAFT_CRAWL_ONLY="1",
               RAY_GRAFT_CRAWL_RUNS="1")
    out = subprocess.run([sys.executable, "bench.py"], env=env,
                         capture_output=True, text=True, check=True,
                         cwd="/root/repo", timeout=300).stdout
    line = out.strip().splitlines()[-1]
    d = json.loads(line)               # exactly one parseable JSON line
    assert {"metric", "value", "unit", "queries", "sf", "num_cpus",
            "crawl_urls_per_sec"} <= set(d)
    assert d["unit"] == "sec" and d["sf"] == "sf0.001"
    assert d["num_cpus"] == 4
    assert d["value"] > 0 and d["crawl_urls_per_sec"] > 0
    assert d["queries"]["crawl"] == d["value"]
