"""Scale probe for dup_ngram_spans auto-sizing (VERDICT r4 #2).

Runs the ExactSubstr operator over N documents of the derived 10x text
table (/tmp/docs600k, ~3,400 tokens/doc — the same harness as the r4
measurements: limit + repartition to ~1k-doc blocks, materialized) with
FULLY AUTO sizing (n_buckets=0, n_waves=0) and prints one JSON line with
the wall time, docs/s, and the derived plan. Usage:

    python scripts/dup_ngram_probe.py [n_docs] [k]

Fresh Ray session per invocation; clean /tmp/ray spill dirs between
heavy probes (CLAUDE.md). Harness note: feeding the operator giant
blocks (e.g. a single-file read without repartition) makes gram_rows
batches multi-GB and the whole run memory-thrashes — block size is the
caller's lever, ~1k docs/block is the measured sweet spot.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
CORPUS = os.environ.get("PROBE_CORPUS", "/tmp/docs600k")


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from seo_crawler_ray.pipelines.textops import dup_ngram_spans

    docs = (ray.data.read_parquet(CORPUS)
            .limit(N_DOCS)
            .repartition(max(32, N_DOCS // 1000))
            .materialize())
    in_bytes = docs.size_bytes()
    store = int(ray.cluster_resources().get("object_store_memory", 0))
    est_shuffle = (in_bytes // 6) * 30
    n_buckets = int(min(32767, max(64, -(-est_shuffle // (64 << 20)))))
    n_waves = max(1, int(-(-7 * est_shuffle // (2 * store)))) if store else 1

    t0 = time.perf_counter()
    out = dup_ngram_spans(docs, k=K)
    n_rows = out.count()
    wall = time.perf_counter() - t0
    print(json.dumps({
        "probe": "dup_ngram_spans_auto", "docs": N_DOCS, "k": K,
        "rows": n_rows, "wall_sec": round(wall, 1),
        "docs_per_sec": round(N_DOCS / wall, 1),
        "in_bytes": in_bytes, "est_shuffle_bytes": est_shuffle,
        "object_store_bytes": store,
        "derived_n_buckets": n_buckets, "derived_n_waves": n_waves,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
