"""Control experiment for BASELINE.md's scaling analysis: the per-page
extractor alone under plain ``multiprocessing`` fork workers — zero Ray,
no object store, no scheduler — on the same corpus pages. Its N -> 4N
efficiency is the pure-compute ceiling of THIS box (DRAM bandwidth for
allocation-heavy HTML parsing); the crawl engine's measured efficiency is
judged against this ceiling, not against 1.0.

Usage: python scripts/mp_scaling_control.py [sf_dir] (default sf0.1).
Prints one JSON line with per-level wall times and pair efficiencies.
"""
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_PAGES = None  # set in worker via fork COW


def _worker(idx_range):
    from seo_crawler_ray.functions.extract import extract_page
    from seo_crawler_ray.functions.urls import is_internal
    lo, hi = idx_range
    urls, htmls, stats, cts, base = _PAGES
    n = 0
    for i in range(lo, hi):
        if "text/html" not in cts[i]:
            continue
        extract_page(htmls[i], urls[i], 0, base, stats[i], cts[i],
                     is_internal(urls[i], base))
        n += 1
    return n


def run_level(n_proc: int, n_pages: int) -> float:
    step = (n_pages + n_proc - 1) // n_proc
    ranges = [(i, min(i + step, n_pages)) for i in range(0, n_pages, step)]
    t0 = time.perf_counter()
    # _PAGES reaches workers via fork copy-on-write; make the dependency on
    # fork semantics explicit so a spawn/forkserver default can't hand
    # workers _PAGES=None
    with mp.get_context("fork").Pool(n_proc) as pool:
        done = sum(pool.map(_worker, ranges))
    dt = time.perf_counter() - t0
    assert done > 0
    return dt


def main():
    global _PAGES
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from seo_crawler_ray.sources.cache import corpus_dir
    from seo_crawler_ray.pipelines.crawl import load_corpus_table
    cdir = corpus_dir(sf_dir)
    tbl = load_corpus_table(cdir)
    base = json.load(open(os.path.join(cdir, "corpus_meta.json")))["base_domain"]
    _PAGES = (tbl["url"].to_pylist(), tbl["html"].to_pylist(),
              tbl["status_code"].to_pylist(),
              tbl["content_type_header"].to_pylist(), base)
    n = len(_PAGES[0])
    levels = [2, 4, 8, 16, 32]
    best = {}
    for lv in levels:
        best[lv] = min(run_level(lv, n) for _ in range(3))
    pairs = []
    for lo, hi in ((2, 8), (4, 16), (8, 32)):
        eff = (best[lo] / best[hi]) / (hi / lo)
        pairs.append({"cpus_lo": lo, "cpus_hi": hi,
                      "sec_lo": round(best[lo], 2),
                      "sec_hi": round(best[hi], 2),
                      "efficiency": round(eff, 3)})
    print(json.dumps({"metric": "mp-extract pure-compute scaling control",
                      "n_pages": n, "pairs": pairs}))


if __name__ == "__main__":
    main()
