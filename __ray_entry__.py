"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship crawl pipeline at sf0.001 — generates the synthetic
  web corpus (deterministic, cached under /tmp), runs the distributed
  frontier-expansion crawl, returns the extracted-pages projection.
- ``queries()``: one callable per implemented operator (SURVEY.md §2 plus
  the training-data operators); each takes ``sf_dir``.
- ``oracle_sql()``: matching DuckDB SQL. Crawl/extraction queries read the
  corpus sidecar oracles (generator truth / sequential-reference replay)
  via read_parquet paths; training-data queries run on the pre-registered
  views. Queries without an entry here (minhash/simhash near-dups, the
  approximate ANN/LSH variants, wave metrics) are verified by pytest
  against planted fixtures / recall bounds instead.
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

from seo_crawler_ray.pipelines import queries as _q

# operators whose verification lives in tests/ (not SQL-expressible or
# inherently nondeterministic wall-clock surfaces)
_NO_ORACLE = {"minhash_near_dups", "minhash_index_query",
              "simhash_near_dups",
              "crawl_wave_metrics", "ann_topk_ivf", "ann_topk_lsh",
              "embedding_dup_pairs_lsh", "kmeans_clusters",
              "semantic_dedup", "quality_classifier",
              "distinct_users_daily_hll", "bpe_merges",
              "bpe_token_counts"}


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return _q.q_crawl_pages("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    sql = _q.oracle_sql()
    return {k: v for k, v in sql.items() if k not in _NO_ORACLE}
