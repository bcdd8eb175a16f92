"""End-to-end training-data preparation pipeline — the capstone that
composes the individual operators into the pipeline a user actually runs
over a raw document dump:

    read -> length filter -> exact dedup -> n-gram decontamination
         -> deterministic split assignment -> partitioned parquet shards
         -> manifest

One streaming pass end to end (the only all-to-all is the dedup shuffle,
keyed by content hash); the manifest is computed AFTER the write by
reading back only parquet metadata + the pruned ``n_tokens`` column, so
nothing is materialized mid-pipeline. Output layout::

    out_dir/data/split=train/*.parquet   (one dir per split — resumable,
    out_dir/data/split=val/*.parquet      never one giant file)
    out_dir/data/split=test/*.parquet
    out_dir/manifest.json
    out_dir/_DONE

A rerun with ``resume=True`` returns the existing manifest without
touching the data when ``_DONE`` exists (coarse-grained job-level resume;
the crawl pipeline demonstrates fine-grained wave-level resume).
"""
from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa

from .textops import LOWER_WORD_RE, _word_ngrams, add_text_hash


def dedup_exact_rows(docs_ds, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Exact dedup that KEEPS the surviving rows (vs ``dedup_exact``,
    which returns ids only): shuffle full rows by content hash, keep the
    min-id row per group. The text crosses the wire exactly once — the
    unavoidable cost when the surviving text feeds the next stage. (When
    only ids are needed downstream, prefer ``dedup_exact``: its shuffle
    moves (hash, id) pairs only.)"""

    def keep_min(g) -> pa.Table:
        g = g.sort_values(id_col).head(1).drop(columns=["text_hash"])
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    return (docs_ds.map_batches(add_text_hash, batch_format="pyarrow",
                                fn_kwargs={"col": text_col})
            .groupby("text_hash")
            .map_groups(keep_min, batch_format="pandas"))


def read_documents(path: str):
    """Read a documents table in any supported format — parquet (default),
    JSONL, or CSV, chosen by extension. Each reader is the streaming Ray
    Data source (no driver-side load); parquet additionally benefits from
    column pruning downstream."""
    import ray.data
    low = path.lower()
    if low.endswith((".jsonl", ".json")):
        return ray.data.read_json(path)
    if low.endswith(".csv"):
        return ray.data.read_csv(path)
    return ray.data.read_parquet(path)


def _split_of(ids: list, val_permille: int, test_permille: int) -> list:
    out = []
    for i in ids:
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000
        out.append("val" if b < val_permille
                   else "test" if b < val_permille + test_permille
                   else "train")
    return out


def prepare_training_data(docs_path: str, out_dir: str, *,
                          min_tokens: int = 5,
                          probes: tuple[str, ...] = (),
                          ngram_n: int = 3,
                          val_permille: int = 50,
                          test_permille: int = 50,
                          output_format: str = "parquet",
                          resume: bool = False) -> dict:
    """Run the full preparation pipeline over a documents parquet file
    (schema: doc_id, text, lang, source, n_chars) and write partitioned
    training shards + a manifest. Returns the manifest dict.

    ``output_format``: 'parquet' (default) or 'jsonl' — the common LLM
    trainer ingestion format. JSONL shards are converted split-by-split
    from the parquet staging dir with one extra streaming read (the
    dedup shuffle never re-executes)."""
    import ray.data

    done = os.path.join(out_dir, "_DONE")
    manifest_path = os.path.join(out_dir, "manifest.json")
    if resume and os.path.exists(done) and os.path.exists(manifest_path):
        import shutil
        for stale in ("data.tmp", "data.old"):   # inert leftovers from a
            shutil.rmtree(os.path.join(out_dir, stale),  # killed rerun
                          ignore_errors=True)
        with open(manifest_path) as f:
            return json.load(f)

    probe_grams = set()
    for p in probes:
        probe_grams.update(_word_ngrams(p, ngram_n))
    import ray
    has_probes = bool(probe_grams)  # closure captures the bool + ref only,
    pg_ref = ray.put(probe_grams)   # never the set itself

    def filter_and_tag(batch: pa.Table) -> pa.Table:
        """Length filter + decontamination + n_tokens/split columns in
        one vectorized pass (pure map — no shuffle)."""
        pg = ray.get(pg_ref) if has_probes else set()
        toks = [LOWER_WORD_RE.findall(t.lower())
                for t in batch["text"].to_pylist()]
        n = np.fromiter((len(t) for t in toks), np.int64, len(toks))
        clean = np.ones(len(toks), dtype=bool)
        if pg:
            for i, tl in enumerate(toks):
                grams = (" ".join(tl[j:j + ngram_n])
                         for j in range(len(tl) - ngram_n + 1))
                clean[i] = not any(g in pg for g in grams)
        keep = (n >= min_tokens) & clean
        batch = batch.append_column("n_tokens", pa.array(n)) \
            .filter(pa.array(keep))
        return batch.append_column(
            "split", pa.array(_split_of(batch["doc_id"].to_pylist(),
                                        val_permille, test_permille),
                              pa.string()))

    ds = (read_documents(docs_path)
          .map_batches(filter_and_tag, batch_format="pyarrow"))
    ds = dedup_exact_rows(ds)

    import glob
    import shutil

    # write to a temp dir and swap in only on success: a crash mid-write
    # (or an empty result) must never destroy the previous run's shards
    data_dir = os.path.join(out_dir, "data")
    tmp_dir = os.path.join(out_dir, "data.tmp")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    pq_dir = (tmp_dir if output_format == "parquet"
              else os.path.join(tmp_dir, "_pq"))
    ds.write_parquet(pq_dir, partition_cols=["split"])

    # manifest from the WRITTEN shards: row counts come from parquet
    # metadata, token totals from a pruned single-column read — no
    # mid-pipeline materialization of the corpus. An all-filtered corpus
    # writes no files; that's a valid empty result, not a crash.
    if glob.glob(os.path.join(pq_dir, "**", "*.parquet"), recursive=True):
        from ray.data.aggregate import Count, Sum
        stats = (ray.data.read_parquet(pq_dir,
                                       columns=["split", "n_tokens"])
                 .groupby("split")
                 .aggregate(Count(alias_name="n_docs"),
                            Sum("n_tokens", alias_name="n_tokens"))
                 .to_pandas())
    else:
        import pandas as pd
        stats = pd.DataFrame(columns=["split", "n_docs", "n_tokens"])

    if output_format == "jsonl":
        # convert split-by-split: streaming read of the staged parquet,
        # one JSONL dir per split (newline-delimited JSON, one doc/line)
        for sd in sorted(glob.glob(os.path.join(pq_dir, "split=*"))):
            sname = os.path.basename(sd).split("=", 1)[1]
            jdir = os.path.join(tmp_dir, os.path.basename(sd))
            os.makedirs(jdir, exist_ok=True)

            def _with_split(b: pa.Table, s=sname) -> pa.Table:
                if "split" in b.column_names:   # hive col may or may not
                    return b                    # be inferred from the path
                return b.append_column(
                    "split", pa.array([s] * b.num_rows, pa.string()))

            (ray.data.read_parquet(sd)
             .map_batches(_with_split, batch_format="pyarrow")
             .write_json(jdir))
        shutil.rmtree(pq_dir)

    # crash-ordered swap: invalidate _DONE first, park the old dir under
    # data.old, rename tmp into place, then drop the parked copy. A kill
    # at ANY point leaves either a complete data/ or a complete data.old/
    # on disk and no _DONE marker — a rerun rebuilds correctly; a
    # completed prior run is never half-deleted.
    if os.path.exists(done):
        os.remove(done)
    old_dir = data_dir + ".old"
    if os.path.exists(data_dir):
        # drop a stale parked copy ONLY when a newer data/ exists —
        # otherwise data.old may be the sole surviving complete output
        # from a run killed mid-swap, and deleting it here would break
        # the "a complete copy always exists" invariant
        shutil.rmtree(old_dir, ignore_errors=True)
        os.rename(data_dir, old_dir)
    os.rename(tmp_dir, data_dir)
    shutil.rmtree(old_dir, ignore_errors=True)
    manifest = {
        "docs_path": docs_path,
        "min_tokens": min_tokens,
        "n_probes": len(probes),
        "splits": {r["split"]: {"n_docs": int(r["n_docs"]),
                                "n_tokens": int(r["n_tokens"])}
                   for _, r in stats.iterrows()},
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)
    with open(done, "w") as f:
        f.write("ok\n")
    return manifest
