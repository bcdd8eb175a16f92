"""Row-group-parallel parquet reading for single-file inputs.

Ray Data's ``read_parquet`` maps one read task per FILE: a single big
parquet file is decoded by one worker and only split into blocks after
the fact (visible in stats as ``ReadParquet->SplitBlocks(k): 1 tasks``),
which serializes the whole scan no matter how many CPUs are free. The
synthetic corpus is exactly that shape — one ``pages.parquet`` per
corpus — so its readers use this helper: a Dataset of row-group indices
mapped through a read task per group. Because the reads happen inside
``map_batches`` the streaming executor schedules and backpressures them
like any other stage (no eager whole-file fan-out), and the row-group
size set by the corpus writer (2048 rows) bounds each task's memory.

At the 100 TB design point inputs arrive as many files and plain
``read_parquet`` parallelizes across them; this helper is the
single-file escape hatch, not the default scan path.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def read_parquet_rowgroups(path: str, columns: list[str] | None = None):
    """``ray.data`` Dataset over one parquet file, one read task per row
    group (falls back to ``read_parquet`` when the file has ≤1 group)."""
    import ray.data

    n = pq.read_metadata(path).num_row_groups
    if n <= 1:
        return ray.data.read_parquet(path, columns=columns)

    def _read(batch: pa.Table) -> pa.Table:
        rgs = batch["rg"].to_pylist()
        return pq.ParquetFile(path).read_row_groups(rgs, columns=columns)

    idx = ray.data.from_items([{"rg": i} for i in range(n)],
                              override_num_blocks=n)
    return idx.map_batches(_read, batch_format="pyarrow", batch_size=None)
