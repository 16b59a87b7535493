"""Table maintenance: small-file compaction. Streaming sinks, rolling
writes, and per-partition appends all accrete files far below the
size a scan wants (every file costs a task, a footer fetch, and an
open; a 100 TB table fragmented into 1 MB files is 100 M scheduler
entries). Compaction rewrites a directory to ~target-sized files.

Shape: coalesce(), NOT repartition() — coalesce merges existing
partitions without a shuffle, so compaction is a pure read+write at
IO speed (the rows are already arbitrarily ordered within the dir;
if a sorted layout is wanted, compose with layout.zorder_repartition
instead, which pays its one clustering exchange deliberately).

The rewrite is near-atomic: new files land in a sibling temp dir and
the swap is two directory renames, so the data is complete on disk at
every instant — but POSIX has no atomic directory exchange, so there
IS a sub-millisecond window where ``path`` itself does not exist (a
racing lister retries; a crash inside the window leaves the complete
table under the ``.old_*`` sibling, recoverable with one rename). On
an object store or a table format, replace the swap with the store's
atomic commit.

Reference parity: none (SURVEY §2.11 extension surface).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class CompactionResult:
    files_before: int
    files_after: int
    bytes_total: int
    rows: int


def _data_files(path: str, suffix: str) -> list[str]:
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(suffix) and not f.startswith((".", "_"))
    ]


def compact_files(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    fmt: str = "parquet",
    compression: str | None = None,
    csv_header: bool = True,
) -> CompactionResult:
    """Rewrite the ``fmt`` files under directory ``path`` into
    ceil(total_bytes / target_mb) files of the same format. Returns
    before/after stats; no-op (files_after == files_before) when the
    directory already meets the target. For CSV, ``csv_header`` must
    match how the files were written — reading headered parts without
    it would turn every part's header line into a data row."""
    suffix = {"parquet": ".parquet", "orc": ".orc", "csv": ".csv"}.get(
        fmt, f".{fmt}"
    )

    def _read(p: str):
        r = spark.read
        if fmt == "csv":
            r = r.option("header", str(csv_header).lower())
        return getattr(r, fmt)(p)

    files = _data_files(path, suffix)
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    if len(files) <= n_out:
        df = _read(path)
        return CompactionResult(len(files), len(files), total, df.count())

    df = _read(path)
    tmp = f"{path.rstrip('/')}.compact_{uuid.uuid4().hex[:8]}"
    writer = df.coalesce(n_out).write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    if fmt == "csv":
        writer = writer.option("header", str(csv_header).lower())
    getattr(writer, fmt)(tmp)

    old = f"{path.rstrip('/')}.old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)

    out_files = _data_files(path, suffix)
    out_df = _read(path)
    return CompactionResult(len(files), len(out_files), total, out_df.count())
