"""Table maintenance: small-file compaction for parquet directories.

A 100 TB streaming table accretes one file per micro-batch per partition;
scan cost then scales with FILE COUNT (open/footer/seek per file), not
bytes. Production fixes this with Iceberg's ``rewrite_data_files``
(the reference's sink commits to Iceberg, KafkaAvroToIceberg.scala:92-100);
this module is the same operation for the parquet stand-in the sandbox
sinks use: size-targeted rewrite, atomic directory swap, readers never
observe a half-compacted table.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid


def parquet_part_files(path: str) -> list[str]:
    """Data files of a parquet directory (excludes markers/hidden)."""
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]


def compact_parquet_dir(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> dict:
    """Rewrite ``path`` into ``ceil(total_bytes / target_file_bytes)``
    files if it currently holds more than that (and at least
    ``min_files``); otherwise no-op. Returns a stats dict either way.

    The rewrite lands in a sibling staging dir and replaces the original
    via two renames (original → trash, staged → original) so a crash
    leaves either the old or the new directory, never a mix. Not safe
    against a CONCURRENT writer to ``path`` — pause the stream or use a
    transactional table format for that.
    """
    files = parquet_part_files(path)
    total = sum(os.path.getsize(f) for f in files)
    want = max(1, math.ceil(total / target_file_bytes))
    stats = {
        "path": path,
        "files_before": len(files),
        "bytes_total": total,
        "target_files": want,
        "compacted": False,
    }
    if len(files) < min_files or len(files) <= want:
        return stats

    df = spark.read.parquet(path)
    staged = f"{path}.compacting-{uuid.uuid4().hex[:8]}"
    df.repartition(want).write.parquet(staged)

    trash = f"{path}.pre-compact-{uuid.uuid4().hex[:8]}"
    os.rename(path, trash)
    try:
        os.rename(staged, path)
    except OSError:  # roll back: the original table must survive
        os.rename(trash, path)
        shutil.rmtree(staged, ignore_errors=True)
        raise
    shutil.rmtree(trash)

    stats["compacted"] = True
    stats["files_after"] = len(parquet_part_files(path))
    return stats


def analyze_table_stats(
    spark, table: str, columns: list[str] | None = None
) -> dict:
    """Collect table (and optionally column) statistics into the catalog
    — ``ANALYZE TABLE … COMPUTE STATISTICS [FOR COLUMNS …]``.

    At 100 TB these statistics are what turn the cost-based optimizer
    on: accurate rowCount/sizeInBytes pick broadcast-vs-shuffle joins
    and join order; column NDV/min/max feed selectivity estimates. Run
    after compaction / large appends, the same cadence Iceberg users run
    ``ANALYZE`` or rely on manifest metrics. Returns the catalog's
    statistics line plus parsed row count when available.
    """
    stmt = f"ANALYZE TABLE {table} COMPUTE STATISTICS"
    spark.sql(stmt)
    if columns:
        spark.sql(f"{stmt} FOR COLUMNS {', '.join(columns)}")
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    stats_line = next(
        (r["data_type"] for r in rows if r["col_name"] == "Statistics"), ""
    )
    row_count = None
    for tok in stats_line.split(","):
        tok = tok.strip()
        if tok.endswith("rows"):
            row_count = int(tok.split()[0])
    return {"table": table, "statistics": stats_line, "row_count": row_count}
