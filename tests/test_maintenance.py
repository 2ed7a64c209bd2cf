"""Small-file compaction: many-file parquet dirs rewrite to the size
target with identical data; under-threshold dirs are left untouched."""

from __future__ import annotations

import os

from kafka_stream_job_spark.maintenance import (
    compact_parquet_dir,
    parquet_part_files,
)
from kafka_stream_job_spark.tables import load_table

from .conftest import SF_SMOKE


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "many_small")
    events.repartition(40).write.parquet(out)
    before_files = parquet_part_files(out)
    assert len(before_files) == 40
    want = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    total = sum(os.path.getsize(f) for f in before_files)

    stats = compact_parquet_dir(spark, out, target_file_bytes=total // 2 + 1)
    assert stats["compacted"] is True
    assert stats["files_after"] <= 2 < stats["files_before"]
    # no staging/trash residue — the swap completed
    assert not [d for d in os.listdir(tmp_path) if "compact" in d]

    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got == want


def test_compaction_noop_below_threshold(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "already_fine")
    events.coalesce(2).write.parquet(out)
    files_before = sorted(parquet_part_files(out))
    stats = compact_parquet_dir(spark, out, target_file_bytes=1)  # 2 < min_files
    assert stats["compacted"] is False
    assert sorted(parquet_part_files(out)) == files_before


def test_analyze_table_stats_feed_the_optimizer(spark):
    """ANALYZE writes rowCount into the catalog and the optimizer's
    plan-stats consume it — the CBO precondition at scale."""
    from kafka_stream_job_spark.maintenance import analyze_table_stats
    from kafka_stream_job_spark.tables import load_table

    from .conftest import SF_SMOKE

    spark.sql("DROP TABLE IF EXISTS ksj_stats_t")
    load_table(spark, SF_SMOKE, "customer").write.saveAsTable("ksj_stats_t")
    try:
        n = spark.table("ksj_stats_t").count()
        out = analyze_table_stats(spark, "ksj_stats_t", columns=["c_custkey"])
        assert out["row_count"] == n
        assert "bytes" in out["statistics"]
        # with CBO on, the optimizer's plan statistics carry the exact count
        prev = spark.conf.get("spark.sql.cbo.enabled")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            stats = (
                spark.table("ksj_stats_t")
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
            )
            assert stats.rowCount().get() == n
        finally:
            spark.conf.set("spark.sql.cbo.enabled", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS ksj_stats_t")
