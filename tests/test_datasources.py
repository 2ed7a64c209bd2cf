"""Edge-case tests for the custom Python DataSources (sources/):
the offset-log table reader and the replay connector's batch/stream
offset handling. The happy paths are oracle-gated registry queries
(checkpoint_offsetlog_table, streaming_replay_source_rollup,
batch_replay_source_slice); these pin the corners the oracle data
never hits."""

from __future__ import annotations

import os

import pytest

from .conftest import SF_SMOKE


def _register(spark):
    from kafka_stream_job_spark.sources.offsetlog import register_offsetlog_source
    from kafka_stream_job_spark.sources.replay import register_replay_source

    register_offsetlog_source(spark)
    register_replay_source(spark)


def test_offsetlog_corrupt_and_log_lines(spark, tmp_path):
    """A non-JSON offsets line must surface as source_kind='other' (not
    crash the scan); FileStreamSource-style logOffset lines map to
    kind='log'."""
    _register(spark)
    d = tmp_path / "offsets"
    d.mkdir()
    (d / "0").write_text('v1\n{"batchWatermarkMs": 7}\nnot-json-at-all\n')
    (d / "1").write_text('v1\n{"batchWatermarkMs": 9}\n{"logOffset": 4}\n')
    rows = {
        tuple(r)
        for r in spark.read.format("ksj_offsetlog")
        .option("path", str(tmp_path))
        .load()
        .collect()
    }
    assert rows == {
        (0, "other", None, None, None, 7),
        (1, "log", None, None, 4, 9),
    }


def test_offsetlog_requires_path(spark):
    _register(spark)
    from pyspark.errors import PySparkException

    with pytest.raises(Exception, match="path"):
        spark.read.format("ksj_offsetlog").load().collect()


def test_replay_batch_bounds_clamp_and_empty(spark):
    """start/end beyond the file clamp to the row count; start >= end is
    an empty frame, not an error."""
    _register(spark)
    path = os.path.join(SF_SMOKE, "events.parquet")
    full = (
        spark.read.format("ksj_replay").option("path", path).load().count()
    )
    beyond = (
        spark.read.format("ksj_replay")
        .option("path", path)
        .option("start_idx", 0)
        .option("end_idx", 10_000_000)
        .load()
        .count()
    )
    assert beyond == full
    empty = (
        spark.read.format("ksj_replay")
        .option("path", path)
        .option("start_idx", 500)
        .option("end_idx", 500)
        .load()
        .count()
    )
    assert empty == 0


def test_replay_batch_slices_partition_cleanly(spark):
    """Adjacent slices partition the offset space: no overlap, no gap,
    and the union equals the bounded range regardless of n_splits."""
    _register(spark)
    path = os.path.join(SF_SMOKE, "events.parquet")

    def ids(start, end, splits):
        return {
            r["event_id"]
            for r in spark.read.format("ksj_replay")
            .option("path", path)
            .option("start_idx", start)
            .option("end_idx", end)
            .option("n_splits", splits)
            .load()
            .collect()
        }

    whole = ids(100, 400, 1)
    assert len(whole) == 300
    assert ids(100, 400, 7) == whole
    assert ids(100, 250, 3) | ids(250, 400, 3) == whole
    assert ids(100, 250, 3) & ids(250, 400, 3) == set()


def test_replay_stream_resumes_from_committed_offset(spark, tmp_path):
    """Restarting the replay stream against the same checkpoint must not
    re-read ANY rows: the stateless full-frontier latestOffset can never
    regress below the committed offset. (The original in-memory
    rate-limit cursor DID regress — Spark re-planned and re-read
    committed rows, double-counting aggregates.)"""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    _register(spark)
    path = os.path.join(SF_SMOKE, "events.parquet")
    total = pq.ParquetFile(path).metadata.num_rows
    ckpt = str(tmp_path / "ckpt")

    def run(name):
        q = (
            spark.readStream.format("ksj_replay")
            .option("path", path)
            .load()
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .outputMode("complete")
            .start()
        )
        q.processAllAvailable()
        in_rows = sum(p["numInputRows"] for p in q.recentProgress)
        q.stop()
        rows = spark.table(name).collect()
        return in_rows, (rows[0]["n"] if rows else None)

    in_a, state_a = run("replay_resume_a")
    assert in_a == total and state_a == total
    # restart: the committed frontier equals the file end → zero input
    # rows, zero re-reads (and hence no batch to re-publish state).
    in_b, _ = run("replay_resume_b")
    assert in_b == 0


def test_replay_batch_pushdown_prunes_partitions_and_filters_arrow():
    """pushFilters must (a) consume event_id range + event_type IN
    filters, returning only the rest; (b) shrink the planned row range to
    the binary-searched slice; (c) filter Arrow batches to the allowed
    types so non-matching rows never leave the source."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        In,
        IsNotNull,
        LessThan,
    )

    from kafka_stream_job_spark.sources.replay import _ReplayBatchReader

    path = f"{SF_SMOKE}/events.parquet"
    reader = _ReplayBatchReader({"path": path, "n_splits": 4})
    remaining = list(
        reader.pushFilters(
            [
                GreaterThanOrEqual(("event_id",), 150),
                LessThan(("event_id",), 650),
                In(("event_type",), ("view", "purchase")),
                IsNotNull(("user_id",)),  # not ours — must come back
            ]
        )
    )
    assert [type(f).__name__ for f in remaining] == ["IsNotNull"]
    parts = reader.partitions()
    lo = min(p.start for p in parts)
    hi = max(p.end for p in parts)
    # event_id is the dense sorted 0..N-1 space in the generated data, so
    # the pruned row range equals the id range exactly.
    assert (lo, hi) == (150, 650)
    rows = [r for p in parts for b in reader.read(p) for r in b.to_pylist()]
    assert rows and all(r["event_type"] in ("view", "purchase") for r in rows)
    assert all(150 <= r["event_id"] < 650 for r in rows)
    # unpruned reader over the same range must agree row-for-row
    plain = _ReplayBatchReader({"path": path, "start_idx": 150, "end_idx": 650})
    expect = [
        r
        for p in plain.partitions()
        for b in plain.read(p)
        for r in b.to_pylist()
        if r["event_type"] in ("view", "purchase")
    ]
    key = lambda r: r["event_id"]  # noqa: E731
    assert sorted(rows, key=key) == sorted(expect, key=key)


def test_hivepart_pushdown_prunes_directories(spark):
    """The hive-layout reader must consume event_type EqualTo/In filters
    and plan ONLY files under matching event_type= dirs; everything else
    comes back unsupported. An impossible intersection plans the empty
    sentinel partition."""
    from pyspark.sql.datasource import EqualTo, In, IsNotNull

    from kafka_stream_job_spark.registry import all_specs

    all_specs()  # registration order: streaming.pipeline needs relational
    from kafka_stream_job_spark.operators.formats import partitioned_events_stage
    from kafka_stream_job_spark.sources.hivepart import _HivePartReader

    stage = os.path.join(partitioned_events_stage(spark, SF_SMOKE), "events_part")
    reader = _HivePartReader({"path": stage})
    remaining = reader.pushFilters(
        [
            In(("event_type",), ("view", "purchase")),
            IsNotNull(("user_id",)),  # not ours — must come back
        ]
    )
    assert [type(f).__name__ for f in remaining] == ["IsNotNull"]
    parts = reader.partitions()
    assert parts and {p.part_value for p in parts} == {"view", "purchase"}
    rows = [r for p in parts for b in reader.read(p) for r in b.to_pylist()]
    assert rows and all(r["event_type"] in ("view", "purchase") for r in rows)
    # unpruned listing covers strictly more directories
    all_parts = _HivePartReader({"path": stage}).partitions()
    assert {p.part_value for p in all_parts} > {p.part_value for p in parts}
    # every view/purchase row must survive pruning (no file lost)
    keep = [
        r
        for p in all_parts
        for b in _HivePartReader({"path": stage}).read(p)
        for r in b.to_pylist()
        if r["event_type"] in ("view", "purchase")
    ]
    key = lambda r: r["event_id"]  # noqa: E731
    assert sorted(rows, key=key) == sorted(keep, key=key)
    # contradictory filters → empty sentinel, read yields nothing
    r2 = _HivePartReader({"path": stage})
    r2.pushFilters([EqualTo(("event_type",), "view"), EqualTo(("event_type",), "purchase")])
    p2 = r2.partitions()
    assert len(p2) == 1 and not list(r2.read(p2[0]))


def test_audit_sink_commit_manifest_matches_source(spark, tmp_path):
    """The custom writer's commit-message accounting must equal the
    source exactly, and the manifest only exists after commit (atomic
    os.replace — no partial file is ever visible)."""
    import json

    from kafka_stream_job_spark.sources.auditsink import AuditDataSource
    from kafka_stream_job_spark.tables import load_table
    from pyspark.sql import functions as F

    from .conftest import SF_SMOKE

    try:
        spark.dataSource.register(AuditDataSource)
    except Exception:
        pass
    path = str(tmp_path / "audit.json")
    events = load_table(spark, SF_SMOKE, "events").select("event_id")
    events.write.format("ksj_audit").option("path", path).mode("append").save()
    audit = json.load(open(path))
    want = events.agg(
        F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s")
    ).collect()[0]
    assert audit["n_rows"] == want["n"]
    assert audit["id_sum"] == want["s"]
    assert audit["n_tasks"] >= 1


def test_custom_sink_write_from_worker_thread(spark, tmp_path):
    """py4j pinned-thread mode: a worker thread's JVM twin has no active
    SparkSession, and DataFrameWriter resolves Python DataSources through
    it — so a threaded write through ksj_audit needs
    ensure_thread_active_session first. Guards the helper AND documents
    the failure mode (without the pin the same write raises
    DATA_SOURCE_NOT_FOUND)."""
    from concurrent.futures import ThreadPoolExecutor

    from kafka_stream_job_spark.session import ensure_thread_active_session
    from kafka_stream_job_spark.sources.auditsink import AuditDataSource

    spark.dataSource.register(AuditDataSource)
    df = spark.range(7).selectExpr("id AS event_id")

    def write(pin):
        import json
        import uuid

        if pin:
            ensure_thread_active_session(spark)
        path = str(tmp_path / f"audit-{uuid.uuid4().hex}.json")
        df.write.format("ksj_audit").option("path", path).mode("append").save()
        return json.load(open(path))

    with ThreadPoolExecutor(max_workers=1) as pool:
        import pytest as _pytest

        with _pytest.raises(Exception, match="DATA_SOURCE_NOT_FOUND"):
            pool.submit(write, False).result()
        audit = pool.submit(write, True).result()
    assert (audit["n_rows"], audit["id_sum"]) == (7, 21)


def test_commitlog_reads_versions_and_watermarks(spark, tmp_path):
    """Commit files map to (batch_id, version tag, nextBatchWatermarkMs);
    a missing/corrupt metadata line degrades to watermark 0, not a crash."""
    from kafka_stream_job_spark.sources.commitlog import register_commitlog_source

    register_commitlog_source(spark)
    d = tmp_path / "commits"
    d.mkdir()
    (d / "0").write_text('v1\n{"nextBatchWatermarkMs": 123}\n')
    (d / "1").write_text("v1\n")
    (d / "2").write_text('v1\nnot-json\n')
    rows = {
        tuple(r)
        for r in spark.read.format("ksj_commitlog")
        .option("path", str(tmp_path))
        .load()
        .collect()
    }
    assert rows == {(0, "v1", 123), (1, "v1", 0), (2, "v1", 0)}


def test_commitlog_missing_dir_is_empty(spark, tmp_path):
    """A checkpoint with no commits dir yet (query never committed a
    batch) scans as an empty table — the planned-but-never-committed
    audit must not error on it."""
    from kafka_stream_job_spark.sources.commitlog import register_commitlog_source

    register_commitlog_source(spark)
    assert (
        spark.read.format("ksj_commitlog")
        .option("path", str(tmp_path))
        .load()
        .count()
        == 0
    )


def test_commitlog_requires_path(spark):
    from kafka_stream_job_spark.sources.commitlog import register_commitlog_source

    register_commitlog_source(spark)
    with pytest.raises(Exception, match="path"):
        spark.read.format("ksj_commitlog").load().collect()


def test_hivepart_partition_carries_base_uri(spark, tmp_path):
    """Planned partitions must carry the original (scheme-capable) option
    path so executor reads re-resolve the same filesystem the driver
    listed with — a bare fs-local path would break on s3://-style URIs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_stream_job_spark.sources.hivepart import _HivePartReader

    part_dir = tmp_path / "event_type=click"
    part_dir.mkdir()
    pq.write_table(
        pa.table({"event_id": [1], "user_id": [2], "value": [3.0]}),
        part_dir / "f0.parquet",
    )
    reader = _HivePartReader({"path": str(tmp_path)})
    parts = reader.partitions()
    assert parts and all(p.base_uri == str(tmp_path) for p in parts)
    batches = list(reader.read(parts[0]))
    assert sum(b.num_rows for b in batches) == 1


def test_hivepart_row_group_skipping(spark, tmp_path):
    """A selective range predicate must decode FEWER row groups, never
    change results: ranges are returned unsupported (Spark re-filters),
    statistics-dead groups are skipped executor-side, and groups without
    statistics are conservatively read."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.datasource import GreaterThan, LessThanOrEqual

    from kafka_stream_job_spark.sources.hivepart import (
        _HivePartReader,
        _row_groups_matching,
    )

    part_dir = tmp_path / "event_type=click"
    part_dir.mkdir()
    n = 100
    pq.write_table(
        pa.table(
            {
                "event_id": list(range(n)),  # sorted → tight per-group stats
                "user_id": [i % 7 for i in range(n)],
                "value": [float(i) for i in range(n)],
            }
        ),
        part_dir / "f0.parquet",
        row_group_size=10,
    )

    # range filters are recorded AND returned (Spark re-applies them)
    reader = _HivePartReader({"path": str(tmp_path)})
    remaining = reader.pushFilters([GreaterThan(("event_id",), 79)])
    assert [type(f).__name__ for f in remaining] == ["GreaterThan"]
    assert reader._ranges == [("event_id", ">", 79)]

    meta = pq.ParquetFile(part_dir / "f0.parquet").metadata
    assert meta.num_row_groups == 10
    # event_id > 79 → only groups [80..89] and [90..99] can match
    assert _row_groups_matching(meta, reader._ranges) == [8, 9]
    # conjunction: > 79 AND <= 84 → group 8 only
    assert _row_groups_matching(
        meta, [("event_id", ">", 79), ("event_id", "<=", 84)]
    ) == [8]
    # equality point lookup → one group; impossible value → none
    assert _row_groups_matching(meta, [("event_id", "=", 55)]) == [5]
    assert _row_groups_matching(meta, [("event_id", "=", 1000)]) == []
    # unknown column / missing stats keep everything (conservative)
    assert _row_groups_matching(meta, [("nope", ">", 0)]) == list(range(10))

    # read() decodes only the surviving groups (20 of 100 rows)...
    parts = reader.partitions()
    rows = [r for p in parts for b in reader.read(p) for r in b.to_pylist()]
    assert len(rows) == 20 and {r["event_id"] for r in rows} == set(range(80, 100))

    # ...and the end-to-end Spark result is exact after re-filtering
    from kafka_stream_job_spark.sources.hivepart import register_hivepart_source

    register_hivepart_source(spark)
    got = (
        spark.read.format("ksj_hive_events")
        .option("path", str(tmp_path))
        .load()
        .filter("event_id > 79 AND event_id <= 84")
        .select("event_id")
    )
    assert sorted(r.event_id for r in got.collect()) == [80, 81, 82, 83, 84]

    # all-dead predicate: read() yields nothing, Spark returns empty
    r2 = _HivePartReader({"path": str(tmp_path)})
    r2.pushFilters([GreaterThan(("event_id",), 10_000)])
    assert [r for p in r2.partitions() for b in r2.read(p)] == []


def test_parquet_meta_matches_duckdb_metadata(spark):
    """The footer table must agree with DuckDB's parquet_metadata() on
    every (row group, column) chunk of two real testdata files — rows,
    value counts, compressed/uncompressed bytes."""
    import duckdb

    from kafka_stream_job_spark.sources.parquetmeta import (
        register_parquetmeta_source,
    )

    register_parquetmeta_source(spark)
    files = [f"{SF_SMOKE}/events.parquet", f"{SF_SMOKE}/documents.parquet"]
    got = {
        (r.table_name, r.row_group_id, r.column_name): (
            r.rg_rows,
            r.num_values,
            r.compressed_bytes,
            r.uncompressed_bytes,
        )
        for r in spark.read.format("ksj_parquet_meta")
        .option("paths", ",".join(files))
        .load()
        .collect()
    }
    con = duckdb.connect()
    want = {}
    for f in files:
        stem = os.path.splitext(os.path.basename(f))[0]
        for rg, rows, col, nv, comp, uncomp in con.sql(
            f"""SELECT row_group_id, row_group_num_rows, path_in_schema,
                       num_values, total_compressed_size, total_uncompressed_size
                FROM parquet_metadata('{f}')"""
        ).fetchall():
            want[(stem, rg, col)] = (rows, nv, comp, uncomp)
    assert got == want and got, f"footer drift: {len(got)} vs {len(want)} chunks"


def test_parquet_meta_requires_paths(spark):
    from kafka_stream_job_spark.sources.parquetmeta import (
        register_parquetmeta_source,
    )

    register_parquetmeta_source(spark)
    with pytest.raises(Exception, match="paths"):
        spark.read.format("ksj_parquet_meta").load().collect()


def test_audit_abort_sweeps_only_dead_same_pid_tmps(tmp_path):
    """abort() must delete ONLY this pid's dead-thread tmps: a pid whose
    decimal digits extend ours (tmp-<pid>1-...) and a live thread's tmp
    must both survive the sweep."""
    import os
    import threading

    from kafka_stream_job_spark.sources.auditsink import _AuditWriter

    dest = str(tmp_path / "audit.json")
    pid = os.getpid()
    live_tid = threading.get_ident()
    dead = tmp_path / f"audit.json.tmp-{pid}-999999999"
    other_pid = tmp_path / f"audit.json.tmp-{pid}1-123"
    live = tmp_path / f"audit.json.tmp-{pid}-{live_tid}"
    for p in (dead, other_pid, live):
        p.write_text("partial")

    _AuditWriter(dest).abort([])
    assert not dead.exists(), "stranded dead-thread tmp must be swept"
    assert other_pid.exists(), "another pid's tmp must never be touched"
    assert live.exists(), "a live thread's staged tmp must survive"


def test_parquet_meta_paths_tolerate_whitespace(spark):
    """A natural 'a.parquet, b.parquet' option (space after comma) must
    resolve both files."""
    from kafka_stream_job_spark.sources.parquetmeta import (
        register_parquetmeta_source,
    )

    register_parquetmeta_source(spark)
    df = (
        spark.read.format("ksj_parquet_meta")
        .option(
            "paths",
            f"{SF_SMOKE}/events.parquet , {SF_SMOKE}/documents.parquet",
        )
        .load()
    )
    assert {r.table_name for r in df.select("table_name").distinct().collect()} == {
        "events",
        "documents",
    }
