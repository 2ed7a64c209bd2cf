"""Parquet row-group/column-chunk METADATA as a Spark TABLE — a custom
Python DataSource for storage-layout auditing.

Every physical-layout decision at 100 TB — compaction targets
(maintenance.compact_parquet_dir, compaction_bin_packing_plan), sort
keys (zorder_layout_stats), row-group sizing vs
``spark.sql.files.maxPartitionBytes`` — is a question about row-group
and column-chunk footprints. Spark exposes none of that through SQL;
this source lifts the parquet footers into a queryable table:

    spark.read.format("ksj_parquet_meta")
         .option("paths", f"{d}/events.parquet,{d}/lineitem.parquet")
         .load()

Schema (one row per row-group × column chunk):
    table_name         string — file stem (events, lineitem, …)
    row_group_id       long
    rg_rows            long   — rows in the row group
    column_name        string — path_in_schema
    num_values         long
    compressed_bytes   long
    uncompressed_bytes long
    compression        string — codec name (SNAPPY, ZSTD, …)

Scale/parallelism: one InputPartition per FILE; each executor task reads
only that file's FOOTER (pyarrow ``ParquetFile.metadata`` — no data
pages touched), so auditing a million-file table costs a metadata read
per file, embarrassingly parallel. Equivalence with DuckDB's
``parquet_metadata()`` table function is pinned by
tests/test_datasources.py.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA = (
    "table_name string, row_group_id long, rg_rows long, column_name string, "
    "num_values long, compressed_bytes long, uncompressed_bytes long, "
    "compression string"
)


class _MetaFile(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _ParquetMetaReader(DataSourceReader):
    def __init__(self, options):
        paths = options.get("paths") or options.get("path")
        if not paths:
            raise ValueError(
                "ksj_parquet_meta requires .option('paths', 'a.parquet,b.parquet')"
            )
        self._paths = [p.strip() for p in paths.split(",") if p.strip()]

    def partitions(self):
        return [_MetaFile(p) for p in self._paths]

    def read(self, partition: _MetaFile):
        import pyarrow.parquet as pq

        # scheme-aware open (same discipline as hivepart.read): an
        # s3://-hdfs:// path must resolve through the pyarrow filesystem,
        # not be handed to the OS as a local path
        from kafka_stream_job_spark.checkpoint import _filesystem

        table = os.path.splitext(os.path.basename(partition.path))[0]
        filesystem, fs_path = _filesystem(partition.path)
        with filesystem.open_input_file(fs_path) as src:
            md = pq.ParquetFile(src).metadata
        for rg_id in range(md.num_row_groups):
            rg = md.row_group(rg_id)
            for j in range(rg.num_columns):
                cc = rg.column(j)
                yield (
                    table,
                    rg_id,
                    rg.num_rows,
                    cc.path_in_schema,
                    cc.num_values,
                    cc.total_compressed_size,
                    cc.total_uncompressed_size,
                    str(cc.compression),
                )


class ParquetMetaDataSource(DataSource):
    """``format("ksj_parquet_meta")`` — parquet footers as a table."""

    @classmethod
    def name(cls) -> str:
        return "ksj_parquet_meta"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _ParquetMetaReader(self.options)


def register_parquetmeta_source(spark) -> None:
    """Idempotently register the data source with a session."""
    spark.dataSource.register(ParquetMetaDataSource)
