"""Chunking invariants — properties the chunk manifests must satisfy
regardless of content (the oracle check proves engine equivalence; these
prove the SEMANTICS are right)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from kafka_stream_job_spark.registry import all_specs
from kafka_stream_job_spark.tables import load_table

from .conftest import SF_SMOKE

SPECS = all_specs()


def _token_counts(spark):
    toks = F.split(
        F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))), " "
    )
    return {
        r["doc_id"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", F.size(toks).alias("n"))
        .collect()
    }


def test_cdc_chunks_tile_every_document(spark):
    """Content-defined chunks are an exact partition of each token range:
    contiguous, non-overlapping, first starts at 1, lengths sum to the
    doc's token count."""
    rows = SPECS["content_defined_chunks"].fn(spark, SF_SMOKE).collect()
    n_toks = _token_counts(spark)
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append((r["chunk_idx"], r["start_tok"], r["n_tok"]))
    assert set(by_doc) == set(n_toks)
    for doc_id, chunks in by_doc.items():
        chunks.sort()
        assert chunks[0][1] == 1
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        for (_, s0, l0), (_, s1, _) in zip(chunks, chunks[1:]):
            assert s1 == s0 + l0, f"doc {doc_id}: gap/overlap at {s1}"
        assert sum(c[2] for c in chunks) == n_toks[doc_id]
        assert all(c[2] >= 1 for c in chunks)


def test_sliding_chunks_cover_with_fixed_stride(spark):
    """Sliding chunks start every CHUNK_STRIDE tokens, all but the last
    are full-width, and the last chunk reaches the end of the doc."""
    from kafka_stream_job_spark.operators.pipeline import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )

    rows = SPECS["doc_sliding_chunks"].fn(spark, SF_SMOKE).collect()
    n_toks = _token_counts(spark)
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append((r["chunk_idx"], r["start_tok"], r["n_tok"]))
    assert set(by_doc) == set(n_toks)
    for doc_id, chunks in by_doc.items():
        chunks.sort()
        for k, start, n_tok in chunks:
            assert start == k * CHUNK_STRIDE
            assert n_tok == min(CHUNK_TOKENS, n_toks[doc_id] - start)
        last_k, last_start, last_n = chunks[-1]
        assert last_start + last_n == n_toks[doc_id]  # coverage reaches the end


def test_cdc_survives_edits_where_fixed_stride_does_not(spark, tmp_path):
    """THE content-defined-chunking property: prepend one token to every
    document and most CDC chunk fingerprints survive (boundaries are
    content-determined, so only each doc's first chunk changes), while
    fixed-stride chunks shift wholesale and almost none survive. This is
    why chunk-level dedup at 100 TB wants CDC manifests."""
    import shutil

    mod_dir = tmp_path / "sf_mod"
    mod_dir.mkdir()
    (
        load_table(spark, SF_SMOKE, "documents")
        .withColumn("text", F.concat(F.lit("zzz "), F.col("text")))
        .write.mode("overwrite")
        .parquet(str(mod_dir / "documents.parquet"))
    )

    def fps(name, sf_dir):
        return {
            (r["doc_id"], r["chunk_fp"])
            for r in SPECS[name].fn(spark, sf_dir).collect()
        }

    cdc_orig = fps("content_defined_chunks", SF_SMOKE)
    cdc_mod = fps("content_defined_chunks", str(mod_dir))
    cdc_overlap = len(cdc_orig & cdc_mod) / len(cdc_orig)

    sl_orig = fps("doc_sliding_chunks", SF_SMOKE)
    sl_mod = fps("doc_sliding_chunks", str(mod_dir))
    sl_overlap = len(sl_orig & sl_mod) / len(sl_orig)

    assert cdc_overlap > 0.5, f"CDC chunks should survive a prefix edit ({cdc_overlap:.2f})"
    assert sl_overlap < 0.2, f"fixed-stride should shift wholesale ({sl_overlap:.2f})"
    assert cdc_overlap > sl_overlap + 0.4
