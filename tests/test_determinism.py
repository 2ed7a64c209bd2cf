"""Repeat-run determinism: the queries most exposed to nondeterminism
hazards (RangePartitioner boundary sampling, hash-derived sampling,
LSH candidate generation, localCheckpoint-pinned stages) must produce
the IDENTICAL row set when executed twice in one session — the property
the driver's value hash depends on, promoted to a direct CI check.
(The RangePartitioner seed hazard this guards against was a real
sf0.1 correctness bug in round 3 — see _distributed.py's pinning note.)
"""

from __future__ import annotations

import pytest

from kafka_stream_job_spark.registry import all_specs

from .conftest import SF_SMOKE

REPEAT_QUERIES = (
    "histogram_price_deciles",      # distributed rank over range exchange
    "corpus_epoch_shuffle_manifest",  # seeded permutation on global rank
    "weighted_sample_docs",         # hash-derived sampling keys
    "dedup_minhash_lsh",            # banded self-join over pinned sigs
    "corpus_difficulty_curriculum",  # rank + ntile over derived scores
    "customer_spend_gini",          # prefix arithmetic over ranks
    "surrogate_key_assignment",     # dense key contract
)


@pytest.mark.parametrize("name", REPEAT_QUERIES)
def test_repeat_run_identical(spark, name):
    fn = all_specs()[name].fn
    first = {tuple(r) for r in fn(spark, SF_SMOKE).collect()}
    second = {tuple(r) for r in fn(spark, SF_SMOKE).collect()}
    assert first == second, f"{name} changed between runs"
    assert first, f"{name} returned no rows"
