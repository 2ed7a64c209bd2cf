"""Sketch-based operators — Misra-Gries heavy hitters over document tokens.

The reference has no sketch operators; this extends the north-star
LLM-pipeline surface (SURVEY.md §2.7) with the classic frequent-items
pipeline a training-data build needs (stopword discovery, domain
heavy-hitter capping).

Scale design (100 TB): the naive exact approach (`GROUP BY token`) shuffles
every distinct token; at web scale the vocabulary is billions of keys. The
Misra-Gries pass here bounds what crosses the network to MG_CAPACITY
candidate tokens PER PARTITION — constant, independent of data size — and
only those candidates get an exact second-pass count (filter + partial agg,
so the verify shuffle also carries just candidate keys). The two-pass
shape (sketch-prune, then exact-verify over the pruned set) mirrors the
LSH→Jaccard pattern in operators/dedup.py: the sketch decides WHAT to
count, never the reported numbers, so the output is deterministic and
exactly oracle-checkable even though MG eviction order is not.

Guarantee: a merged Misra-Gries summary with k counters undercounts any
token by at most N/(k+1) total occurrences (mergeable-summaries bound), so
every token with true count > N/k is guaranteed to survive in at least one
partition summary. With MG_CAPACITY == HH_FRACTION the candidate set is a
superset of the true heavy hitters; the exact pass then drops false
positives.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_job_spark.registry import register
from kafka_stream_job_spark.tables import load_table

# Heavy hitter: token with count > N / HH_FRACTION. The MG summary needs
# capacity >= HH_FRACTION for the superset guarantee (see module docstring).
HH_FRACTION = 100
MG_CAPACITY = 100


def mg_merge(counters: dict[str, int], batch: dict[str, int], capacity: int) -> dict[str, int]:
    """Merge a batch of exact counts into a Misra-Gries summary, keeping at
    most ``capacity`` counters (Agarwal et al., mergeable summaries: add,
    then subtract the (n-k)-th smallest count and drop non-positives)."""
    for key, cnt in batch.items():
        counters[key] = counters.get(key, 0) + int(cnt)
    if len(counters) > capacity:
        ordered = sorted(counters.values())
        cut = ordered[len(counters) - capacity - 1]
        counters = {k: c - cut for k, c in counters.items() if c > cut}
    return counters


def _mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition Misra-Gries over the ``token`` column; emits the
    surviving candidate tokens (counts are NOT emitted — they are sketch
    estimates; the exact pass recounts)."""
    counters: dict[str, int] = {}
    for pdf in batches:
        batch = pdf["token"].value_counts().to_dict()
        counters = mg_merge(counters, batch, MG_CAPACITY)
    yield pd.DataFrame({"token": list(counters.keys())})


@register(
    "heavy_hitter_tokens",
    oracle=rf"""
        WITH toks AS (
            SELECT unnest(string_split_regex(TRIM(text), '\s+')) AS token
            FROM documents
        ),
        n AS (SELECT COUNT(*) AS total FROM toks)
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM toks
        GROUP BY token
        HAVING COUNT(*) * {HH_FRACTION} > (SELECT total FROM n)
    """,
    tags=("sketch", "text", "documents"),
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens occurring more than N/HH_FRACTION times, with exact counts.

    Pass 1 sketches candidates per partition (mapInPandas, Arrow-batched);
    pass 2 recounts ONLY the candidates (broadcast of a bounded candidate
    set — <= MG_CAPACITY x partitions keys, independent of N).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )
    candidates = toks.mapInPandas(_mg_candidates, schema="token string").distinct()
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    exact = (
        toks.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") * HH_FRACTION > F.col("total"))
        .select("token", "n_occurrences")
    )
