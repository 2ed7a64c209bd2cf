"""Arrow-batched Python UDF surface (SURVEY.md §7.3 step 6): grouped-map
``applyInPandas`` and a scalar ``pandas_udf``, demonstrated on operators
whose results stay oracle-checkable.

When to use this path — and when not to (the 100 TB rule): everything
expressible with built-in ``pyspark.sql.functions`` stays JVM-side in
whole-stage codegen; Python enters only for logic Spark genuinely lacks
(here: arbitrary per-group numpy/pandas code). Data crosses the JVM↔Python
boundary as Arrow record batches — vectorized, ~10-100× faster than
row-at-a-time ``F.udf`` — and ``applyInPandas`` shuffles once on the group
key, so group cardinality/size must fit a worker's memory (customer groups
per nation: fine; don't group a 100 TB table by a 5-value key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_job_spark.registry import register
from kafka_stream_job_spark.tables import load_table


def _pround_np(x: np.ndarray, scale: int) -> np.ndarray:
    """Numpy twin of operators/_portable.pround: scale → round-half-away-
    from-zero to int → divide (np.round is half-even, which does NOT match
    either engine's ROUND)."""
    factor = 10.0**scale
    scaled = x * factor
    return np.sign(scaled) * np.floor(np.abs(scaled) + 0.5) / factor


# ---------------------------------------------------------------------------
# Grouped-map applyInPandas: per-nation z-score of customer account
# balances. One shuffle on c_nationkey; each group becomes a pandas frame
# in a Python worker; the oracle is the equivalent window SQL.
# ---------------------------------------------------------------------------
@register(
    "pandas_acctbal_zscore",
    oracle="""
        WITH stats AS (
            SELECT
                c_nationkey,
                SUM(c_acctbal) / COUNT(*) AS mu,
                sqrt(SUM(c_acctbal * c_acctbal) / COUNT(*)
                     - (SUM(c_acctbal) / COUNT(*)) * (SUM(c_acctbal) / COUNT(*))) AS sigma
            FROM customer
            GROUP BY c_nationkey
        )
        SELECT
            c.c_custkey,
            c.c_nationkey,
            ROUND(((c.c_acctbal - s.mu) / s.sigma) * 100.0) / 100.0 AS zscore
        FROM customer c
        JOIN stats s USING (c_nationkey)
        WHERE s.sigma > 0
    """,
    tags=("pandas-udf", "applyInPandas", "customer"),
)
def pandas_acctbal_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"].to_numpy(dtype=np.float64)
        # Mean/variance via explicit sums — the exact arithmetic the
        # oracle SQL performs, so the doubles agree pre-rounding.
        n = float(len(bal))
        mu = bal.sum() / n
        sigma = np.sqrt((bal * bal).sum() / n - mu * mu)
        if not sigma > 0:
            return pdf.iloc[0:0][["c_custkey", "c_nationkey"]].assign(zscore=[])
        out = pdf[["c_custkey", "c_nationkey"]].copy()
        out["zscore"] = _pround_np((bal - mu) / sigma, 2)
        return out

    return cust.groupBy("c_nationkey").applyInPandas(
        zscore, schema="c_custkey long, c_nationkey int, zscore double"
    )


# ---------------------------------------------------------------------------
# Scalar pandas_udf: Arrow-vectorized log1p of order totals — the scalar
# UDF shape (one Arrow batch in, one out, no shuffle implied). Kept
# deliberately simple: the interesting contract is the batch boundary.
# ---------------------------------------------------------------------------
@register(
    "pandas_scalar_log_price",
    oracle="""
        SELECT
            o_orderpriority,
            COUNT(*) AS n_orders,
            ROUND((SUM(ln(1.0 + o_totalprice))) * 10000.0) / 10000.0 AS sum_log_price
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("pandas-udf", "scalar", "orders"),
)
def pandas_scalar_log_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def log1p_price(price: pd.Series) -> pd.Series:
        return pd.Series(np.log1p(price.to_numpy(dtype=np.float64)))

    from kafka_stream_job_spark.operators._portable import pround

    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        pround(F.sum(log1p_price(F.col("o_totalprice"))), 4).alias("sum_log_price"),
    )


# ---------------------------------------------------------------------------
# Python UDTF (Spark 4): a user-defined TABLE function expanding each
# document into its whitespace-separated words — the table-valued member
# of the Python-boundary family (scalar pandas_udf above, grouped-map
# applyInPandas above, this). Invoked via SQL LATERAL so every doc row
# fans out through the UDTF, then re-aggregated JVM-side.
#
# 100 TB rule for UDTFs: they run row-at-a-time in Python workers (no
# Arrow batching as of Spark 4.1), i.e. the SLOWEST Python path — fine as
# API surface and for rare row-expanding logic a HOF can't express, but
# the registry's hot-path tokenizers (text_token_stats etc.) stay on
# JVM-side split/explode, which this query's oracle intentionally
# mirrors. Bounded here to doc_id % 50 = 0 so the demo stays demo-sized.
# ---------------------------------------------------------------------------
@register(
    "udtf_word_expand",
    oracle="""
        WITH words AS (
            SELECT d.doc_id, w.word
            FROM documents d,
                 UNNEST(string_split(d.text, ' ')) AS w(word)
            WHERE d.doc_id % 50 = 0 AND w.word <> ''
        )
        SELECT
            CAST(length(word) AS INTEGER) AS word_len,
            COUNT(*)                      AS n_words,
            COUNT(DISTINCT word)          AS n_distinct
        FROM words
        GROUP BY 1
    """,
    tags=("udtf", "python-boundary", "documents", "text"),
)
def udtf_word_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string")
    class WordExpand:
        def eval(self, text: str):
            if text is None:
                return
            for w in text.split(" "):
                if w:
                    yield (w,)

    spark.udtf.register("ksj_word_expand", WordExpand)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0
    ).createOrReplaceTempView("udtf_docs_v")
    return spark.sql(
        """
        SELECT CAST(length(w.word) AS INT) AS word_len,
               COUNT(*)                    AS n_words,
               COUNT(DISTINCT w.word)      AS n_distinct
        FROM udtf_docs_v d, LATERAL ksj_word_expand(d.text) w
        GROUP BY 1
        """
    )


# ---------------------------------------------------------------------------
# Grouped-AGGREGATE pandas_udf — the fourth member of the Python-boundary
# family (scalar, grouped-map, UDTF above): a whole group reduces to one
# scalar inside Python, planned as a real AggregateExpression (partial
# aggregation DISABLED — unlike JVM aggs these can't combine partial
# states, so Spark shuffles raw group rows; the reason to prefer JVM aggs
# at 100 TB, stated here with the cost visible). The UDAF computes a
# numerically-stable trimmed mean (drop top/bottom 10% by value) of order
# totals per priority — a robust statistic with no JVM builtin.
# ---------------------------------------------------------------------------
@register(
    "pandas_grouped_agg_trimmed_mean",
    oracle="""
        WITH ranked AS (
            SELECT o_orderpriority, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice, o_orderkey) AS rn,
                   COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
            FROM orders
        )
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               ROUND((SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) / 100.0
                      / COUNT(*)) * 10000.0) / 10000.0 + 0.0 AS trimmed_mean
        FROM ranked
        WHERE rn > n // 10 AND rn <= n - n // 10
        GROUP BY o_orderpriority
    """,
    tags=("pandas-udf", "grouped-agg", "udaf", "orders"),
)
def pandas_grouped_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from kafka_stream_job_spark.operators._portable import pround

    @pandas_udf("double")
    def trimmed_mean(v: pd.Series, k: pd.Series) -> float:
        # sort by (value, orderkey) — the oracle's deterministic total
        # order — then drop the bottom/top 10% by row count (n // 10).
        # Accumulate integer CENTS (prices are 2dp): the sum is exact and
        # order-free, so engines agree regardless of aggregation order;
        # the one float division at the end is a fixed dag both sides.
        df = pd.DataFrame({"v": v, "k": k}).sort_values(["v", "k"])
        n = len(df)
        cut = n // 10
        kept = df.iloc[cut : n - cut]
        cents = int(kept["v"].mul(100.0).round().astype("int64").sum())
        return cents / 100.0 / len(kept)

    @pandas_udf("long")
    def kept_count(v: pd.Series) -> int:
        n = len(v)
        return n - 2 * (n // 10)

    orders = load_table(spark, sf_dir, "orders")
    out = orders.groupBy("o_orderpriority").agg(
        kept_count("o_totalprice").alias("n_kept"),
        trimmed_mean("o_totalprice", "o_orderkey").alias("tm_raw"),
    )
    return out.select(
        "o_orderpriority",
        "n_kept",
        pround("tm_raw", 4).alias("trimmed_mean"),
    )


# ---------------------------------------------------------------------------
# mapInArrow — the fifth Python-boundary shape, and the leanest: raw
# pyarrow RecordBatches in and out, NO pandas materialization (pandas
# conversion copies + boxes; Arrow→numpy is zero-copy for fixed-width
# data). The op: integer-quantized squared L2 norm per embedding,
# computed by flattening the list column into ONE contiguous float array
# and one reshape — the vectorization pattern real feature pipelines use
# on the Arrow boundary. Exact-integer output (same quantization trick as
# embedding_int8_quantize), so the DuckDB list-fold oracle matches
# bit-for-bit.
# ---------------------------------------------------------------------------
ARROW_NORM_SCALE = 10_000


@register(
    "arrow_map_embedding_norm",
    oracle=f"""
        SELECT vec_id,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(embedding,
                            x -> CAST(ROUND(x::DOUBLE * {ARROW_NORM_SCALE}.0)
                                      AS BIGINT)
                                 * CAST(ROUND(x::DOUBLE * {ARROW_NORM_SCALE}.0)
                                      AS BIGINT))),
                    (a, b) -> a + b) AS BIGINT) AS norm2_q
        FROM embeddings
    """,
    tags=("arrow", "mapInArrow", "python-boundary", "embeddings"),
)
def arrow_map_embedding_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    def norm_batches(batches):
        import pyarrow as pa

        for batch in batches:
            ids = batch.column("vec_id")
            emb = batch.column("embedding")
            flat = emb.flatten()  # zero-copy contiguous float32 values
            vals = np.asarray(flat, dtype=np.float64)
            # round-half-away-from-zero to the quantization grid (np.round
            # is half-even — wrong tie rule for both engines)
            scaled = vals * float(ARROW_NORM_SCALE)
            q = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)
            offsets = np.asarray(emb.offsets, dtype=np.int64)
            sq = q * q
            norm2 = np.add.reduceat(sq, offsets[:-1])
            # reduceat on an empty segment returns the next element; the
            # embeddings here are fixed non-empty lists, but guard anyway
            empty = offsets[1:] == offsets[:-1]
            if empty.any():
                norm2 = np.where(empty, 0, norm2)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(norm2, type=pa.int64())], ["vec_id", "norm2_q"]
            )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInArrow(norm_batches, schema="vec_id long, norm2_q long")


# ---------------------------------------------------------------------------
# COGROUPED-MAP applyInPandas — the last member of the Python-boundary
# family (scalar, grouped-map, grouped-agg, UDTF, mapInPandas,
# mapInArrow elsewhere): TWO DataFrames cogrouped on a key, each group
# pair handed to pandas together. The canonical use is exactly this —
# pandas.merge_asof per user, i.e. an as-of join written as library code
# instead of a join plan (what a team ports from a single-node pandas
# pipeline before rewriting it as the union+window formulation in
# asof_purchase_attribution; both are in the registry so the plans can
# be compared). One shuffle per side on user_id; per-user group pairs
# must fit a worker — fine for per-entity timelines.
# Arithmetic: the seconds-since gap is computed in integer microseconds
# (datetime64[us] subtraction) floor-divided to seconds, mirrored by the
# oracle's epoch_us subtraction — no date_diff crossing semantics.
# ---------------------------------------------------------------------------
@register(
    "cogroup_asof_pandas",
    oracle="""
        WITH touches AS (
            SELECT user_id, ts, MAX(event_id) AS touch_event_id
            FROM events
            WHERE event_type IN ('view', 'click')
            GROUP BY user_id, ts
        ),
        purchases AS (
            SELECT user_id, ts, event_id AS purchase_id
            FROM events WHERE event_type = 'purchase'
        )
        SELECT
            p.purchase_id,
            p.user_id,
            t.touch_event_id AS last_touch_id,
            CAST((epoch_us(p.ts) - epoch_us(t.ts)) // 1000000 AS BIGINT)
                AS seconds_since_touch
        FROM purchases p
        ASOF JOIN touches t ON p.user_id = t.user_id AND t.ts <= p.ts
    """,
    tags=("pandas-udf", "cogroup", "asof", "events"),
)
def cogroup_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    touches = (
        events.filter(F.col("event_type").isin("view", "click"))
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("touch_event_id"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )

    def asof(purch: pd.DataFrame, touch: pd.DataFrame) -> pd.DataFrame:
        if purch.empty:
            return pd.DataFrame(
                columns=["purchase_id", "user_id", "last_touch_id",
                         "seconds_since_touch"]
            )
        purch = purch.sort_values("ts")
        if touch.empty:
            return purch.iloc[0:0][["purchase_id", "user_id"]].assign(
                last_touch_id=pd.Series(dtype="int64"),
                seconds_since_touch=pd.Series(dtype="int64"),
            )
        touch = touch.sort_values("ts")
        merged = pd.merge_asof(
            purch,
            touch.rename(columns={"ts": "touch_ts"}),
            left_on="ts",
            right_on="touch_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        ).dropna(subset=["touch_event_id"])
        gap_us = (
            merged["ts"].to_numpy("datetime64[us]").astype("int64")
            - merged["touch_ts"].to_numpy("datetime64[us]").astype("int64")
        )
        return pd.DataFrame(
            {
                "purchase_id": merged["purchase_id"].astype("int64"),
                "user_id": merged["user_id"].astype("int64"),
                "last_touch_id": merged["touch_event_id"].astype("int64"),
                "seconds_since_touch": gap_us // 1_000_000,
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(touches.groupBy("user_id"))
        .applyInPandas(
            asof,
            schema=(
                "purchase_id long, user_id long, last_touch_id long,"
                " seconds_since_touch long"
            ),
        )
    )


# ---------------------------------------------------------------------------
# POLYMORPHIC UDTF (Spark 4 `analyze`) — the table function's output
# SCHEMA is computed at plan time from a literal argument: ksj_ngrams(
# text, n) emits a column literally named gram_{n}, so the same UDTF
# compiles to different shapes per call site (the dynamic-schema half of
# the UDTF API that the fixed-schema ksj_word_expand doesn't exercise).
# The registry query counts character trigrams through it; the oracle
# reproduces the same trigrams relationally.
# ---------------------------------------------------------------------------
@register(
    "udtf_dynamic_ngrams",
    oracle="""
        WITH g AS (
            SELECT substr(text, i, 3) AS gram
            FROM (SELECT text, unnest(range(1, length(text) - 1)) AS i
                  FROM documents
                  WHERE doc_id % 100 = 0)
        )
        SELECT CAST(length(gram) AS BIGINT) AS gram_len,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct
        FROM g GROUP BY 1
    """,
    tags=("udtf", "python-boundary", "dynamic-schema", "documents"),
)
def udtf_dynamic_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class NGrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            assert n.value is not None, "n must be a literal"
            return AnalyzeResult(
                StructType().add(f"gram_{n.value}", StringType())
            )

        def eval(self, text: str, n: int):
            if text is None:
                return
            for i in range(len(text) - n + 1):
                yield (text[i : i + n],)

    spark.udtf.register("ksj_ngrams", NGrams)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 100 == 0
    ).createOrReplaceTempView("udtf_ngram_docs_v")
    return spark.sql(
        """
        SELECT CAST(length(g.gram_3) AS BIGINT) AS gram_len,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(COUNT(DISTINCT g.gram_3) AS BIGINT) AS n_distinct
        FROM udtf_ngram_docs_v d, LATERAL ksj_ngrams(d.text, 3) g
        GROUP BY 1
        """
    )
