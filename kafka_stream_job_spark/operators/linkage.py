"""Probabilistic record linkage (entity resolution) — the
Fellegi–Sunter model with blocking, the canonical pipeline for linking
two noisy representations of the same entities at scale (the method
behind Splink-style toolkits; Fellegi & Sunter, JASA 1969).

Pipeline, shuffle-disciplined for 100 TB:

1. **Two record views.** ``crm`` is the customer table as-is; ``billing``
   is a deterministically perturbed copy (every 5th balance off by one
   cent, every 7th segment wiped to UNKNOWN, every 11th name suffix
   reversed) — the driver's oracle can reproduce the noise exactly, so
   the whole linkage is hash-checkable, which is rare for ER pipelines.
2. **Blocking.** Candidate pairs arise ONLY from an equi-join on
   (nation, balance band): never an all-pairs comparison. A perturbation
   that moves a record across its band boundary is a blocking miss —
   exactly the recall trade real blocking makes, and both engines count
   it identically.
3. **Comparison vector → log-likelihood weight.** Per-field agreement
   contributes log2(m/u), disagreement log2((1-m)/(1-u)), with published
   m/u constants baked as full-precision literals shared by Spark and
   the oracle. Per-pair weights are converted to integer milli-weights
   BEFORE any cross-row sum, so no float summation-order drift.
4. **Classification + audit.** weight > threshold → predicted match;
   the report aggregates per nation: candidate pairs, predictions, true
   and false positives, and the total milli-weight.

Scale: the only joins are block-key equi-joins (high-cardinality keys,
AQE-splittable); the comparison vector is all JVM-side expressions; the
final aggregate is 25 rows. No window, no cartesian, no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_job_spark.operators._portable import idiv, jvm_values_df
from kafka_stream_job_spark.registry import register
from kafka_stream_job_spark.tables import load_table

# m = P(field agrees | same entity): 1 - deterministic perturbation rate.
# u = P(field agrees | different entities): background agreement chance.
_M_BAL, _U_BAL = 0.8, 0.001  # 1-in-5 balances perturbed; cents rarely collide
_M_SEG, _U_SEG = 6.0 / 7.0, 0.2  # 1-in-7 wiped; 5 segments → u = 1/5
_M_NAM, _U_NAM = 10.0 / 11.0, 0.01  # 1-in-11 reversed; 3-digit suffix

_W = {
    "bal_a": math.log2(_M_BAL / _U_BAL),
    "bal_d": math.log2((1 - _M_BAL) / (1 - _U_BAL)),
    "seg_a": math.log2(_M_SEG / _U_SEG),
    "seg_d": math.log2((1 - _M_SEG) / (1 - _U_SEG)),
    "nam_a": math.log2(_M_NAM / _U_NAM),
    "nam_d": math.log2((1 - _M_NAM) / (1 - _U_NAM)),
}
_THRESHOLD_MILLI = 5000  # weight > 5.0 bits → predicted match
_BAND_CENTS = 10_000  # blocking band = 100 currency units

#: The crm/billing record-view CTEs — THE single spec of the
#: deterministic perturbations, spliced into every linkage oracle so the
#: report and EM queries can never drift apart.
_CRM_BILLING_SQL = """\
        crm AS (
            SELECT c_custkey AS a_key, c_nationkey AS nation,
                   CAST(ROUND(c_acctbal * 100.0) AS BIGINT) AS cents,
                   c_mktsegment AS seg,
                   SUBSTR(c_name, LENGTH(c_name) - 2, 3) AS nam3
            FROM customer
        ), billing AS (
            SELECT c_custkey AS b_key, c_nationkey AS nation,
                   CAST(ROUND(c_acctbal * 100.0) AS BIGINT)
                     + CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END AS cents,
                   CASE WHEN c_custkey % 7 = 0 THEN 'UNKNOWN'
                        ELSE c_mktsegment END AS seg,
                   CASE WHEN c_custkey % 11 = 0
                        THEN REVERSE(SUBSTR(c_name, LENGTH(c_name) - 2, 3))
                        ELSE SUBSTR(c_name, LENGTH(c_name) - 2, 3) END AS nam3
            FROM customer
        )"""


def _record_views(cust):
    """Spark twin of _CRM_BILLING_SQL: (crm, billing) DataFrames with
    keys, comparison fields, and the blocking band — the one place the
    perturbation spec exists on the Spark side."""
    cents = F.round(F.col("c_acctbal") * 100.0, 0).cast("long")
    nam3 = F.substring(F.col("c_name"), -3, 3)
    crm = cust.select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_nationkey").alias("nation"),
        cents.alias("a_cents"),
        F.col("c_mktsegment").alias("a_seg"),
        nam3.alias("a_nam3"),
    ).withColumn("a_band", idiv("a_cents", _BAND_CENTS))
    billing = cust.select(
        F.col("c_custkey").alias("b_key"),
        F.col("c_nationkey").alias("nation"),
        (cents + F.when(F.col("c_custkey") % 5 == 0, 1).otherwise(0)).alias(
            "b_cents"
        ),
        F.when(F.col("c_custkey") % 7 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("b_seg"),
        F.when(F.col("c_custkey") % 11 == 0, F.reverse(nam3))
        .otherwise(nam3)
        .alias("b_nam3"),
    ).withColumn("b_band", idiv("b_cents", _BAND_CENTS))
    return crm, billing


#: The blocked-and-scored pair CTE — factored so the FS report and the
#: entity-clustering query run the IDENTICAL milliweight arithmetic.
_SCORED_PAIRS_SQL = f"""pairs AS (
            SELECT a.nation, a.a_key, b.b_key,
                   CAST(ROUND(CAST(1000.0 AS DOUBLE) * (
                       CASE WHEN a.cents = b.cents
                            THEN CAST({_W['bal_a']!r} AS DOUBLE) ELSE CAST({_W['bal_d']!r} AS DOUBLE) END
                     + CASE WHEN a.seg = b.seg
                            THEN CAST({_W['seg_a']!r} AS DOUBLE) ELSE CAST({_W['seg_d']!r} AS DOUBLE) END
                     + CASE WHEN a.nam3 = b.nam3
                            THEN CAST({_W['nam_a']!r} AS DOUBLE) ELSE CAST({_W['nam_d']!r} AS DOUBLE) END
                   )) AS BIGINT) AS milliweight
            FROM crm a JOIN billing b
              ON a.nation = b.nation
             AND a.cents // {_BAND_CENTS} = b.cents // {_BAND_CENTS}
        )"""


def _scored_pairs(cust) -> DataFrame:
    """Spark twin of _SCORED_PAIRS_SQL: blocked candidate pairs with the
    integer milliweight — shared by the FS report and the clustering."""
    crm, billing = _record_views(cust)
    w = F.lit  # full-precision literals identical to the oracle's
    weight = (
        F.when(F.col("a_cents") == F.col("b_cents"), w(_W["bal_a"])).otherwise(
            w(_W["bal_d"])
        )
        + F.when(F.col("a_seg") == F.col("b_seg"), w(_W["seg_a"])).otherwise(
            w(_W["seg_d"])
        )
        + F.when(F.col("a_nam3") == F.col("b_nam3"), w(_W["nam_a"])).otherwise(
            w(_W["nam_d"])
        )
    )
    return crm.join(
        billing,
        (crm.nation == billing.nation) & (crm.a_band == billing.b_band),
    ).select(
        crm.nation,
        "a_key",
        "b_key",
        F.round(weight * 1000.0, 0).cast("long").alias("milliweight"),
    )


@register(
    "linkage_fellegi_sunter",
    oracle=f"""
        WITH {_CRM_BILLING_SQL}, {_SCORED_PAIRS_SQL}
        SELECT CAST(nation AS INT) AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN milliweight > {_THRESHOLD_MILLI}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_pred,
               CAST(SUM(CASE WHEN milliweight > {_THRESHOLD_MILLI}
                              AND a_key = b_key
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_true_pred,
               CAST(SUM(CASE WHEN milliweight > {_THRESHOLD_MILLI}
                              AND a_key <> b_key
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pred,
               CAST(SUM(milliweight) AS BIGINT) AS sum_milliweight
        FROM pairs
        GROUP BY nation
    """,
    tags=("linkage", "entity-resolution", "blocking", "customer"),
)
def linkage_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _scored_pairs(load_table(spark, sf_dir, "customer"))
    pred = F.col("milliweight") > _THRESHOLD_MILLI
    return (
        pairs.groupBy(F.col("nation").cast("int").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(pred.cast("long")).cast("long").alias("n_pred"),
            F.sum((pred & (F.col("a_key") == F.col("b_key"))).cast("long"))
            .cast("long")
            .alias("n_true_pred"),
            F.sum((pred & (F.col("a_key") != F.col("b_key"))).cast("long"))
            .cast("long")
            .alias("n_false_pred"),
            F.sum("milliweight").cast("long").alias("sum_milliweight"),
        )
    )


# ---------------------------------------------------------------------------
# EM PARAMETER ESTIMATION — the unsupervised half of Fellegi–Sunter (the
# core of Splink-style tooling): starting from deliberately-wrong priors,
# two EM iterations over the comparison vectors re-learn λ (match
# proportion) and the per-field m/u probabilities with NO labels.
#
# The 100 TB shape: the only data-sized work is ONE pass building the
# 2^k-row sufficient statistic (count per comparison-vector combo, k=3
# fields → 8 rows). Every E/M step then runs on those 8 rows — a
# broadcast-sized table — so iterating costs nothing at scale. Each
# cross-row reduction integerizes per-row terms first
# (ROUND(cnt·p·1e6) as BIGINT), so float summation order can never
# split the engines; the M-step ratios are then exact-integer
# numerators/denominators divided once as doubles.
# ---------------------------------------------------------------------------
_EM_INIT = {"lam": 0.1, "m": 0.9, "u": 0.1}  # deliberately-wrong priors
_EM_ITERS = 2
_FIELDS = ("bal", "seg", "nam")


def _em_step(joined_cols):
    """Shared E+M arithmetic, expressed once over a dict of column
    expressions {lam, m_bal, u_bal, ..., g_bal, g_seg, g_nam, cnt} —
    returns (pmicro, ) column; Spark-side only (the oracle mirrors it
    term for term in SQL)."""
    c = joined_cols
    num = c["lam"]
    den = 1.0 - c["lam"]
    for f in _FIELDS:
        g = c[f"g_{f}"] == 1
        num = num * F.when(g, c[f"m_{f}"]).otherwise(1.0 - c[f"m_{f}"])
        den = den * F.when(g, c[f"u_{f}"]).otherwise(1.0 - c[f"u_{f}"])
    p = num / (num + den)
    return F.round((F.col("cnt") * p) * 1000000.0, 0).cast("long")


def _em_oracle_sql() -> str:
    """Generate the oracle CTE chain for _EM_ITERS iterations — the same
    per-iteration text each time, so Spark and DuckDB run identical
    arithmetic in identical order."""
    pairs = f"""{_CRM_BILLING_SQL}, combos AS (
            SELECT CASE WHEN a.cents = b.cents THEN 1 ELSE 0 END AS g_bal,
                   CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS g_seg,
                   CASE WHEN a.nam3 = b.nam3 THEN 1 ELSE 0 END AS g_nam,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM crm a JOIN billing b
              ON a.nation = b.nation
             AND a.cents // {_BAND_CENTS} = b.cents // {_BAND_CENTS}
            GROUP BY 1, 2, 3
        )"""
    # params0: literal priors
    prev = "params0"
    ctes = [pairs, f"""params0 AS (
            SELECT CAST({_EM_INIT['lam']!r} AS DOUBLE) AS lam,
                   {', '.join(
                       f"CAST({_EM_INIT['m']!r} AS DOUBLE) AS m_{f}, "
                       f"CAST({_EM_INIT['u']!r} AS DOUBLE) AS u_{f}"
                       for f in _FIELDS)}
        )"""]
    for i in range(1, _EM_ITERS + 1):
        num = "lam"
        den = "(1.0 - lam)"
        for f in _FIELDS:
            num = (f"({num} * CASE WHEN g_{f} = 1 THEN m_{f} "
                   f"ELSE 1.0 - m_{f} END)")
            den = (f"({den} * CASE WHEN g_{f} = 1 THEN u_{f} "
                   f"ELSE 1.0 - u_{f} END)")
        ctes.append(f"""e{i} AS (
            SELECT g_bal, g_seg, g_nam, cnt,
                   CAST(ROUND((cnt * ({num} / ({num} + {den})))
                              * 1000000.0) AS BIGINT) AS pmicro
            FROM combos CROSS JOIN {prev}
        ), red{i} AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                   CAST(SUM(pmicro) AS BIGINT) AS s_p,
                   {', '.join(
                       f"CAST(SUM(CASE WHEN g_{f} = 1 THEN pmicro ELSE 0 END) AS BIGINT) AS s_pg_{f}, "
                       f"CAST(SUM(CASE WHEN g_{f} = 1 THEN cnt ELSE 0 END) AS BIGINT) AS s_g_{f}"
                       for f in _FIELDS)}
            FROM e{i}
        ), params{i} AS (
            SELECT CAST(s_p AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS lam,
                   {', '.join(
                       f"CAST(s_pg_{f} AS DOUBLE) / CAST(s_p AS DOUBLE) AS m_{f}, "
                       f"CAST(s_g_{f} * 1000000 - s_pg_{f} AS DOUBLE) / "
                       f"CAST(n * 1000000 - s_p AS DOUBLE) AS u_{f}"
                       for f in _FIELDS)},
                   n AS n_pairs
            FROM red{i}
        )""")
        prev = f"params{i}"
    body = ",\n".join(ctes)
    cols = ", ".join(
        f"m_{f} AS m_{f}, u_{f} AS u_{f}" for f in _FIELDS
    )
    return (f"WITH {body}\n        SELECT lam AS lam, {cols}, "
            f"CAST(n_pairs AS BIGINT) AS n_pairs FROM {prev}")


@register(
    "linkage_em_parameters",
    oracle=_em_oracle_sql(),
    tags=("linkage", "entity-resolution", "em", "customer"),
)
def linkage_em_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # keys are unused here; Catalyst prunes them out of the scan
    crm, billing = _record_views(load_table(spark, sf_dir, "customer"))

    combos = (
        crm.join(
            billing,
            (crm.nation == billing.nation) & (crm.a_band == billing.b_band),
        )
        .select(
            (F.col("a_cents") == F.col("b_cents")).cast("long").alias("g_bal"),
            (F.col("a_seg") == F.col("b_seg")).cast("long").alias("g_seg"),
            (F.col("a_nam3") == F.col("b_nam3")).cast("long").alias("g_nam"),
        )
        .groupBy("g_bal", "g_seg", "g_nam")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        # materialize the 2^k-row sufficient statistic ONCE: every EM
        # iteration re-references it, and without the checkpoint each
        # E-step's lineage would re-run the data-sized pairs join
        .localCheckpoint()
    )

    params = jvm_values_df(
        spark,
        [
            tuple(
                [_EM_INIT["lam"]]
                + [x for _ in _FIELDS for x in (_EM_INIT["m"], _EM_INIT["u"])]
            )
        ],
        "lam double, "
        + ", ".join(f"m_{f} double, u_{f} double" for f in _FIELDS),
    )
    for _ in range(_EM_ITERS):
        j = combos.crossJoin(F.broadcast(params))
        cols = {c: F.col(c) for c in j.columns}
        e = j.select("g_bal", "g_seg", "g_nam", "cnt",
                     _em_step(cols).alias("pmicro"))
        aggs = [
            F.sum("cnt").cast("long").alias("n"),
            F.sum("pmicro").cast("long").alias("s_p"),
        ]
        for f in _FIELDS:
            g = F.col(f"g_{f}") == 1
            aggs.append(
                F.sum(F.when(g, F.col("pmicro")).otherwise(F.lit(0)))
                .cast("long")
                .alias(f"s_pg_{f}")
            )
            aggs.append(
                F.sum(F.when(g, F.col("cnt")).otherwise(F.lit(0)))
                .cast("long")
                .alias(f"s_g_{f}")
            )
        red = e.agg(*aggs)
        sel = [
            (
                F.col("s_p").cast("double")
                / (F.col("n").cast("double") * 1000000.0)
            ).alias("lam")
        ]
        for f in _FIELDS:
            sel.append(
                (F.col(f"s_pg_{f}").cast("double") / F.col("s_p").cast("double"))
                .alias(f"m_{f}")
            )
            sel.append(
                (
                    (F.col(f"s_g_{f}") * 1000000 - F.col(f"s_pg_{f}")).cast(
                        "double"
                    )
                    / (F.col("n") * 1000000 - F.col("s_p")).cast("double")
                ).alias(f"u_{f}")
            )
        sel.append(F.col("n").alias("n_pairs"))
        params = red.select(*sel)
    out_cols = ["lam"]
    for f in _FIELDS:
        out_cols += [f"m_{f}", f"u_{f}"]
    return params.select(*out_cols, F.col("n_pairs").cast("long").alias("n_pairs"))


# ---------------------------------------------------------------------------
# ENTITY CLUSTERING — the step after pairwise classification: predicted
# match pairs are only EDGES; the deliverable of entity resolution is the
# partition of records into entities, i.e. connected components over
# those edges (Splink's cluster_pairwise_predictions step). Records in
# no predicted pair are singleton entities. The report is the cluster-
# size histogram plus an identity checksum (sum of canonical min-key
# component ids per size), so a single mis-clustered record flips the
# hash. Size-2+ clusters here are exactly the classifier's false-positive
# chains — the histogram is the QA artifact a steward reads before
# approving an ER run.
# Scale shape: CC runs ONLY on the predicted-pair subgraph (false-
# positive edges are rare by construction — the data-sized record space
# never enters the iteration); each round is one join + min-aggregate on
# the edge set, early-exits when labels stabilize, and the singleton
# complement is a broadcast-able anti-join against edge endpoints. The
# final histogram is a two-level bounded aggregate.
# ---------------------------------------------------------------------------
# iteration budget shared with the dedup CC twin (dedup.py:CC_MAX_ITERS);
# non-convergence inside the budget raises instead of silently emitting a
# partial propagation (a >20-hop FP chain at a larger SF would otherwise
# diverge from the oracle's exact transitive closure with no signal)


@register(
    "linkage_entity_clusters",
    oracle=f"""
        WITH RECURSIVE {_CRM_BILLING_SQL}, {_SCORED_PAIRS_SQL},
        pred AS (
            SELECT a_key, b_key FROM pairs
            WHERE milliweight > {_THRESHOLD_MILLI} AND a_key <> b_key
        ),
        edges AS (
            SELECT a_key AS src, b_key AS dst FROM pred
            UNION
            SELECT b_key, a_key FROM pred
        ),
        verts AS (SELECT DISTINCT src AS key FROM edges),
        reach(src, dst) AS (
            SELECT key, key FROM verts
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
        ),
        comp AS (
            SELECT src AS key, MIN(dst) AS component FROM reach GROUP BY 1
            UNION ALL
            SELECT c_custkey, c_custkey FROM customer
            WHERE c_custkey NOT IN (SELECT key FROM verts)
        ),
        sizes AS (
            SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
            FROM comp GROUP BY 1
        )
        SELECT cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(cluster_size * COUNT(*) AS BIGINT) AS n_records,
               CAST(SUM(component) AS BIGINT) AS id_checksum
        FROM sizes GROUP BY 1
    """,
    tags=("linkage", "entity-resolution", "graph", "iterative", "customer"),
)
def linkage_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    pred = (
        _scored_pairs(cust)
        .filter(
            (F.col("milliweight") > _THRESHOLD_MILLI)
            & (F.col("a_key") != F.col("b_key"))
        )
        .select("a_key", "b_key")
    )
    edges = (
        pred.select(F.col("a_key").alias("src"), F.col("b_key").alias("dst"))
        .unionByName(
            pred.select(F.col("b_key").alias("src"), F.col("a_key").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("key"))
        .distinct()
        .select("key", F.col("key").alias("component"))
        .localCheckpoint(eager=False)
    )
    from kafka_stream_job_spark.operators.dedup import CC_MAX_ITERS

    changed = -1
    for _ in range(CC_MAX_ITERS):
        msgs = edges.join(labels, edges.src == labels.key).select(
            F.col("dst").alias("key"), "component"
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("key")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "old"), "key")
            .filter(F.col("component") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"entity clustering did not converge in {CC_MAX_ITERS} rounds "
            f"({changed} labels still changing) — the emitted partition "
            "would be a silent truncation of the transitive closure"
        )
    singletons = (
        cust.select(F.col("c_custkey").alias("key"))
        .join(labels.select("key"), "key", "left_anti")
        .select("key", F.col("key").alias("component"))
    )
    sizes = (
        labels.unionByName(singletons)
        .groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("cluster_size"))
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).cast("long").alias("n_records"),
        F.sum("component").cast("long").alias("id_checksum"),
    )


# ---------------------------------------------------------------------------
# BLOCKING QUALITY AUDIT — the two numbers every ER textbook (Christen
# 2012) says to check BEFORE trusting a blocked linkage: REDUCTION
# RATIO (how much of the N² comparison space the blocking key prunes)
# and PAIRS COMPLETENESS (how many true matches survive blocking — here
# ground truth is exact: billing row k IS crm row k, so a miss is
# precisely a perturbation that pushed a record across its balance-band
# boundary). Both reported as exact integer basis points, so the oracle
# can never drift on a float ratio. One blocked equi-join count + one
# 1-row broadcast record count; the N² space is arithmetic, never
# materialized.
#
# Overflow posture (r6 ADVICE): the ratio is computed WITHOUT the
# quadratic ×10000 intermediate, via the exact identity
#   (n² − cand)·10⁴ // n²  ==  10⁴ − ⌈cand·10⁴ / n²⌉
# with the ceil-division nested as ⌈⌈cand·10⁴/n⌉/n⌉ (exact for positive
# integers), so the largest intermediate is cand·10⁴ + n − 1 — int64-safe
# until cand > 9.2e14 candidate pairs, a join output no engine would
# finish counting anyway. The `comparison_space` display column is still
# n² in BIGINT and raises loudly (ANSI/DuckDB overflow) past n ≈ 3.03e9
# records; the ratio columns no longer depend on it.
# ---------------------------------------------------------------------------
@register(
    "linkage_blocking_quality",
    oracle=f"""
        WITH {_CRM_BILLING_SQL},
        cand AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
                   CAST(SUM(CASE WHEN a.a_key = b.b_key THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_true_in_block
            FROM crm a JOIN billing b
              ON a.nation = b.nation
             AND a.cents // {_BAND_CENTS} = b.cents // {_BAND_CENTS}
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_records FROM customer)
        SELECT n.n_records,
               n.n_records * n.n_records AS comparison_space,
               cand.n_candidates,
               10000 - (((cand.n_candidates * 10000 + n.n_records - 1)
                         // n.n_records + n.n_records - 1)
                        // n.n_records) AS reduction_ratio_bp,
               n.n_records AS n_true_pairs,
               cand.n_true_in_block,
               cand.n_true_in_block * 10000 // n.n_records
                   AS pairs_completeness_bp
        FROM cand, n
    """,
    tags=("linkage", "entity-resolution", "blocking", "audit", "customer"),
)
def linkage_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    crm, billing = _record_views(cust)
    cand = crm.join(
        billing,
        (crm.nation == billing.nation) & (crm.a_band == billing.b_band),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum((F.col("a_key") == F.col("b_key")).cast("long"))
        .cast("long")
        .alias("n_true_in_block"),
    )
    n = cust.agg(F.count(F.lit(1)).cast("long").alias("n_records"))
    space = F.col("n_records") * F.col("n_records")
    nr = F.col("n_records")
    inner_ceil = idiv(F.col("n_candidates") * 10000 + nr - 1, nr)
    outer_ceil = idiv(inner_ceil + nr - 1, nr)
    return (
        cand.crossJoin(F.broadcast(n))
        .select(
            "n_records",
            space.alias("comparison_space"),
            "n_candidates",
            (F.lit(10000) - outer_ceil).alias("reduction_ratio_bp"),
            F.col("n_records").alias("n_true_pairs"),
            "n_true_in_block",
            idiv(F.col("n_true_in_block") * 10000, F.col("n_records")).alias(
                "pairs_completeness_bp"
            ),
        )
    )
