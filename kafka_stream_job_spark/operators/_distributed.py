"""Distributed global-order primitives — rank and ntile WITHOUT the
single-partition sort that a bare ``Window.orderBy(...)`` (empty
partition spec) plans.

The trick (used by shard_manifest_balanced, abc_customer_classification,
histogram_price_deciles): range-repartition on the total-order key —
a parallel range exchange — rank LOCALLY inside each partition, then add
the partition's cumulative row-count offset. The offsets table is
|partitions| rows (metadata, broadcast back); range boundaries come from
Spark's sampling, but any boundary placement yields the same global rank
because the sort key is a total order and ranges are disjoint under it.

At 100 TB this is the only viable shape for global rank/ntile/cum-share:
the data-sized sort runs fully parallel, and nothing bigger than
|partitions| rows ever converges on one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_stream_job_spark.operators._portable import idiv

DEFAULT_RANK_PARTS = 32


def _guard_reserved(df: DataFrame, reserved: list[str]) -> None:
    """These helpers stamp temp columns (_pid, _lrn, _lcum{i}, ...) and
    join back on _pid; a caller column with one of those names would
    silently corrupt the result (or die on an ambiguous reference), so
    fail loudly up front instead."""
    clash = [c for c in df.columns if c in reserved]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with reserved temp names "
            f"{reserved} used by the distributed-order primitives; "
            "rename them before calling"
        )


def _guard_plain_ascending(sort_cols: list[Column]) -> None:
    """distributed_adjacent_changes builds its boundary min_by/max_by
    key as ``F.struct(*sort_cols)`` — that struct comparison only
    matches the repartitionByRange shuffle order when every sort col is
    a PLAIN ascending column. A ``desc()``/``asc_nulls_last()``
    SortOrder would shuffle descending but compare ascending, silently
    producing wrong boundary-pair counts — so fail loudly instead
    (same discipline as _guard_reserved). SortOrder isn't a public
    Python type; detect it via the column repr, which renders a sort
    expression as a ``... ASC|DESC NULLS FIRST|LAST`` SUFFIX — the
    check is anchored at the end so an expression merely CONTAINING
    the token (a string literal, a mid-expression alias) passes. A
    column literally NAMED 'x DESC' still trips it; that fail-loud
    false positive is accepted over the silent-wrong alternative."""
    for c in sort_cols:
        rep = str(c).removesuffix("'>")
        if rep.endswith((" ASC", " DESC", " NULLS FIRST", " NULLS LAST")):
            raise ValueError(
                f"sort_cols must be plain ascending columns (no "
                f"asc()/desc() SortOrder): got {c}; the boundary "
                "struct key would not match the shuffle order"
            )


def distributed_rank(
    df: DataFrame,
    sort_cols: list[Column],
    n_parts: int = DEFAULT_RANK_PARTS,
    rank_col: str = "rnk",
) -> DataFrame:
    """Add a 1-based global rank along ``sort_cols`` (must be a TOTAL
    order — include a unique tie-breaker) as ``rank_col``."""
    _guard_reserved(df, ["_pid", "_lrn", "_off"])
    parts = df.repartitionByRange(n_parts, *sort_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # The offsets branch and the data branch BOTH read the pid-stamped
    # ranking below. RangePartitioner samples its boundaries with a seed
    # derived from the physical RDD instance, so two separate executions
    # of the same range exchange can place boundary rows differently —
    # offsets computed against one partitioning and ranks against another
    # silently corrupt the global rank (observed at sf0.1 on the RFM
    # quartiles). The lazy localCheckpoint pins ONE materialization that
    # every branch shares; the exchange materializes its shuffle files
    # anyway, so this changes where bytes land, not how many.
    local = parts.withColumn(
        "_lrn",
        F.row_number().over(Window.partitionBy("_pid").orderBy(*sort_cols)),
    ).localCheckpoint(eager=False)
    offsets = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def ntile_from_rank(rank: Column, total: Column, k: int) -> Column:
    """SQL NTILE(k) bucket from a 1-based global rank and the total row
    count: the first ``total % k`` buckets hold ``ceil(total/k)`` rows,
    the rest ``floor(total/k)`` — exactly Spark's/DuckDB's NTILE."""
    # Integer division throughout (idiv = Spark's `div`) — double division
    # loses exactness past 2^53 and can land on the wrong side of an
    # integer boundary at the row counts this helper exists for.
    q = idiv(total.cast("long"), k)
    r = total % k
    big = q + 1
    in_big = rank <= r * big
    return (
        F.when(in_big, idiv((rank - 1).cast("long"), big) + 1)
        .otherwise(r + idiv((rank - r * big - 1).cast("long"), q) + 1)
        .cast("int")
    )


def distributed_prefix_sum(
    df: DataFrame,
    sort_cols: list[Column],
    value_col: str,
    n_parts: int = DEFAULT_RANK_PARTS,
    out_col: str = "running",
) -> DataFrame:
    """Add the global running SUM of ``value_col`` along ``sort_cols``
    (a total order) as ``out_col`` — same shape as distributed_rank but
    the broadcast offsets carry per-partition value totals instead of
    row counts. Same localCheckpoint pinning, same reason."""
    return distributed_prefix_sums(
        df, sort_cols, {value_col: out_col}, n_parts
    )


def distributed_prefix_sums(
    df: DataFrame,
    sort_cols: list[Column],
    value_to_out: dict[str, str],
    n_parts: int = DEFAULT_RANK_PARTS,
) -> DataFrame:
    """Several global running sums along ONE total order in ONE range
    exchange: every (value_col -> out_col) pair rides the same
    repartitionByRange + per-partition cumulative window + broadcast
    offset join, so N running sums cost exactly one shuffle of the data
    (events_sprt_monitor needs both the LLR walk and the row index —
    two passes would shuffle the table twice for no reason)."""
    _guard_reserved(
        df,
        ["_pid"]
        + [f"_lcum{i}" for i in range(len(value_to_out))]
        + [f"_ptot{i}" for i in range(len(value_to_out))]
        + [f"_off{i}" for i in range(len(value_to_out))],
    )
    parts = df.repartitionByRange(n_parts, *sort_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_cum = (
        Window.partitionBy("_pid")
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parts
    for i, vcol in enumerate(value_to_out):
        local = local.withColumn(f"_lcum{i}", F.sum(vcol).over(w_cum))
    local = local.localCheckpoint(eager=False)
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_pid")
        .agg(
            *[
                F.sum(vcol).alias(f"_ptot{i}")
                for i, vcol in enumerate(value_to_out)
            ]
        )
        .select(
            "_pid",
            *[
                F.coalesce(F.sum(f"_ptot{i}").over(w_off), F.lit(0)).alias(
                    f"_off{i}"
                )
                for i in range(len(value_to_out))
            ],
        )
    )
    out = local.join(F.broadcast(offsets), "_pid")
    drop = ["_pid"]
    for i, (vcol, ocol) in enumerate(value_to_out.items()):
        out = out.withColumn(ocol, F.col(f"_off{i}") + F.col(f"_lcum{i}"))
        drop += [f"_lcum{i}", f"_off{i}"]
    return out.drop(*drop)


def distributed_prefix_max(
    df: DataFrame,
    sort_cols: list[Column],
    value_col: str,
    n_parts: int = DEFAULT_RANK_PARTS,
    out_col: str = "running_max",
    exclusive: bool = False,
) -> DataFrame:
    """Add the global running MAX of ``value_col`` along ``sort_cols`` —
    the third member of the family (rank, prefix-sum, prefix-max; max is
    just as decomposable: local running max + the max over all EARLIER
    partitions, which is |partitions| rows of broadcast metadata). Used
    for arrival-order frontier analyses (watermark sizing), where the
    running max of event time along arrival order IS the watermark
    frontier, and for skyline sweeps (supplier_pareto_frontier), which
    need ``exclusive=True``: the max over STRICTLY EARLIER rows
    (SQL's ``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``), NULL
    for the globally first row. Same localCheckpoint pinning as
    distributed_rank, same reason."""
    _guard_reserved(df, ["_pid", "_lmax", "_pmax", "_omax"])
    parts = df.repartitionByRange(n_parts, *sort_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    upper = -1 if exclusive else 0
    local = parts.withColumn(
        "_lmax",
        F.max(value_col).over(
            Window.partitionBy("_pid")
            .orderBy(*sort_cols)
            .rowsBetween(Window.unboundedPreceding, upper)
        ),
    ).localCheckpoint(eager=False)
    offsets = (
        local.groupBy("_pid")
        .agg(F.max(value_col).alias("_pmax"))
        .withColumn(
            "_omax",
            F.max("_pmax").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("_pid", "_omax")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            F.when(
                F.col("_omax").isNull() | (F.col("_lmax") >= F.col("_omax")),
                F.col("_lmax"),
            ).otherwise(F.col("_omax")),
        )
        .drop("_pid", "_lmax", "_omax")
    )


def distributed_adjacent_changes(
    df: DataFrame,
    sort_cols: list[Column],
    value_col: str,
    n_parts: int = DEFAULT_RANK_PARTS,
    out_col: str = "n_changes",
) -> DataFrame:
    """Count adjacent pairs along the GLOBAL total order whose
    ``value_col`` differs — the fourth member of the family (rank,
    prefix-sum, prefix-max, adjacency). Decomposition: range-partition
    on the total order, count changes INSIDE each partition with a
    per-partition lag, then add the ≤|partitions| boundary pairs (each
    partition's last value vs the next non-empty partition's first) —
    metadata-sized, so the one ordered window here runs over at most
    ``n_parts`` rows. ``sort_cols`` must be PLAIN ascending columns (a
    total order — include a unique tie-breaker): the boundary min_by/
    max_by key is their struct, which only matches the shuffle order
    for bare ascending columns. Returns a 1-row DataFrame carrying
    ``out_col`` (0 for an empty input). Same localCheckpoint pinning as
    distributed_rank, same reason."""
    _guard_reserved(df, ["_pid", "_prev", "_first", "_last"])
    _guard_plain_ascending(sort_cols)
    parts = df.repartitionByRange(n_parts, *sort_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = parts.withColumn(
        "_prev",
        F.lag(value_col).over(Window.partitionBy("_pid").orderBy(*sort_cols)),
    ).localCheckpoint(eager=False)
    internal = local.agg(
        F.coalesce(
            F.sum(
                (
                    F.col("_prev").isNotNull()
                    & (F.col(value_col) != F.col("_prev"))
                ).cast("long")
            ),
            F.lit(0),
        ).alias("_internal")
    )
    order_key = F.struct(*sort_cols)
    bounds = local.groupBy("_pid").agg(
        F.min_by(value_col, order_key).alias("_first"),
        F.max_by(value_col, order_key).alias("_last"),
    )
    boundary = bounds.withColumn(
        "_prev", F.lag("_last").over(Window.orderBy("_pid"))
    ).agg(
        F.coalesce(
            F.sum(
                (
                    F.col("_prev").isNotNull()
                    & (F.col("_first") != F.col("_prev"))
                ).cast("long")
            ),
            F.lit(0),
        ).alias("_boundary")
    )
    return internal.crossJoin(F.broadcast(boundary)).select(
        (F.col("_internal") + F.col("_boundary")).cast("long").alias(out_col)
    )
