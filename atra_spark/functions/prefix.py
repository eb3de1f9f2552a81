"""Distributed global prefix sum — the scalable spelling of
``Window.orderBy(...)`` cumulative aggregates.

A window with a global ORDER BY and no PARTITION BY collapses the
whole relation into ONE task; every operator needing a global running
total (shard packing, budgeted selection) uses this two-phase pattern
instead: range-partition on the order key, cumsum within each
partition, then add per-partition base offsets computed on the tiny
#partitions-row relation and broadcast back. The result is a pure
function of the global order — wherever the sampled range boundaries
fall, the cumulative sums are identical — so single-window SQL twins
reproduce it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def distributed_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "_cum",
) -> DataFrame:
    """Adds ``out_col`` = cumulative sum of ``value_col`` over the
    GLOBAL ``order_col`` order (inclusive of the current row).

    The intermediate relation is materialized once (localCheckpoint):
    the per-partition totals and the final join both consume it, and
    partition ids must not depend on the optimizer re-planning the
    range exchange (sampled boundaries are only guaranteed identical
    across subtrees when exchange reuse fires).
    """
    ordered = df.repartitionByRange(F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ordered.withColumn("_cum_in", F.sum(value_col).over(w_in)).localCheckpoint()
    totals = local.groupBy("_pid").agg(F.max("_cum_in").alias("_tot"))
    w_base = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    bases = totals.withColumn("_base", F.coalesce(F.sum("_tot").over(w_base), F.lit(0)))
    return (
        local.join(F.broadcast(bases.select("_pid", "_base")), on="_pid")
        .withColumn(out_col, F.col("_base") + F.col("_cum_in"))
        .drop("_pid", "_cum_in", "_base")
    )
