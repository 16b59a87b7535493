"""Distributed ordered-scan primitives: global running totals without
a single-task sort. A running sum over one global ORDER BY compiles to
a single-partition WindowExec — the whole corpus funnels through one
task, the canonical Spark scale trap. The two-phase form here is the
classic parallel prefix-sum: range-partition + local sort, one tiny
aggregate of per-partition totals turned into partition offsets, then
each partition's local running sum plus its offset. Every corpus-sized
step is parallel; only the offsets frame (one row per partition) is
serial. operators.layout.assign_contiguous_ids is the same pattern
with COUNT(*) as the measure.

The partitioning is pinned with localCheckpoint because
repartitionByRange samples its boundaries: the totals job and the
output job must see the SAME partition assignment.

Reference parity: none (SURVEY §2.11 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def running_total(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    out_col: str = "running",
) -> DataFrame:
    """Global running sum of ``val_col`` in ``order_cols`` order
    (inclusive of the current row), row-for-row equal to
    SUM(val) OVER (ORDER BY order_cols) but with no single-partition
    window. ``order_cols`` must be a total order (add a unique
    tiebreak) for a deterministic result."""
    parted = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = parted.groupBy("__pid").agg(F.sum(val_col).alias("__t"))
    w_off = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__t").over(w_off), F.lit(0)).alias("__off"),
    )
    w_local = (
        W.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        parted.join(F.broadcast(offsets), "__pid")
        .withColumn(
            out_col, F.sum(val_col).over(w_local) + F.col("__off")
        )
        .drop("__pid", "__off")
    )


def sweepline_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Interval-overlap counting by sweep line: each interval emits
    +1 at start and -1 at end (half-open [start, end)), deltas are
    netted per timestamp (collapsing ties makes the scan order total
    and the result deterministic), and the running sum of nets is the
    number of concurrent intervals from each timestamp onward. Output:
    (t, concurrent). Built on the two-phase running_total, so no
    single-task sort; the netting groupBy partial-aggregates map-side.
    """
    deltas = (
        df.select(F.col(start_col).alias("t"), F.lit(1).alias("d"))
        .unionAll(
            df.select(F.col(end_col).alias("t"), F.lit(-1).alias("d"))
        )
        .groupBy("t")
        .agg(F.sum("d").cast("long").alias("d"))
    )
    return running_total(deltas, ["t"], "d", out_col="concurrent").select(
        "t", "concurrent"
    )
