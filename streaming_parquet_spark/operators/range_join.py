"""Range join (value BETWEEN lo AND hi) via interval bucketization.

Spark plans a bare range-condition join as BroadcastNestedLoopJoin —
every left row probes every range. The scale-correct rendering maps the
condition onto an equi-join: pick a bucket width, explode each range
into the buckets it overlaps, bucket each left value, hash-join on the
bucket id, then re-check the exact BETWEEN as a residual filter. Left
rows touch only ranges whose buckets they share: cost goes from
O(|L| x |R|) to O(|L| + matches), at the price of range rows duplicated
x (span / width).

Pick ``bucket_width`` near the median range span: much smaller inflates
the exploded range table; much larger degrades toward the nested loop.
(The same shape Databricks' range-join optimization and the
tumbling-window trick in KDB/Flink use.)

Reference parity: the reference has no joins at all (SURVEY §2.4);
extension operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(
    left: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 10.0,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to every range row with lo <= value <= hi
    (closed interval, possibly overlapping ranges -> multiple matches).
    """
    if how != "inner":
        raise ValueError("range_join currently supports inner joins")
    w = float(bucket_width)
    l_b = left.withColumn(
        "__bkt", F.floor(F.col(value_col) / F.lit(w)).cast("long")
    )
    r_b = ranges.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
            )
        ),
    )
    joined = l_b.join(r_b, "__bkt").filter(
        (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) <= F.col(hi_col))
    )
    return joined.drop("__bkt")
