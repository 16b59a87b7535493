"""Hierarchical time-bucket rollups (hypertable / continuous-aggregate
shape): the finest granularity aggregates from raw rows ONCE; every
coarser tier re-aggregates the tier below it, never the raw data —
TimescaleDB's continuous-aggregate refresh and the classic OLAP cube
lattice both use this identity for summable measures.

Scale: one corpus-sized shuffle (the finest groupBy); each coarser tier
shuffles only the previous tier's buckets (orders of magnitude smaller
— hours of a year are ~9k rows per key). Measures must be summable
(count/sum/min/max) for the re-rollup identity to hold; averages are
derived downstream as sum/count.

Reference parity: the reference has no time semantics (SURVEY §2.11
extension; 'hypertable rollup' named in the build brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: granularity name -> (date_trunc unit, coarseness rank)
_GRAIN_ORDER = {"minute": 0, "hour": 1, "day": 2, "week": 3, "month": 4}


def hypertable_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    sum_col: str | None = None,
    granularities: tuple[str, ...] = ("hour", "day"),
) -> DataFrame:
    """Multi-resolution rollup: one output row per (granularity,
    bucket, *keys) with n (count) and total (sum of ``sum_col``, long).
    ``granularities`` must be ordered fine -> coarse; tier i+1 is
    computed FROM tier i (the continuous-aggregate identity), so the
    raw table is scanned exactly once."""
    keys = keys or []
    grains = list(granularities)
    if [g for g in grains if g not in _GRAIN_ORDER]:
        raise ValueError(f"unknown granularity in {grains}")
    if sorted(grains, key=_GRAIN_ORDER.get) != grains:
        raise ValueError("granularities must be ordered fine -> coarse")

    total = (
        F.sum(F.col(sum_col).cast("bigint")) if sum_col else F.lit(None)
    )
    tier = (
        df.groupBy(
            F.date_trunc(grains[0], F.col(ts_col)).alias("bucket_ts"), *keys
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            total.cast("bigint").alias("total"),
        )
    )
    tiers = [tier.select(F.lit(grains[0]).alias("granularity"), "*")]
    for g in grains[1:]:
        tier = (
            tier.groupBy(
                F.date_trunc(g, F.col("bucket_ts")).alias("bucket_ts"),
                *keys,
            )
            .agg(
                F.sum("n").cast("bigint").alias("n"),
                F.sum("total").cast("bigint").alias("total"),
            )
        )
        tiers.append(tier.select(F.lit(g).alias("granularity"), "*"))
    out = tiers[0]
    for t in tiers[1:]:
        out = out.unionByName(t)
    return out
