"""Streaming operators: watermarked event-time windows, session windows,
and streaming dedup (extensions; SURVEY.md §2.9/§2.11 — the reference has
no event-time semantics, these are the Spark-native generalization).

All helpers accept either a streaming or a batch DataFrame — the same
declarative plan serves both; watermarks are no-ops in batch mode, which
is how the DuckDB oracles validate the batch renderings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    keys: list[str] | None = None,
    watermark: str | None = "30 minutes",
    aggs: list | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation with late-data handling.

    Scale: state size is bounded by (watermark / window) * |keys| groups;
    Spark drops state older than the watermark.
    """
    keys = keys or []
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    return df.groupBy(F.window(ts_col, window), *keys).agg(*aggs)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    keys: list[str] | None = None,
    watermark: str | None = "30 minutes",
    aggs: list | None = None,
) -> DataFrame:
    keys = keys or []
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    return df.groupBy(F.window(ts_col, window, slide), *keys).agg(*aggs)


def session_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    keys: list[str] | None = None,
    watermark: str | None = "1 hour",
    aggs: list | None = None,
) -> DataFrame:
    """Session windows (gap-based). Batch mode gives the same sessions as
    the lag/cumsum rendering in queries.events_sessionize."""
    keys = keys or []
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    return df.groupBy(F.session_window(ts_col, gap), *keys).agg(*aggs)


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact dedup over a stream.

    With a ts_col, uses dropDuplicatesWithinWatermark so state is bounded
    by the watermark horizon (the 100 TB-safe variant); without one,
    unbounded dropDuplicates (exact, but state grows forever — batch use).
    """
    if ts_col is not None and df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
