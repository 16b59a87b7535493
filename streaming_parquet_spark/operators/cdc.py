"""CDC-style upsert compaction: reduce a change stream to the latest
row per key — the MERGE INTO / snapshot-compaction step of any
incrementally-maintained dataset (crawl refreshes, feature stores,
dataset versioning).

Shape choice: max_by over a (sequence) struct, NOT a row_number
window. Both are one shuffle on the key, but the aggregate form
partial-aggregates map-side (each task keeps one candidate row per
key before the exchange), while the window form must shuffle and SORT
every version of every key. At 100 TB of updates over 1 TB of keys
that is the difference between exchanging |keys| rows and exchanging
|updates| rows.

Reference parity: none (SURVEY §2.11 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def upsert_latest(
    updates: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """Latest row per ``keys``: the row with the lexicographically
    greatest ``seq_cols`` tuple (e.g. (ts, event_id) — the id breaks
    timestamp ties deterministically) wins; its ``payload_cols`` are
    kept. Output: keys + seq_cols + payload_cols, one row per key."""
    ord_key = F.struct(*[F.col(c).alias(f"s{i}") for i, c in enumerate(seq_cols)])
    aggs = [
        F.max_by(F.col(c), ord_key).alias(c)
        for c in (*seq_cols, *payload_cols)
    ]
    return updates.groupBy(*keys).agg(*aggs)
