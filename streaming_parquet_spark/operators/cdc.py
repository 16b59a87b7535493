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

from pyspark.sql import DataFrame, Window as W, functions as F


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


def scd2_intervals(
    updates: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    payload_cols: list[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a change stream into
    validity intervals. Each version of a key becomes one row valid
    from its own ``seq_cols[0]`` until the NEXT version's (exclusive);
    the newest version gets a NULL ``valid_to`` and is_current=true.
    ``version`` numbers versions 1..n per key in sequence order.

    Plan: exactly one shuffle — the window partitions by the key and
    sorts by the sequence tuple; lead() and row_number() share the
    same window frame so Catalyst evaluates both in a single
    WindowExec pass. Unlike a self-join rendering (join each version
    to its successor), no second corpus-sized exchange exists. At
    100 TB of history the per-key sort is the irreducible cost of
    interval reconstruction; key-hash partitioning spreads it evenly
    unless one key holds a material fraction of all updates (then
    pre-split by time range and stitch the boundary rows).
    """
    w = W.partitionBy(*keys).orderBy(*seq_cols)
    nxt = F.lead(F.col(seq_cols[0])).over(w)
    return updates.select(
        *keys,
        *payload_cols,
        F.col(seq_cols[0]).alias(valid_from),
        nxt.alias(valid_to),
        F.row_number().over(w).cast("int").alias("version"),
        nxt.isNull().alias("is_current"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """Diff two compacted snapshots of the same keyed dataset: one row
    per key present in either side, labeled insert (new only), delete
    (old only), update (payload differs, null-safe), or unchanged.
    Output: keys + old_<payload> + new_<payload> + change.

    This is the incremental-refresh primitive: feed only the
    insert/update/delete rows downstream instead of reprocessing the
    new snapshot wholesale. Plan: ONE full-outer shuffle join on the
    key — both sides are already one-row-per-key snapshots (compact
    with upsert_latest first), so the join input is |keys|, not
    |updates|. At 100 TB, co-partitioning both snapshots on the key
    (bucketed tables) removes even that exchange."""
    o = old.select(
        *keys, *[F.col(c).alias(f"old_{c}") for c in payload_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *keys, *[F.col(c).alias(f"new_{c}") for c in payload_cols],
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in payload_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    return j.withColumn("change", change).drop("__in_old", "__in_new")
