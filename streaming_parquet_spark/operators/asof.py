"""As-of (nearest-prior) join — a temporal operator Spark's built-in
joins don't express directly (SURVEY §2.4: absent in the reference;
extension).

Spark-first rendering: the UNION + WINDOW trick, not a join.

    tag left rows side=1, right rows side=0
    union on (keys, time, side, right-payload or null)
    per key, ordered by (time, side):
        last(payload IGNORE NULLS) over rows unbounded preceding..current
    keep side=1 rows

One shuffle on the key, no row explosion — a range-condition theta join
(``l.t >= r.t``) would expand to |left| x |right| per key before
deduplication; this stays |left| + |right|. Ties at equal time resolve
to the right row (side 0 sorts first), i.e. ``<=`` as-of semantics —
matching DuckDB's native ASOF JOIN, which the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    payload: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the nearest right row
    with the same key — the latest with ``right_time <= left_time``
    (``direction='backward'``, the default) or the earliest with
    ``right_time >= left_time`` (``'forward'``); null when none.

    ``tolerance`` (a SQL interval string, e.g. ``'5 minutes'``) bounds
    the match distance: a nearest row farther than the tolerance yields
    nulls, the pandas ``merge_asof(tolerance=...)`` contract.

    Output: all left columns + one ``<payload>_asof`` column per payload
    column.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    # All payload columns (plus the matched right time, for tolerance)
    # ride in ONE struct so F.last(ignorenulls) picks a single right row
    # atomically: the struct itself is NULL only on left-side rows, so a
    # matched right row's NULL payload values are preserved (and columns
    # can never mix values from different right rows).
    lt = F.col(left_time)
    rt_type = right.schema[right_time].dataType.simpleString()
    struct_type = (
        "struct<__rt:" + rt_type + ","
        + ",".join(
            f"{p}:{right.schema[p].dataType.simpleString()}" for p in payload
        )
        + ">"
    )
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        lt.alias("__t"),
        F.lit(None).cast(struct_type).alias("__p"),
    )
    # NULL right times can never be "nearest" — drop them before the
    # union (pandas merge_asof rejects them outright).
    r_tagged = right.filter(F.col(right_time).isNotNull()).select(
        *[F.col(c).alias(c) for c in on],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on],
        F.lit(0).alias("__side"),
        F.col(right_time).alias("__t"),
        F.struct(
            F.col(right_time).alias("__rt"),
            *[F.col(p).alias(p) for p in payload],
        ).alias("__p"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # Backward scans time ascending (latest prior right row is the last
    # non-null); forward scans descending (earliest following row is the
    # last non-null when walking from the future toward each left row).
    # Either way right rows at the SAME time must sort before the left
    # row so ties match inclusively — side 0 < 1 handles both.  Left
    # rows with a NULL time sort FIRST in both directions (explicit
    # null ordering — Spark's default asc=nulls-first / desc=nulls-last
    # would otherwise hand forward-mode NULL rows the earliest right
    # row): scanning from the front they see no right rows yet, so the
    # running last(ignorenulls) is NULL and they stay unmatched.
    order = (
        [F.col("__t").asc_nulls_first(), F.col("__side")]
        if direction == "backward"
        else [F.col("__t").desc_nulls_first(), F.col("__side")]
    )
    w = (
        W.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("__side"),
        F.col("__t").alias("__lt"),
        F.last("__p", ignorenulls=True).over(w).alias("__match"),
    )
    match = F.col("__match")
    if tolerance is not None:
        dist = (
            (F.col("__lt") - match["__rt"])
            if direction == "backward"
            else (match["__rt"] - F.col("__lt"))
        )
        match = F.when(
            dist <= F.expr(f"INTERVAL {tolerance}"), F.col("__match")
        )
    return out.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[match[p].alias(f"{p}{suffix}") for p in payload],
    )
