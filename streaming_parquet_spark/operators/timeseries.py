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

from streaming_parquet_spark.functions.portable import round_to_col

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
    # Re-rollup is only sound when every fine bucket nests wholly in
    # its coarse bucket. Weeks straddle month boundaries, so a month
    # tier must NOT be derived from a week tier (a Mon Jan 29 week
    # would roll its Feb events into January).
    if ("week", "month") in zip(grains, grains[1:]):
        raise ValueError(
            "week -> month tiering is invalid: ISO weeks straddle "
            "month boundaries; derive the month tier from day or finer"
        )

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


def merge_rollup(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental continuous-aggregate maintenance: merge a rollup
    built from a NEW batch into an existing materialized rollup.
    Count/sum measures are mergeable partials — they add — so the
    refreshed rollup is a union + re-aggregate over BUCKET rows:
    shuffle cost is O(|base buckets| + |delta buckets|), never a
    rescan of the raw corpus. Rollup schemas must match
    (granularity, bucket_ts, *keys, n, total — hypertable_rollup's
    output); the merged result is bit-identical to recomputing the
    rollup over the union of the raw inputs (gated as
    ``events_incremental_rollup``: same oracle as the full rollup).

    At 100 TB this IS the refresh path: the base rollup is a stored
    table a million times smaller than the raw events; each arriving
    batch rolls up alone (partial-aggregated on its own rows) and
    merges in bucket space. Deletes/late corrections compose the same
    way with negated measures."""
    if set(base.columns) != set(delta.columns):
        raise ValueError(
            f"rollup schemas differ: {base.columns} vs {delta.columns}"
        )
    group = [c for c in base.columns if c not in ("n", "total")]
    return (
        base.unionByName(delta)
        .groupBy(*group)
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("total").cast("bigint").alias("total"),
        )
    )


def anomaly_zscore(
    df: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    threshold: float = 3.0,
    scale: int = 100,
) -> DataFrame:
    """Per-group z-score anomaly flagging with EXACT moments: the
    group's mean and variance come from integer sums of
    floor(value*scale) and its square — bit-identical under any
    partial-aggregation order, where naive double sums drift with
    partitioning (and diverge from any oracle). z is then two FP ops
    from exact integers.

    Plan: one narrow agg (count + 2 integer sums per group, broadcast
    back) + one corpus scan for the filter — two scans, but the corpus
    itself is never shuffled (the window rendering would shuffle every
    row to sort within groups). Zero-variance groups flag nothing.

    Overflow: |v*scale| <= S per row bounds the squared sum by
    S^2 * rows; with S ~ 1e4 that is exact to ~1e10 rows per group —
    shard-and-reaggregate beyond."""
    keys = keys or []
    fixed = F.floor(F.col(value_col).cast("double") * scale).cast("bigint")
    stats = (
        df.withColumn("__f", fixed)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__f").alias("__s1"),
            F.sum(F.col("__f") * F.col("__f")).alias("__s2"),
        )
    )
    j = df.withColumn("__f", fixed)
    j = j.join(F.broadcast(stats), keys) if keys else j.crossJoin(
        F.broadcast(stats)
    )
    mean = F.col("__s1") / F.col("__n")
    var = F.col("__s2") / F.col("__n") - mean * mean
    z = (F.col("__f") - mean) / F.sqrt(var)
    return (
        j.withColumn("__z", z)
        .filter(F.sqrt(var) > 0)
        .filter(F.abs(F.col("__z")) >= threshold)
        .withColumn("zscore", round_to_col(F.col("__z"), 4))
        .drop("__f", "__n", "__s1", "__s2", "__z")
    )


def ohlc_bars(
    df: DataFrame,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value_col: str = "cents",
    tiebreak_col: str = "event_id",
    grain: str = "hour",
) -> DataFrame:
    """Resample a point series into OHLC bars: one row per
    (bucket, *keys) with open/high/low/close of ``value_col`` plus n
    and volume (sum). ``value_col`` should already be exact (integer
    cents) so volume sums identically under any aggregation order.

    Shape choice: min_by/max_by over the (ts, tiebreak) struct — a
    pure aggregate, so every map task reduces its partition to one
    candidate per bar before the exchange (first/last via a sorted
    window would shuffle and sort every raw point). The tiebreak
    column makes open/close deterministic when two points share a
    timestamp. This is the bar-building shape that survives 100 TB of
    ticks: shuffle traffic is O(bars), not O(points)."""
    keys = keys or []
    ordk = F.struct(
        F.col(ts_col).alias("t"), F.col(tiebreak_col).alias("i")
    )
    v = F.col(value_col)
    return df.groupBy(
        F.date_trunc(grain, F.col(ts_col)).alias("bucket_ts"), *keys
    ).agg(
        F.min_by(v, ordk).alias("open"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max_by(v, ordk).alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(v).cast("bigint").alias("volume"),
    )


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Ordered funnel conversion: for each user, how far through the
    ``steps`` sequence they progressed, where each step must occur
    STRICTLY after the previous step's matched event. Output one row
    per step: (step, step_name, users reaching that step).

    Semantics match the classic sequential-min chain (step i's match
    is the earliest step-i event after the step-(i-1) match; greedy
    earliest-match is optimal, so a single forward scan reproduces
    it). Plan: ONE shuffle — collect each user's events into a sorted
    array, then a JVM aggregate() scan advances a (stage, last_ts)
    accumulator per user; the per-step counts are a global aggregate
    of 1 row per user. The self-join-per-step rendering would cost
    len(steps) corpus shuffles; this costs one, and the scan state is
    2 fields regardless of funnel length."""
    n = len(steps)
    evs = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(tiebreak_col).alias("i"),
                F.col(type_col).alias("y"),
            )
        )
    )
    steps_arr = "array(" + ", ".join(f"'{s}'" for s in steps) + ")"
    scan = F.expr(
        f"""
        aggregate(
          __evs,
          named_struct('stage', 0, 'last', CAST(NULL AS TIMESTAMP)),
          (acc, e) -> CASE
            WHEN acc.stage < {n}
                 AND e.y = element_at({steps_arr}, acc.stage + 1)
                 AND (acc.stage = 0 OR e.t > acc.last)
            THEN named_struct('stage', acc.stage + 1, 'last', e.t)
            ELSE acc END,
          acc -> acc.stage
        )
        """
    )
    per_user = (
        df.filter(F.col(type_col).isin(steps))
        .groupBy(user_col)
        .agg(evs.alias("__evs"))
        .select(scan.alias("stage"))
    )
    counts = per_user.agg(
        *[
            F.coalesce(
                F.sum((F.col("stage") >= i).cast("long")), F.lit(0)
            ).alias(f"u{i}")
            for i in range(1, n + 1)
        ]
    )
    stack_args = ", ".join(
        f"{i}, '{steps[i - 1]}', u{i}" for i in range(1, n + 1)
    )
    return counts.select(
        F.expr(
            f"stack({n}, {stack_args}) AS (step, step_name, users)"
        )
    ).select(F.col("step").cast("int"), "step_name", "users")


def ewma_fixed(
    df: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    value_col: str,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per key in EXACT integer
    arithmetic (alpha = 1/2): y_1 = v_1, y_t = (v_t + y_{t-1}) DIV 2
    (floor). The floor division makes the recurrence genuinely
    sequential — no closed form, no window rendering — so this is the
    canonical per-key ordered stateful op: groupBy the key,
    applyInPandas scans each key's history in (seq_cols) order.

    Scale shape: ONE shuffle (repartition on the key +
    sortWithinPartitions), then a single mapInPandas pass per
    partition — NOT applyInPandas, whose per-group pandas frame costs
    milliseconds each and dominates when keys are many and histories
    short (measured 6.3 s -> sub-second on the 1500-key fixture). The
    scan carries one accumulator per key across Arrow batch
    boundaries, so state is O(keys per partition) and a key's history
    never needs to fit one batch. Keys are independent — 1000
    executors each own their key range.

    Exactness: inputs are integers (cents), the recurrence is integer,
    so results are bit-identical under any partitioning and
    reproducible by any engine with floor division — which is how the
    DuckDB recursive-CTE oracle checks it."""
    out_fields = df.schema.fields
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in out_fields
    ) + f", {out_col} bigint"

    def scan(batches):
        # Partition-local sequential scan. Rows arrive key-contiguous
        # and seq-ordered (sortWithinPartitions below); `last` carries
        # each key's accumulator across Arrow batch boundaries.
        last: dict = {}
        for pdf in batches:
            key_arrays = [pdf[k].to_numpy() for k in keys]
            vals = pdf[value_col].to_numpy()
            out = vals.copy()
            for i in range(len(vals)):
                kt = tuple(a[i] for a in key_arrays)
                acc = last.get(kt)
                acc = vals[i] if acc is None else (vals[i] + acc) // 2
                last[kt] = acc
                out[i] = acc
            yield pdf.assign(**{out_col: out})

    parted = df.repartition(*[F.col(k) for k in keys]).sortWithinPartitions(
        *keys, *seq_cols
    )
    return parted.mapInPandas(scan, schema=schema)


def ts_windows(
    df: DataFrame,
    m: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 100,
) -> DataFrame:
    """Segment each key's time-ordered series into disjoint windows of
    ``m`` points (incomplete tails dropped) as exact fixed-point value
    arrays: output (user, win, vals array<bigint>, s1, s2) where s1/s2
    are the window's integer sum and sum-of-squares (the z-normalization
    moments, exact under any aggregation order).

    One shuffle on the key for the row_number window; the per-window
    arrays are built by array_sort(collect_list(struct(rn, v))) so the
    element order is total regardless of partitioning."""
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy(user_col).orderBy(ts_col, "event_id")
        if "event_id" in df.columns
        else W.partitionBy(user_col).orderBy(ts_col)
    )
    fixed = F.floor(F.col(value_col).cast("double") * scale).cast("bigint")
    seg = (
        df.withColumn("__rn", rn)
        .withColumn("__f", fixed)
        .withColumn("win", F.expr(f"CAST((__rn - 1) DIV {m} AS INT)"))
    )
    return (
        seg.groupBy(user_col, "win")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("__rn", "__f"))),
                lambda x: x["__f"],
            ).alias("vals"),
            F.sum("__f").alias("s1"),
            F.sum(F.col("__f") * F.col("__f")).alias("s2"),
        )
        .filter(F.col("__n") == m)
        .drop("__n")
    )


def ts_similarity_topk(
    series: DataFrame,
    query_user: int,
    query_win: int = 0,
    k: int = 10,
    m: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Top-k most similar subsequences to a query window under
    z-normalized squared Euclidean distance — whole-series-matching
    similarity search over streaming event series (the shape of
    distributed time-series search engines; UCR-suite style
    z-normalized distance, public literature).

    Windows z-normalize from their EXACT integer moments (mean s1/m,
    var s2/m - mean^2); the distance sum is a left-associated unrolled
    expression over the m positions — deterministic IEEE order, so the
    oracle reproduces every double bit-for-bit. Zero-variance windows
    are excluded (z-normalization undefined).

    Plan: one shuffle to build windows, broadcast the 1-row query
    window, per-row distance expression, WindowGroupLimit top-k. At
    100 TB: windows are built once and stored; each query is a
    broadcast + scan — embarrassingly parallel."""
    w = ts_windows(series, m, user_col, ts_col, value_col)
    qw = w.filter(
        (F.col(user_col) == query_user) & (F.col("win") == query_win)
    ).select(
        F.col("vals").alias("q_vals"),
        F.col("s1").alias("q_s1"),
        F.col("s2").alias("q_s2"),
    )
    cand = w.filter(
        ~((F.col(user_col) == query_user) & (F.col("win") == query_win))
    )
    j = cand.crossJoin(F.broadcast(qw))

    def znorm(vals: str, s1: str, s2: str, i: int) -> str:
        mean = f"(CAST({s1} AS DOUBLE) / {m})"
        var = f"(CAST({s2} AS DOUBLE) / {m} - {mean} * {mean})"
        return f"((element_at({vals}, {i + 1}) - {mean}) / sqrt({var}))"

    terms = []
    for i in range(m):
        d = (
            f"({znorm('vals', 's1', 's2', i)}"
            f" - {znorm('q_vals', 'q_s1', 'q_s2', i)})"
        )
        terms.append(f"{d} * {d}")
    dist = "(" + " + ".join(terms) + ")"
    var_ok = (
        f"(CAST(s2 AS DOUBLE) / {m}"
        f" - (CAST(s1 AS DOUBLE) / {m}) * (CAST(s1 AS DOUBLE) / {m})) > 0"
    )
    q_var_ok = (
        f"(CAST(q_s2 AS DOUBLE) / {m}"
        f" - (CAST(q_s1 AS DOUBLE) / {m}) * (CAST(q_s1 AS DOUBLE) / {m})) > 0"
    )
    from pyspark.sql import Window as W2

    # ORDER BY + LIMIT compiles to TakeOrderedAndProject (per-partition
    # top-k, then a k-row merge on the driver side of the exchange) —
    # never a global sort; the rank window then runs over k rows only.
    topk = (
        j.filter(F.expr(var_ok)).filter(F.expr(q_var_ok))
        .withColumn("dist_raw", F.expr(dist))
        .orderBy(
            F.col("dist_raw").asc(), F.col(user_col).asc(),
            F.col("win").asc(),
        )
        .limit(k)
    )
    wrank = W2.partitionBy(F.lit(1)).orderBy(
        F.col("dist_raw").asc(), F.col(user_col).asc(), F.col("win").asc()
    )
    return (
        topk.withColumn("rank", F.row_number().over(wrank).cast("int"))
        .select(
            user_col, "win", round_to_col("dist_raw", 4).alias("dist"), "rank"
        )
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    bucket (cohort), counted distinct in each subsequent bucket offset
    — the product-analytics staple. All bucketing is integer epoch-day
    arithmetic (no calendar functions — identical in any engine).

    Plan at 100 TB: one groupBy(user) for first-seen (partial-
    aggregated min), join back on the user key (co-partitioned with
    the activity shuffle), then a (cohort, offset) count-distinct —
    whose exchange carries (cohort, offset, user) triples, i.e. the
    activity relation deduplicated, never raw events. Output is
    |cohorts| x |offsets| rows.

    Output: cohort (bucket index of first activity), week_offset
    (buckets since first), n_users."""
    days = df.select(
        F.col(user_col).alias("u"),
        F.expr(
            f"CAST(FLOOR(CAST({ts_col} AS DOUBLE) / 86400) AS BIGINT)"
        ).alias("d"),
    )
    first = days.groupBy("u").agg(F.min("d").alias("d0"))
    return (
        days.join(first, "u")
        .select(
            F.expr(f"d0 DIV {bucket_days}").alias("cohort"),
            F.expr(f"(d - d0) DIV {bucket_days}").alias("week_offset"),
            "u",
        )
        .groupBy("cohort", "week_offset")
        .agg(F.count_distinct("u").alias("n_users"))
    )


def rfm_scores(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    buckets: int = 5,
) -> DataFrame:
    """RFM (recency / frequency / monetary) user scoring — the classic
    behavioral segmentation: per user, days since last activity,
    activity count, and integer-cents spend, each then scored 1..5 by
    ntile over a TOTAL order (metric, user) so the bucketing is
    deterministic and engine-portable. Higher score = better (most
    recent, most frequent, highest spend).

    Plan: one partial-aggregated groupBy(user) for the three metrics
    (the exchange carries one row per user), then three window
    rankings over the user relation — at 100 TB that relation is
    |users|, orders of magnitude below |events|, and each ntile is a
    single sort of it. The reference epoch is max(ts) over the data
    (yesterday's data scores identically tomorrow).

    Output: user, recency_days, frequency, monetary_cents,
    r_score, f_score, m_score."""
    from pyspark.sql import Window as W

    days = F.expr(f"CAST(FLOOR(CAST({ts_col} AS DOUBLE) / 86400) AS BIGINT)")
    per_user = (
        df.select(
            F.col(user_col).alias("user"),
            days.alias("d"),
            F.expr(f"CAST(FLOOR({value_col} * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("user")
        .agg(
            F.max("d").alias("last_d"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("cents").alias("monetary_cents"),
        )
    )
    ref = per_user.agg(F.max("last_d").alias("__ref"))
    scored = per_user.crossJoin(F.broadcast(ref)).withColumn(
        "recency_days", (F.col("__ref") - F.col("last_d")).cast("bigint")
    )
    r_w = W.orderBy(F.col("recency_days").desc(), F.col("user"))
    f_w = W.orderBy(F.col("frequency").asc(), F.col("user"))
    m_w = W.orderBy(F.col("monetary_cents").asc(), F.col("user"))
    return scored.select(
        "user",
        "recency_days",
        "frequency",
        "monetary_cents",
        F.ntile(buckets).over(r_w).cast("int").alias("r_score"),
        F.ntile(buckets).over(f_w).cast("int").alias("f_score"),
        F.ntile(buckets).over(m_w).cast("int").alias("m_score"),
    )
