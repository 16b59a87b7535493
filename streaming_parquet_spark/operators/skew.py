"""Skew utilities: diagnosis (skew_report) + mitigation (salted_join).

AQE's skew-join splitting (on by default in session.get_spark) handles
most skew at runtime by splitting oversized partitions. Salting is the
complementary *plan-level* tool for pathological hot keys — a handful of
join keys carrying a double-digit percentage of the rows (the classic
boilerplate-document or null-key case in web-scale corpora):

  big side:   each row gets a deterministic salt in [0, salt)
  small side: exploded x salt (one copy per salt value)
  join key:   (key..., salt) — the hot key's rows now spread over
              ``salt`` reducers instead of one

Deterministic salt (hash of the whole row, not rand()) keeps plans
replayable and testable. Cost: small side inflates x salt — use for
genuinely small/medium dimension sides, or pre-filter to the hot keys
and union a salted hot-path with an unsalted cold-path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``on`` with key salting.

    Result is identical to ``big.join(small, on, how)`` for inner/left
    joins; the shuffle distributes each join key over ``salt`` buckets.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got: {how}")
    salt_col = F.pmod(
        F.hash(*[F.col(c) for c in big.columns]), F.lit(salt)
    ).cast("int")
    big_s = big.withColumn("__salt", salt_col)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_s.join(small_s, on + ["__salt"], how)
    return out.drop("__salt")


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 20,
    target_rows_per_task: int | None = None,
) -> DataFrame:
    """Diagnose join/agg key skew BEFORE paying for the shuffle: one
    row per top-``top_n`` hottest key with its count, share of all
    rows, the skew factor (count / mean-rows-per-key), and the salt
    factor :func:`salted_join` would need to spread that key across
    tasks of ~``target_rows_per_task`` rows (default: total rows /
    defaultParallelism — i.e. "no key bigger than an average task").

    Reading the output: skew_factor ~ 1 everywhere means hashing
    already balances; a handful of keys with double-digit pct_rows is
    the salted-join / cap_blocks case; millions of near-unique keys
    with skew_factor ~ 1 but huge n_keys means the problem is volume,
    not skew.  ``suggested_salt`` is 1 whenever the key already fits a
    task.

    Scale: one groupBy (map-side combined) + a top-N — the same cost
    as the aggregation being diagnosed, minus its downstream work.
    All integer-exact except the two documented divisions, so the
    report reproduces at any partitioning."""
    spark = df.sparkSession
    n = int(top_n)
    keyed = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    totals = keyed.agg(
        F.expr("coalesce(sum(cnt), CAST(0 AS BIGINT))").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    per_task = (
        int(target_rows_per_task)
        if target_rows_per_task is not None
        else None
    )
    out = (
        keyed.orderBy(F.desc("cnt"), *key_cols)
        .limit(n)
        .crossJoin(F.broadcast(totals))
    )
    task_rows = (
        F.lit(per_task)
        if per_task is not None
        else F.greatest(
            F.expr(
                f"CAST(n_rows / {spark.sparkContext.defaultParallelism}"
                " AS BIGINT)"
            ),
            F.lit(1),
        )
    )
    from streaming_parquet_spark.functions.portable import round_to_col

    return out.select(
        *key_cols,
        "cnt",
        # portable floor-round, not native round(): round_to_expr
        # documents why native ROUND on doubles diverges between Spark
        # and DuckDB on half-way binary values — this report is
        # pytest-gated today, but an oracle gate added later must not
        # inherit a latent hash mismatch
        round_to_col(
            F.col("cnt") / F.col("n_rows") * 100, 2
        ).alias("pct_rows"),
        # divide FIRST: cnt * n_keys as BIGINT overflows at the scale
        # this module targets (1e9-row hot key x 1e10 keys > 2^63 —
        # silent wraparound or an ANSI ArithmeticException on exactly
        # the key being diagnosed); cnt/n_rows is double, so the
        # product stays in float range
        round_to_col(
            F.col("cnt") / F.col("n_rows") * F.col("n_keys"), 2
        ).alias("skew_factor"),
        F.greatest(
            F.ceil(F.col("cnt") / task_rows).cast("int"),
            F.lit(1),
        ).alias("suggested_salt"),
        "n_rows",
        "n_keys",
    )
