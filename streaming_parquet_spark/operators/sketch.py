"""Fixed-memory frequency/cardinality sketches, built deterministically
from portable hash arithmetic so the DuckDB oracle reproduces every
register and counter bit-for-bit (public algorithms: Flajolet et al.
2007 HyperLogLog; Cormode & Muthukrishnan 2005 count-min).

Why sketches at 100 TB: COUNT(DISTINCT x) shuffles every distinct
value; a HLL register file is 64 integers per group no matter how many
distinct values exist, and registers MERGE by max — so partial
aggregation collapses each map task to one register set before the
exchange. Likewise a count-min sketch answers frequency queries from
d*w counters instead of a corpus-wide groupBy(term) — and counters
merge by addition, so partials combine map-side too.

Determinism: Spark's own approx_count_distinct is deterministic but
its hash is JVM-internal — no oracle could check it. These sketches
use the repo's md5-based 32-bit hash (functions.portable.hex_to_i32)
and universal-hash coefficients, both expressible in ANSI SQL, so the
correctness gate verifies the SKETCH ITSELF, not just a tolerance.

Reference parity: none (SURVEY §2.11 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from streaming_parquet_spark.functions.portable import (
    MERSENNE31,
    _coeff_a,
    _coeff_b,
)

#: HLL bias-correction constant for m=64 registers (Flajolet et al.)
_HLL_ALPHA_64 = 0.709


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    hash_col: str,
    p: int = 6,
) -> DataFrame:
    """HLL register file per group from a 32-bit ``hash_col`` in
    [0, 2^32): bucket = low p bits, rho = leading-zero count of the
    remaining (32-p) bits + 1 (0 for empty buckets, handled at
    estimate time). One groupBy — and max() partial-aggregates, so
    each map task emits <= 2^p rows per group regardless of input
    size. That IS the sketch property."""
    m = 1 << p
    bits = 32 - p
    w = f"CAST(floor({hash_col} / {m}) AS BIGINT)"
    rho = (
        f"CASE WHEN {w} = 0 THEN {bits + 1} "
        f"ELSE {bits} - length(bin({w})) + 1 END"
    )
    return (
        df.select(
            *group_cols,
            F.expr(f"CAST({hash_col} % {m} AS INT)").alias("bucket"),
            F.expr(rho).cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    regs: DataFrame, group_cols: list[str], p: int = 6
) -> DataFrame:
    """Harmonic-mean HLL estimate per group from a register file.
    The indicator sum uses exact integers (2^(maxrho - rho) per
    register, empty registers contribute 2^maxrho), so the only FP op
    is one final division of exact operands — bit-identical in any
    engine. No small/large-range corrections (they need ln(); the raw
    estimator keeps the oracle exact and is accurate in the fixture's
    range)."""
    if p != 6:
        raise ValueError("alpha constant tabulated for p=6 (m=64) only")
    m = 1 << p
    maxrho = 32 - p + 1
    numer = _HLL_ALPHA_64 * m * m * (1 << maxrho)
    term = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {maxrho} - rho)"
    )
    return (
        regs.groupBy(*group_cols)
        .agg(
            F.sum(term).alias("__s"),
            F.count(F.lit(1)).alias("__nb"),
        )
        .select(
            *group_cols,
            F.round(
                F.lit(numer)
                / (
                    F.col("__s")
                    + (F.lit(m) - F.col("__nb"))
                    * F.lit(1 << maxrho).cast("long")
                ),
                2,
            ).alias("hll_est"),
        )
    )


def hll_oracle_sql(
    items_cte: str, group_col: str, hash_expr: str, p: int = 6
) -> str:
    """DuckDB SQL computing the same registers + estimate from a CTE
    ``items`` (columns: ``group_col``, item hash via ``hash_expr``)."""
    m = 1 << p
    bits = 32 - p
    maxrho = bits + 1
    numer = repr(_HLL_ALPHA_64 * m * m * (1 << maxrho))
    w = f"CAST(floor(h / {m}) AS BIGINT)"
    return f"""
    WITH {items_cte},
    hashed AS (
      SELECT {group_col} AS g, {hash_expr} AS h FROM items
    ),
    regs AS (
      SELECT g, CAST(h % {m} AS INT) AS bucket,
             MAX(CASE WHEN {w} = 0 THEN {maxrho}
                 ELSE {bits} - length(bin({w})) + 1 END) AS rho
      FROM hashed GROUP BY 1, 2
    )
    SELECT g AS {group_col},
           ROUND({numer} / (SUM((1::BIGINT << ({maxrho} - rho)))
                 + ({m} - COUNT(*)) * (1::BIGINT << {maxrho})), 2)
             AS hll_est
    FROM regs GROUP BY 1
    """


def cms_counters(
    df: DataFrame, hash_col: str, d: int = 3, w: int = 1024
) -> DataFrame:
    """Count-min counter table (row, bucket, c) over item occurrences:
    row i uses the universal hash (A_i*x + B_i) mod (2^31-1) mod w.
    One groupBy over the exploded (row, bucket) pairs; counters
    partial-aggregate map-side, and the whole table is d*w rows —
    broadcastable no matter the corpus size."""
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    F.expr(
                        f"CAST((({_coeff_a(i)} * {hash_col}"
                        f" + {_coeff_b(i)}) % {MERSENNE31}) % {w} AS INT)"
                    ).alias("bucket"),
                )
                for i in range(d)
            ]
        )
    )
    return (
        df.select(rows.alias("rb"))
        .select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_join_size(
    counters_a: DataFrame, counters_b: DataFrame, d: int = 3
) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches over
    the join keys: |A JOIN B| ~= min over rows of the bucket-wise
    inner product sum(cA * cB) (Cormode & Muthukrishnan 2005, §4.2 —
    the AMS-style inner-product estimate, upward-biased by hash
    collisions). One row out: (join_size_est).

    This is what a cost-based planner wants BEFORE running a join: the
    sketches are d*w rows each regardless of table size, merge by
    addition across partitions/partial loads, and the estimate is a
    broadcast-joinable aggregate — no scan of either table at
    planning time.

    SIZE w TO THE WORKLOAD: the additive error is ~|A|*|B|/w per row
    (min over d rows tightens the constant, not the rate), so w must
    exceed |A|*|B| / (acceptable absolute error). The probe-side
    default w=1024 is far too small for join estimation over
    10^4-row-plus tables — pass the same larger w to both
    cms_counters calls (sketch size is still d*w rows; w=2^20 is 3 MB
    of counters and resolves joins of 10^5-row tables to ~10%)."""
    a = counters_a.select("row", "bucket", F.col("c").alias("ca"))
    b = counters_b.select("row", "bucket", F.col("c").alias("cb"))
    per_row = (
        a.join(b, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
    )
    return per_row.agg(F.min("ip").cast("bigint").alias("join_size_est"))


def cms_probe(
    counters: DataFrame,
    candidates: DataFrame,
    hash_col: str,
    d: int = 3,
    w: int = 1024,
) -> DataFrame:
    """Estimate each candidate's frequency: min over the d counters its
    hashes select. Broadcast the counter table (d*w rows); the join is
    a d-way explode + equi-join + min_by aggregate. Estimates
    overcount only (collisions add, never subtract) — the classic CMS
    one-sided guarantee, which the parity test asserts."""
    probes = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    F.expr(
                        f"CAST((({_coeff_a(i)} * {hash_col}"
                        f" + {_coeff_b(i)}) % {MERSENNE31}) % {w} AS INT)"
                    ).alias("bucket"),
                )
                for i in range(d)
            ]
        )
    )
    keep = [c for c in candidates.columns]
    # LEFT join: a probed bucket with NO counter row proves count 0
    # (stronger than any collision-inflated counter) — an inner join
    # would silently drop such candidates from the output entirely.
    return (
        candidates.withColumn("pr", probes)
        .select(*keep, "pr.row", "pr.bucket")
        .join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy(*keep)
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0)))
            .cast("bigint")
            .alias("cms_est")
        )
    )
