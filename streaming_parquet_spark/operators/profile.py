"""One-pass dataset profiling: per-column row/null counts, min/max,
and a HyperLogLog distinct-cardinality estimate — the data-quality
audit every ingest pipeline runs before training (and the statistics
a layout optimizer or cost model feeds on).

Scale shape: the table is unpivoted to (column, rendered value) rows —
a Generate, no shuffle — then TWO aggregations, both of which
partial-aggregate map-side to fixed-size state: groupBy(column) keeps
ncols rows per task (count/nulls/min/max merge trivially), and the HLL
register build keeps ncols*64 rows per task. So a 100 TB profile costs
one scan + two exchanges whose traffic is O(ncols * tasks), not
O(rows). COUNT(DISTINCT col1), COUNT(DISTINCT col2), ... in one
aggregate would instead Expand every row ncols times AND shuffle every
distinct value — the sketch is what makes wide-table profiling
tractable.

Determinism: values are rendered to strings with explicit CAST (only
pass columns whose cast renders identically in the oracle dialect —
integers and strings; render doubles/timestamps yourself first), and
the HLL uses the portable md5 hash, so the oracle reproduces the
estimate exactly.

Reference parity: none (SURVEY §2.11 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from streaming_parquet_spark.functions.portable import hex_to_i32
from streaming_parquet_spark.operators.sketch import (
    hll_estimate,
    hll_registers,
)


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile ``cols`` of ``df``: one row per column with n_rows,
    n_null, min_s/max_s (string-rendered), and distinct_est (HLL).
    Total rows = len(cols)."""
    pairs = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in cols
    )
    long = df.select(
        F.expr(
            f"stack({len(cols)}, {pairs}) AS (col_name, val)"
        )
    )
    base = long.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("val").isNull().cast("long")).cast("bigint").alias("n_null"),
        F.min("val").alias("min_s"),
        F.max("val").alias("max_s"),
    )
    hashed = long.filter(F.col("val").isNotNull()).select(
        "col_name", F.expr(hex_to_i32("md5(val)")).alias("h")
    )
    regs = hll_registers(hashed, ["col_name"], "h")
    est = hll_estimate(regs, ["col_name"]).withColumnRenamed(
        "hll_est", "distinct_est"
    )
    # Occupied registers: an EXACT lower bound on the cardinality that
    # equals it while distinct values are sparse in the 64 buckets —
    # the honest number in the small range, where the raw harmonic
    # estimator (no linear-counting correction: that needs ln(), which
    # is not bit-portable across engines) overshoots.
    lo = regs.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("distinct_lo")
    )
    return base.join(est, "col_name", "left").join(lo, "col_name", "left")


def dataset_card(df, text_col: str = "text", id_col: str = "doc_id"):
    """One-row DATASET CARD for a document corpus: size, slice
    cardinalities, token total, exact-duplicate rate, mean quality —
    the summary block a training-data release ships with.

    Single aggregate pass (plus the distinct-digest count); every
    statistic is integer-exact or a final rational division, so the
    card is bit-reproducible in any engine at any partitioning: the
    quality mean sums the 2dp score as an INTEGER percentage (summing
    the doubles directly would make the result depend on partial-sum
    order). Output columns: n_docs, n_langs, n_sources,
    est_tokens_total, n_unique_docs, dup_rate, mean_quality."""
    from pyspark.sql import functions as F

    from streaming_parquet_spark.functions.portable import (
        ascii_lower_expr,
        round_to_col,
    )
    from streaming_parquet_spark.operators.text import (
        with_quality,
        with_token_stats,
    )

    scored = with_token_stats(with_quality(df, text_col), text_col)
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        F.sum(F.col("est_tokens").cast("bigint")).alias("est_tokens_total"),
        F.count_distinct(
            F.md5(F.expr(ascii_lower_expr("spark", f"trim({text_col})")))
        ).alias("n_unique_docs"),
        F.sum(
            F.floor(F.col("quality_score") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("__q100"),
    )
    return agg.select(
        "n_docs",
        "n_langs",
        "n_sources",
        "est_tokens_total",
        "n_unique_docs",
        round_to_col(
            F.lit(1.0)
            - F.col("n_unique_docs").cast("double") / F.col("n_docs"),
            4,
        ).alias("dup_rate"),
        round_to_col(
            F.col("__q100").cast("double") / (F.col("n_docs") * 100), 4
        ).alias("mean_quality"),
    )


def corpus_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One-row ORDER-INSENSITIVE content fingerprint of an (id, text)
    corpus: n_docs, n_chars_total, and two independent 32-bit XOR
    digests (fp_a, fp_b — the first and second words of each row's
    md5 over ``id || ':' || text``).  Two materializations of a
    corpus match iff all four values match (up to the 64-bit digest's
    collision odds) — the cheap equality check a shuffled, compacted,
    or re-partitioned copy of a training corpus needs, with no sort
    and no pairwise compare.

    XOR is commutative/associative, so the result is independent of
    partitioning and row order by construction; it is also why the
    fingerprint detects CHANGED rows but, like any XOR digest, a row
    inserted an EVEN number of times cancels — the id inside the
    digest plus n_docs closes that: duplicate ids change n_docs.

    Scale: one full scan, map-side-combined XOR partials, a one-row
    result.  Bit-portable: md5 + integer hex parse + bit_xor agree
    between Spark and DuckDB (no HUGEINT, values < 2^32).  When two
    fingerprints DIFFER, ``operators.cdc.snapshot_diff`` is the
    companion that says WHAT changed (insert/delete/update per id)."""
    from streaming_parquet_spark.functions.portable import hex_word_expr

    # NULL text hashes as '' (and counts 0 chars): concat would
    # otherwise yield a NULL digest that bit_xor silently SKIPS,
    # making a NULL-text row invisible to the digest — and making the
    # manifest-vs-readback comparison (shard_manifest text_col=)
    # disagree on shards containing such rows.  The NULL=='' collapse
    # is the documented trade; rows differing only in that distinction
    # hash identically.
    d = (
        f"md5(concat(CAST({id_col} AS STRING), ':',"
        f" coalesce({text_col}, '')))"
    )
    zero = "CAST(0 AS BIGINT)"
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(
            f"coalesce(sum(CAST(length(coalesce({text_col}, ''))"
            f" AS BIGINT)), {zero})"
        ).alias("n_chars_total"),
        F.expr(
            f"coalesce(bit_xor({hex_word_expr(d, 1)}), {zero})"
        ).alias("fp_a"),
        F.expr(
            f"coalesce(bit_xor({hex_word_expr(d, 9)}), {zero})"
        ).alias("fp_b"),
    )


def batch_manifest(
    df: DataFrame,
    batch_col: str = "ingest_batch",
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_aggs: list | None = None,
) -> DataFrame:
    """Per-batch content manifest over a batch-partitioned corpus
    (the ``streaming.ingest`` corpus table layout): one row per
    ``batch_col`` value with n_docs, n_chars_total, and the same
    fp_a/fp_b XOR digests as :func:`corpus_fingerprint` — the
    batch-level audit trail for an ingest lineage (which trigger
    produced what, did a replay change anything, which batch should a
    rollback drop).  Grouping on the partition column means a
    filtered audit prunes partitions at the scan.

    The whole-corpus fingerprint is recoverable from the manifest
    (XOR the fp columns, sum the counts) — batches compose exactly.

    ``extra_aggs``: additional aggregate Columns folded into the SAME
    groupBy (e.g. the token-shard manifest's ``sum(n_tokens)``) so a
    caller needing one more measure doesn't pay a second full scan +
    join over the data."""
    from streaming_parquet_spark.functions.portable import hex_word_expr

    d = (
        f"md5(concat(CAST({id_col} AS STRING), ':',"
        f" coalesce({text_col}, '')))"
    )
    zero = "CAST(0 AS BIGINT)"
    return df.groupBy(batch_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(
            f"coalesce(sum(CAST(length(coalesce({text_col}, ''))"
            f" AS BIGINT)), {zero})"
        ).alias("n_chars_total"),
        F.expr(
            f"coalesce(bit_xor({hex_word_expr(d, 1)}), {zero})"
        ).alias("fp_a"),
        F.expr(
            f"coalesce(bit_xor({hex_word_expr(d, 9)}), {zero})"
        ).alias("fp_b"),
        *(extra_aggs or []),
    )
