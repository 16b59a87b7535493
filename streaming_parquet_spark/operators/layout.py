"""Multi-dimensional data layout: Z-order (Morton) keys for
write-time clustering. Sorting a table by the bit-interleaved key of
several filter columns makes every one of those columns LOCALLY dense
inside each output file, so parquet min/max footer stats prune files
for predicates on ANY of the dimensions — the layout trick behind
Delta/Iceberg OPTIMIZE ZORDER BY, expressed as plain Spark column
expressions (public technique: Morton 1966 ordering).

Why not just sort by (a, b)? A lexicographic sort clusters only its
leading column; files are effectively random in b, so b-predicates
scan everything. The Z-curve gives every dimension ~1/n of the key's
bits, so a 1/r range in any dimension prunes ~1/r of the files.

Everything is shiftleft/bitwise-and expressions — JVM codegen, no
UDF; the final repartitionByRange+sortWithinPartitions is the one
exchange a layout rewrite fundamentally requires (it IS the
clustering).

Reference parity: none (SURVEY §2.11 extension surface).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def zorder_key(cols: list[F.Column], bits: int = 8) -> F.Column:
    """Interleave the low ``bits`` bits of each (non-negative int)
    column into one Morton key: bit b of column j lands at position
    b*len(cols)+j. Callers normalize each dimension into [0, 2^bits)
    first (modular bucketing or rank-based binning). The expression
    unrolls to bits*len(cols) shift/and/or terms — whole-stage
    codegen, constant-folded shifts."""
    n = len(cols)
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = c.cast("long")
        for b in range(bits):
            bit = F.shiftright(v, b).bitwiseAND(F.lit(1).cast("long"))
            key = key + F.shiftleft(bit, b * n + j)
    return key


def assign_contiguous_ids(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "row_id",
    start: int = 0,
) -> DataFrame:
    """Assign gapless global row ids 0..n-1 in ``order_cols`` order —
    the distributed zipWithIndex (sample-id assignment, shard
    manifests, stable example numbering). ``order_cols`` must be a
    total order for a deterministic result.

    The naive rendering — row_number() over one global ORDER BY — runs
    a single-partition window: one task sorts the corpus. This does
    the classic two-phase form instead: range-partition + local sort,
    pin the partitioning (localCheckpoint), count rows per partition
    (an O(#partitions) aggregate), turn counts into cumulative offsets
    with a window over that TINY frame, then broadcast the offsets
    back and add a per-partition row_number. Every corpus-sized step
    is parallel; only the offset table (one row per partition) is
    serial. Equivalent to the global window row-for-row, which is how
    the oracle checks it."""
    from pyspark.sql import Window as W

    parted = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        # Pin the range partitioning: the sampled range boundaries must
        # be identical in the counts job and the id job.
        .localCheckpoint()
    )
    counts = parted.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    w_off = W.orderBy("__pid").rowsBetween(
        W.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    w_local = W.partitionBy("__pid").orderBy(*order_cols)
    return (
        parted.join(F.broadcast(offsets), "__pid")
        .withColumn(
            out_col,
            (
                F.row_number().over(w_local).cast("long")
                + F.col("__off")
                + F.lit(start - 1).cast("long")
            ),
        )
        .drop("__pid", "__off")
    )


def zorder_repartition(
    df: DataFrame,
    cols: list[F.Column],
    bits: int = 8,
    num_files: int | None = None,
) -> DataFrame:
    """Cluster ``df`` along the Z-curve of ``cols``: range-partition on
    the Morton key (AQE-sized unless ``num_files`` pins it) and sort
    within partitions, so every output file covers a compact Z-range —
    tight min/max stats in every interleaved dimension. Write the
    result with any sink; the key column is dropped."""
    key = zorder_key(cols, bits).alias("__z")
    out = df.withColumn("__z", key)
    out = (
        out.repartitionByRange(num_files, "__z")
        if num_files
        else out.repartitionByRange("__z")
    )
    return out.sortWithinPartitions("__z").drop("__z")


def _managed_location(spark, table: str) -> str:
    """Canonical managed-table path under the local warehouse for a
    possibly database-qualified name: ``wh/tbl`` for the default
    database, ``wh/<db>.db/tbl`` otherwise — the Hive-layout rule the
    catalog itself applies."""
    wh = str(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).removeprefix("file:")
    if "." in table:
        db, _, tbl = table.rpartition(".")
    else:
        db, tbl = spark.catalog.currentDatabase(), table
    if db.lower() in ("", "default"):
        return os.path.join(wh, tbl.lower())
    return os.path.join(wh, f"{db.lower()}.db", tbl.lower())


def _looks_like_spark_table_dir(loc: str) -> bool:
    """True only for a directory whose entries are Spark table output
    (part-files, _SUCCESS, checksums, _temporary, partition dirs) —
    the orphan-cleanup guard against deleting an unrelated directory
    that merely shares the table's name."""
    try:
        entries = os.listdir(loc)
    except OSError:
        return False
    for e in entries:
        ok = (
            e.startswith(("part-", ".part-", "_SUCCESS", "._SUCCESS"))
            or e in ("_temporary",)
            or ("=" in e and os.path.isdir(os.path.join(loc, e)))
        )
        if not ok:
            return False
    return True


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    overwrite: bool = True,
) -> None:
    """Persist a relation as a BUCKETED managed table: rows are hash-
    partitioned into ``buckets`` files by ``key`` and sorted by it
    within each bucket. Every future equi-join or aggregation on the
    key then reads co-located, pre-sorted input — Catalyst elides BOTH
    the exchange and the sort (a shuffle-free SortMergeJoin), the
    bucketing win the task-scheduler cannot give you at runtime.

    At 100 TB this is THE repeated-join amortization: pay one layout
    shuffle at ingest, join for free forever after. The repartition
    before write makes exactly one file per bucket, which is what lets
    Spark trust the sort order at read time (many files per bucket
    forces a merge-sort re-sort)."""
    spark = df.sparkSession
    if overwrite:
        # Dropping a MANAGED table removes its data through the catalog
        # — the path that knows the table's real location, whatever the
        # database. The manual cleanup below is ONLY for the orphan
        # case: a crashed prior session left the managed LOCATION
        # behind with no catalog entry, so saveAsTable refuses the
        # name. Guards (ADVICE r5): (a) the path is derived with
        # database-qualified layout (warehouse/db.db/tbl, not
        # warehouse/db.tbl); (b) only a directory that is genuinely
        # orphaned (no catalog entry) AND whose contents look like
        # Spark table output is removed — never a same-named directory
        # this table never owned.
        orphan = not spark.catalog.tableExists(table)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if orphan:
            loc = _managed_location(spark, table)
            if os.path.isdir(loc) and _looks_like_spark_table_dir(loc):
                import shutil

                shutil.rmtree(loc, ignore_errors=True)
    writer = (
        df.repartition(buckets, F.col(key))
        .write.bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if overwrite:
        writer = writer.mode("overwrite")
    writer.saveAsTable(table)


def bucketed_equijoin(
    spark,
    left_table: str,
    right_table: str,
    key: str,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: with both
    sides bucketed (same count, same key) the physical plan is a
    SortMergeJoin with NO Exchange and NO Sort below it — asserted by
    tests/test_plan_quality.py. The merge hint pins the strategy (at
    fixture scale one side fits the broadcast threshold and would
    otherwise be broadcast, hiding the layout win this function
    exists to demonstrate; at 100 TB neither side broadcasts and the
    hint is a no-op). Returns the joined relation."""
    return (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table), key)
    )
