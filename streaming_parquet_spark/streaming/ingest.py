"""Streaming near-duplicate-deduplicated ingest: a Structured
Streaming file source feeding the persisted LSH index
(operators.dedup.write_lsh_index) through foreachBatch — the
continuous form of the probe → survivors → append loop, with
EXACTLY-ONCE corpus contents across crash/replay.

Per micro-batch:
  1. within-batch near-dup removal (drop any doc near-duplicating a
     lower-id doc in the same batch — the semantic_dedup_drops rule),
  2. probe the persisted index (incremental_lsh_pairs semantics),
  3. dynamic-partition-OVERWRITE the survivors into the corpus table
     under ingest_batch=<batch_id>,
  4. append the survivors to the index.

Why this ordering is exactly-once without a transactional table
format: the stream checkpoint commits AFTER step 4, so a crash
anywhere replays the whole batch. Replay cases —
  * crash before step 3: clean rerun, nothing was written.
  * crash between 3 and 4: the probe (not yet appended) yields the
    SAME survivors — deterministic operators over the same batch —
    and step 3 overwrites the partition with identical rows
    (idempotent), then step 4 runs.
  * crash after 4: every replayed survivor now pairs with its own
    indexed copy at jaccard 1.0, so the probe drops all of them;
    steps 3/4 see an empty survivor set and touch nothing (an empty
    dynamic overwrite rewrites no partitions), leaving the earlier
    writes as the single effect.
The index tables themselves are therefore at-most-once-appended per
batch, and the corpus partition is overwritten-or-untouched — no
replay can double-count a document.

At 100 TB: per-batch SHUFFLE volume scales with the batch (the index
probe broadcasts the batch's band relation; the corpus table is never
read on the ingest path), while per-batch I/O additionally pays one
column-pruned, shuffle-free scan of the index tables — amortize it by
sizing triggers (``max_files_per_trigger``): per-document index-scan
cost is index_bytes / batch_docs, so probing bigger batches less
often is strictly cheaper (see the cost-honesty note on
``incremental_lsh_pairs``).  The corpus table is partitioned by
ingest batch, which doubles as retention/lineage bookkeeping.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from streaming_parquet_spark.operators.dedup import (
    _lsh_index_params,
    append_to_lsh_index,
    incremental_dedup,
    minhash_lsh_pairs,
)
from streaming_parquet_spark.operators.similarity import (
    _ann_index_dims,
    append_to_ann_index,
    incremental_semantic_dedup,
    ivf_assign,
    read_ann_centroids,
    similarity_pairs,
)


@dataclass
class IngestResult:
    """Per-run tallies: rows seen / kept per micro-batch id."""

    batches: list[int] = field(default_factory=list)
    rows_in: int = 0
    rows_kept: int = 0


def _ensure_corpus_table(spark: SparkSession, df: DataFrame, table: str) -> None:
    if not spark.catalog.tableExists(table):
        (
            df.limit(0)
            .write.partitionBy("ingest_batch")
            .format("parquet")
            .saveAsTable(table)
        )


def _run_ingest(
    spark: SparkSession,
    source_dir: str,
    table: str,
    checkpoint: str,
    survivors_fn,
    append_fn,
    max_files_per_trigger: int | None,
) -> IngestResult:
    """The shared exactly-once micro-batch runner (module docstring):
    ``survivors_fn(batch) -> DataFrame`` performs within-batch dedup +
    the index probe (steps 1-2; deterministic, so a replayed batch
    reproduces the same survivor set); ``append_fn(survivors)`` folds
    survivors into the index (step 4).  Step 3's dynamic partition
    overwrite and the 3-before-4 ordering carry the crash/replay
    guarantees for BOTH the text and the embedding loop."""
    schema = spark.read.parquet(source_dir).schema
    result = IngestResult()

    def process(batch: DataFrame, batch_id: int) -> None:
        bspark = batch.sparkSession
        result.batches.append(batch_id)
        result.rows_in += batch.count()
        survivors = survivors_fn(batch).withColumn(
            "ingest_batch", F.lit(int(batch_id))
        )
        # Materialize ONCE per batch: steps 3 and 4 both consume the
        # survivor set, and the probe must not run twice against an
        # index step 4 is about to mutate.
        rows = survivors.persist()
        n = rows.count()
        result.rows_kept += n
        try:
            if n:
                # 3. exactly-once corpus write: dynamic partition
                #    overwrite of ingest_batch=<batch_id> only.  Set
                #    via session conf — the DataFrameWriter option of
                #    the same name is not honored by insertInto here
                #    (observed: it fell back to STATIC and truncated
                #    the other partitions).
                _ensure_corpus_table(bspark, rows, table)
                conf_key = "spark.sql.sources.partitionOverwriteMode"
                prev = bspark.conf.get(conf_key, None)
                bspark.conf.set(conf_key, "dynamic")
                try:
                    rows.write.mode("overwrite").insertInto(table)
                finally:
                    if prev is None:
                        bspark.conf.unset(conf_key)
                    else:
                        bspark.conf.set(conf_key, prev)
                # 4. fold survivors into the index
                append_fn(rows.drop("ingest_batch"))
        finally:
            rows.unpersist()

    reader = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(source_dir)
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result


def dedup_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    table: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.2,
    max_bucket_rows: int | None = None,
    max_files_per_trigger: int | None = None,
) -> IngestResult:
    """Run the deduplicated-ingest stream over ``source_dir`` (parquet
    files) with an ``availableNow`` trigger: process everything not yet
    recorded in ``checkpoint``, then stop.  ``table`` is the corpus
    table (created on first use, partitioned by ``ingest_batch``);
    ``{table}_lsh`` must be an existing LSH index
    (:func:`~streaming_parquet_spark.operators.dedup.write_lsh_index` —
    seed it from the initial corpus, or from an empty frame for a
    cold start).  Banding parameters come from the index's pinned
    table properties.

    Re-running with the same checkpoint is a resume (new files only);
    re-running with a FRESH checkpoint replays every file but changes
    nothing — see the module docstring's replay analysis."""
    index = f"{table}_lsh"
    params = _lsh_index_params(spark, index)  # fail fast if absent

    def survivors_fn(batch: DataFrame) -> DataFrame:
        # 1. within-batch near-dups: drop any doc that near-duplicates
        #    a lower-id doc of the same batch.
        pairs = minhash_lsh_pairs(
            batch, id_col=id_col, text_col=text_col,
            num_hashes=params["num_hashes"], bands=params["bands"],
            basis=params["basis"], jaccard_threshold=jaccard_threshold,
            max_bucket_rows=max_bucket_rows,
        )
        batch_drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
        within = batch.join(batch_drops, id_col, "left_anti")
        # 2. probe the persisted index
        return incremental_dedup(
            within, index, id_col=id_col, text_col=text_col,
            jaccard_threshold=jaccard_threshold,
            max_bucket_rows=max_bucket_rows,
        )

    def append_fn(rows: DataFrame) -> None:
        append_to_lsh_index(rows, index, id_col=id_col, text_col=text_col)

    return _run_ingest(
        spark, source_dir, table, checkpoint, survivors_fn, append_fn,
        max_files_per_trigger,
    )


def semantic_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    table: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    max_block_rows: int | None = None,
    max_files_per_trigger: int | None = None,
) -> IngestResult:
    """The EMBEDDING-side twin of :func:`dedup_ingest_stream`: the same
    exactly-once micro-batch loop, with the persisted ANN index
    (:func:`~streaming_parquet_spark.operators.similarity.
    write_ann_index` at ``{table}_ann``) as the dedup authority.
    Within-batch near-dups drop by the SemDeDup rule (similar to a
    lower-id vector of the same batch, blocked under the index's
    frozen coarse clusters); the index probe then drops anything
    similar to an already-ingested vector.  Replay safety is identical
    — a replayed survivor pairs with its own indexed copy at sim 1.0
    (embeddings L2-normalized) before any write happens."""
    index = f"{table}_ann"
    dims = _ann_index_dims(spark, index)  # fail fast if absent
    cents = read_ann_centroids(spark, index, id_col, vec_col)

    def survivors_fn(batch: DataFrame) -> DataFrame:
        assigned = ivf_assign(batch, cents, id_col, vec_col, dims)
        pairs = similarity_pairs(
            assigned, threshold=threshold, id_col="id", vec_col="v",
            block_col="cluster", dims=dims, max_block_rows=max_block_rows,
        )
        batch_drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
        within = batch.join(batch_drops, id_col, "left_anti")
        return incremental_semantic_dedup(
            within, index, threshold=threshold, id_col=id_col,
            vec_col=vec_col, max_block_rows=max_block_rows,
        )

    def append_fn(rows: DataFrame) -> None:
        append_to_ann_index(rows, index, id_col=id_col, vec_col=vec_col)

    return _run_ingest(
        spark, source_dir, table, checkpoint, survivors_fn, append_fn,
        max_files_per_trigger,
    )
