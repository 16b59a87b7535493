"""Continuous deduplicated-ingest example: the probe → survivors →
append loop running under Structured Streaming, cold-started from an
empty index.

  wave 1 arrives  -> within-batch dedup -> index probe -> survivors
                     land in the corpus table (partition ingest_batch=0)
                     and the LSH index
  wave 2 arrives  -> same checkpoint resumes: only new files process;
                     re-ingested documents self-pair against the index
                     and drop
  full replay     -> a FRESH checkpoint reprocesses everything and
                     changes NOTHING (exactly-once corpus contents —
                     the crash/replay analysis in streaming/ingest.py)

The loop also OBSERVES itself (monitor_table=): each corpus-growing
batch logs tallies + its delta's content fingerprint + the
delta-vs-corpus drift cosine; XOR of monitor fingerprints reproduces
the corpus fingerprint (in crash-free operation — the monitor is
at-most-once where the corpus is exactly-once), and the replay logs
nothing.

Run: python examples/continuous_ingest.py [sf_dir] [workdir]
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streaming_parquet_spark.operators.dedup import write_lsh_index
from streaming_parquet_spark.session import get_spark
from streaming_parquet_spark.streaming import dedup_ingest_stream


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/continuous_ingest"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_spark(app_name="continuous-ingest", master="local[4]",
                      shuffle_partitions=8)

    table = "ingested_docs"
    monitor = f"{table}_monitor"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    for suffix in ("", "_lsh_sets", "_lsh_bands", "_monitor"):
        spark.sql(f"DROP TABLE IF EXISTS {table}{suffix}")
        shutil.rmtree(
            os.path.join(warehouse, f"{table}{suffix}"), ignore_errors=True
        )

    # cold start: an EMPTY index — the loop is self-priming
    empty = spark.createDataFrame([], "doc_id long, text string")
    write_lsh_index(empty, f"{table}_lsh")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    src = os.path.join(work, "src")
    ckpt = os.path.join(work, "ckpt")

    # the quality stage rides INSIDE the exactly-once loop: rejected
    # docs never cost an index probe and never enter corpus or index
    # (swap in gopher rules / classifier_filter / c4_clean_lines here)
    def quality(batch):
        return batch.filter(F.length("text") >= 100)

    # wave 1: the first half of the corpus
    docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "text"
    ).coalesce(1).write.mode("append").parquet(src)
    r1 = dedup_ingest_stream(spark, src, table, ckpt,
                             max_bucket_rows=10_000, filter_fn=quality,
                             monitor_table=monitor, monitor_drift=True)
    print(f"wave 1: {r1.rows_in} in -> {r1.rows_filtered} filtered -> "
          f"{r1.rows_kept} kept (within-wave near-dups removed)")

    # wave 2: the other half PLUS a re-delivery of wave 1 (an upstream
    # at-least-once producer) — the re-delivered docs self-pair against
    # the index and drop
    docs.select("doc_id", "text").coalesce(1).write.mode("append").parquet(
        src
    )
    r2 = dedup_ingest_stream(spark, src, table, ckpt,
                             max_bucket_rows=10_000, filter_fn=quality,
                             monitor_table=monitor, monitor_drift=True)
    print(f"wave 2: {r2.rows_in} in -> {r2.rows_kept} kept "
          f"(re-delivered wave-1 docs dropped by the index)")

    corpus = spark.table(table)
    print(f"corpus: {corpus.count()} docs across "
          f"{corpus.select('ingest_batch').distinct().count()} "
          f"ingest batches")

    # the observe half: one monitor row per corpus-growing batch, and
    # the rows COMPOSE — XOR of their fingerprints reproduces the
    # corpus fingerprint (the lineage audit a 100 TB ingest needs)
    from functools import reduce

    from streaming_parquet_spark.operators.profile import (
        corpus_fingerprint,
    )

    mon_rows = spark.table(monitor).orderBy("ingest_batch").collect()
    for m in mon_rows:
        print(f"monitor batch {m['ingest_batch']}: "
              f"in={m['rows_in']} kept={m['rows_kept']} "
              f"appended={m['rows_appended']} "
              f"drift_cosine={m['drift_cosine']}")
    fp = corpus_fingerprint(corpus).first()
    composed_a = reduce(lambda a, b: a ^ b,
                        (m["fp_a"] for m in mon_rows), 0)
    print(f"monitor fps compose to corpus fingerprint: "
          f"{composed_a == fp['fp_a']}")

    # disaster drill: replay EVERYTHING under a fresh checkpoint
    before = corpus.count()
    r3 = dedup_ingest_stream(spark, src, table,
                             os.path.join(work, "ckpt_fresh"),
                             max_bucket_rows=10_000, filter_fn=quality,
                             monitor_table=monitor, monitor_drift=True)
    after = spark.table(table).count()
    print(f"full replay: {r3.rows_in} in -> {r3.rows_kept} kept; "
          f"corpus {before} -> {after} (unchanged: {before == after}); "
          f"monitor rows still {spark.table(monitor).count()} "
          f"(replays log nothing)")

    for suffix in ("", "_lsh_sets", "_lsh_bands", "_monitor"):
        spark.sql(f"DROP TABLE IF EXISTS {table}{suffix}")
    spark.stop()


if __name__ == "__main__":
    main()
