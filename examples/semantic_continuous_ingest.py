"""Embedding-side continuous deduplicated ingest: the SemDeDup-shaped
probe -> survivors -> append loop over the persisted ANN index, sharing
the LSH example's exactly-once runner (streaming/ingest.py).

  seed     -> write_ann_index freezes the coarse centroids (what makes
              appends composable) and writes the cluster-partitioned
              posting lists
  wave 1   -> within-batch SemDeDup + index probe; survivors land in
              the corpus table and the postings
  wave 2   -> same checkpoint resumes; re-delivered vectors self-pair
              at sim 1.0 against their indexed copies and drop
  replay   -> a fresh checkpoint reprocesses everything, changes
              NOTHING (the id anti-joins, not luck)

Run: python examples/semantic_continuous_ingest.py [sf_dir] [workdir]
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streaming_parquet_spark.operators.similarity import (
    fit_ivf_centroids,
    write_ann_index,
)
from streaming_parquet_spark.session import get_spark
from streaming_parquet_spark.streaming.ingest import semantic_ingest_stream


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/semantic_ingest"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_spark(app_name="semantic-ingest", master="local[4]",
                      shuffle_partitions=8)

    table = "ingested_vecs"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    for suffix in ("", "_ann_postings", "_ann_centroids"):
        spark.sql(f"DROP TABLE IF EXISTS {table}{suffix}")
        shutil.rmtree(
            os.path.join(warehouse, f"{table}{suffix}"), ignore_errors=True
        )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    # seed: the first quarter builds the index. Centroids come from
    # the sampled-KMeans fit (the real-centroid path) and FREEZE here —
    # frozen is what makes later appends composable.
    seed = emb.filter(F.col("vec_id") % 4 == 0)
    cents = fit_ivf_centroids(seed, n_centroids=8)
    write_ann_index(seed, f"{table}_ann", cents)

    src = os.path.join(work, "src")
    ckpt = os.path.join(work, "ckpt")

    # wave 1: half the corpus (includes re-deliveries of the seed)
    emb.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    r1 = semantic_ingest_stream(spark, src, table, ckpt, threshold=0.9)
    print(f"wave 1: {r1.rows_in} in -> {r1.rows_kept} kept "
          f"(seed re-deliveries self-pair at sim 1.0 and drop)")

    # wave 2: everything (same checkpoint resumes with the new files)
    emb.coalesce(1).write.mode("append").parquet(src)
    r2 = semantic_ingest_stream(spark, src, table, ckpt, threshold=0.9)
    print(f"wave 2: {r2.rows_in} in -> {r2.rows_kept} kept")

    before = spark.table(table).count()
    r3 = semantic_ingest_stream(
        spark, src, table, os.path.join(work, "ckpt_fresh"), threshold=0.9
    )
    after = spark.table(table).count()
    print(f"full replay: {r3.rows_in} in -> {r3.rows_kept} kept; "
          f"corpus {before} -> {after} (unchanged: {before == after})")

    for suffix in ("", "_ann_postings", "_ann_centroids"):
        spark.sql(f"DROP TABLE IF EXISTS {table}{suffix}")
    spark.stop()


if __name__ == "__main__":
    main()
