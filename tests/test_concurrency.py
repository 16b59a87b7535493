"""Focused gates for the r15 branch-parallel build machinery:
concurrency.parallel_branches, the lock-guarded _materialize registry,
and the shared minhash staging path (staged= must be bit-identical to
the self-contained path)."""

import pytest

from pyspark.sql import functions as F

from streaming_parquet_spark.concurrency import parallel_branches


def test_parallel_branches_preserves_argument_order():
    out = parallel_branches(*(lambda i=i: i * 10 for i in range(8)))
    assert out == [i * 10 for i in range(8)]


def test_parallel_branches_single_builder_fast_path():
    assert parallel_branches(lambda: "only") == ["only"]


def test_parallel_branches_propagates_exception():
    def boom():
        raise ValueError("branch failed")

    with pytest.raises(ValueError, match="branch failed"):
        parallel_branches(lambda: 1, boom, lambda: 3)


def test_parallel_branches_runs_concurrently():
    # Builders rendezvous on a barrier: serial execution would deadlock
    # (timeout -> BrokenBarrierError), so passing proves true overlap.
    import threading

    barrier = threading.Barrier(3, timeout=20)

    def waiter(i):
        barrier.wait()
        return i

    assert parallel_branches(
        *(lambda i=i: waiter(i) for i in range(3))
    ) == [0, 1, 2]


def test_parallel_branches_spark_jobs_from_threads(spark):
    # Spark actions submitted from the pool's threads must work and
    # return correct results (inheritable_thread_target wiring).
    dfs = parallel_branches(
        lambda: spark.range(100).agg(F.sum("id")).collect()[0][0],
        lambda: spark.range(50).agg(F.count("*")).collect()[0][0],
    )
    assert dfs == [4950, 50]


def test_minhash_staged_pairs_identical_to_self_contained(spark, sf_dir):
    from streaming_parquet_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_staging,
    )
    from streaming_parquet_spark.operators.similarity import (
        release_materialized,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want_uncapped = sorted(
        minhash_lsh_pairs(
            docs, num_hashes=16, bands=8, jaccard_threshold=0.2
        ).collect()
    )
    want_capped = sorted(
        minhash_lsh_pairs(
            docs, num_hashes=16, bands=8, jaccard_threshold=0.2,
            max_bucket_rows=64,
        ).collect()
    )
    staged = minhash_lsh_staging(docs, num_hashes=16, bands=8)
    got_uncapped = sorted(
        minhash_lsh_pairs(
            docs, num_hashes=16, bands=8, jaccard_threshold=0.2,
            staged=staged,
        ).collect()
    )
    got_capped = sorted(
        minhash_lsh_pairs(
            docs, num_hashes=16, bands=8, jaccard_threshold=0.2,
            max_bucket_rows=64, staged=staged,
        ).collect()
    )
    release_materialized()
    assert got_uncapped == want_uncapped
    assert got_capped == want_capped


def test_materialize_registry_concurrent_staging(spark):
    # Concurrent _materialize calls from branch threads must never lose
    # or double-release a staged relation (the lock-guarded registry).
    from streaming_parquet_spark.operators import similarity as sim

    sim.release_materialized()

    def stage(i):
        return sim._materialize(
            spark.range(i * 100, i * 100 + 10).withColumn(
                "x", F.col("id") * 2
            ),
            spread=False,
        )

    dfs = parallel_branches(*(lambda i=i: stage(i) for i in range(6)))
    for i, df in enumerate(dfs):
        rows = df.collect()
        assert len(rows) == 10
        assert min(r["id"] for r in rows) == i * 100
    with sim._PERSISTED_LOCK:
        n = len(sim._PERSISTED)
    assert n <= sim._PERSIST_KEEP
    sim.release_materialized()
    with sim._PERSISTED_LOCK:
        assert not sim._PERSISTED
