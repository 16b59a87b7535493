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


def test_parallel_branches_nested_call_runs_inline():
    # A builder that itself calls parallel_branches must not deadlock
    # the bounded shared pool: nested calls run inline on the worker
    # thread (the _IN_POOL guard). Saturate the pool with nesting
    # builders — with submission-based nesting this would exhaust the
    # 8 slots and hang; inline nesting completes.
    from streaming_parquet_spark import concurrency as cc

    def nesting(i):
        inner = cc.parallel_branches(
            lambda: i * 2, lambda: i * 2 + 1
        )
        assert getattr(cc._IN_POOL, "active", False)
        return inner

    out = parallel_branches(
        *(lambda i=i: nesting(i) for i in range(cc._POOL_WORKERS + 2))
    )
    assert out == [[i * 2, i * 2 + 1] for i in range(cc._POOL_WORKERS + 2)]
    # The caller thread is not a pool worker: flag must be clear here.
    assert not getattr(cc._IN_POOL, "active", False)


def test_parallel_branches_failure_cancels_queued_siblings():
    # Once a branch fails, queued-but-unstarted siblings must not run
    # (side-effecting builders would otherwise interleave with the
    # caller's error handling). Fill the pool with blocking builders,
    # queue one side-effecting sibling behind a failing branch, then
    # release: the queued sibling must have been cancelled.
    import threading
    import time

    from streaming_parquet_spark import concurrency as cc

    release = threading.Event()
    ran = []

    def blocker():
        release.wait(20)
        return "blocked"

    def boom():
        raise RuntimeError("gate failed")

    def side_effect():
        ran.append(1)
        return "ran"

    builders = [boom]
    builders += [blocker] * cc._POOL_WORKERS
    builders += [side_effect]
    t = threading.Thread(
        target=lambda: (time.sleep(0.5), release.set())
    )
    t.start()
    with pytest.raises(RuntimeError, match="gate failed"):
        parallel_branches(*builders)
    t.join()
    assert ran == []


def test_minhash_staged_param_mismatch_raises(spark, sf_dir):
    from streaming_parquet_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_staging,
    )
    from streaming_parquet_spark.operators.similarity import (
        release_materialized,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    staged = minhash_lsh_staging(docs, num_hashes=16, bands=8)
    base, exploded = staged  # still unpacks like a plain tuple
    assert base.columns == ["id", "wh"]
    assert exploded.columns == ["id", "band", "bh"]
    with pytest.raises(ValueError, match="staged= was built with"):
        minhash_lsh_pairs(docs, num_hashes=16, bands=4, staged=staged)
    release_materialized()


def test_materialize_same_generation_eviction_warns(spark):
    # A gate staging more than _PERSIST_KEEP relations evicts its own
    # in-flight staging — that must warn + count, not degrade silently.
    from streaming_parquet_spark.operators import similarity as sim

    sim.release_materialized()
    before = sim._SAME_GEN_EVICTIONS[0]
    with pytest.warns(RuntimeWarning, match="current gate build"):
        for i in range(sim._PERSIST_KEEP + 1):
            sim._materialize(spark.range(i, i + 5), spread=False)
    assert sim._SAME_GEN_EVICTIONS[0] == before + 1
    sim.release_materialized()
    # Across a gate boundary (release bumps the generation) eviction of
    # OLD entries stays silent.
    import warnings as _w

    for i in range(sim._PERSIST_KEEP):
        sim._materialize(spark.range(i, i + 5), spread=False)
    sim._GEN[0] += 1  # simulate the next gate without unpersisting
    with _w.catch_warnings():
        _w.simplefilter("error")
        sim._materialize(spark.range(99, 104), spread=False)
    assert sim._SAME_GEN_EVICTIONS[0] == before + 1
    sim.release_materialized()


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
