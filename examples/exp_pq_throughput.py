"""Experiment: parquet->parquet conversion throughput under writer knobs.

Not part of the library — a measurement harness for tuning
(VERDICT r2 item 3: parquet->parquet 183.6 MB/s vs >=200 target).
Run: python examples/exp_pq_throughput.py [conf=value ...]
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_parquet_spark.session import get_spark
from streaming_parquet_spark.engine import Engine
from streaming_parquet_spark.runspec import RunSpec


def main():
    overrides = dict(a.split("=", 1) for a in sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp", master="local[32]", shuffle_partitions=32)
    for k, v in overrides.items():
        if k.startswith("hadoop:"):
            spark.sparkContext._jsc.hadoopConfiguration().set(k[7:], v)
        else:
            spark.conf.set(k, v)
    spark.range(1000).summary().write.format("noop").mode("overwrite").save()

    work = tempfile.mkdtemp(prefix="exp_pq_", dir="/dev/shm")
    try:
        src = os.path.join(sf_dir, "lineitem.parquet")
        pq_dir = os.path.join(work, "pq_src")
        os.makedirs(pq_dir)
        total = 0
        shutil.copy(src, os.path.join(pq_dir, "rep000.parquet"))
        for c in range(1, 64):
            dst = os.path.join(pq_dir, f"rep{c:03d}.parquet")
            os.link(os.path.join(pq_dir, "rep000.parquet"), dst)
        total = os.path.getsize(src) * 64
        eng = Engine(spark)
        spec = RunSpec(inputs=[pq_dir], out=os.path.join(work, "o.parquet"),
                       compression="snappy", single_file=False,
                       roll_by_rows=10**9)
        eng.run(spec)  # warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            eng.run(spec)
            best = min(best, time.perf_counter() - t0)
        print(f"RESULT mb_per_sec={total / 1e6 / best:.2f} best_sec={best:.3f} "
              f"overrides={overrides}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
