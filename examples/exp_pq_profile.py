"""Profile parquet->parquet: scan-only vs full write vs engine.run,
and task layout. Measurement harness for VERDICT r2 item 3."""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_parquet_spark.session import get_spark


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="prof", master="local[32]", shuffle_partitions=32)
    spark.range(1000).summary().write.format("noop").mode("overwrite").save()

    work = tempfile.mkdtemp(prefix="prof_pq_", dir="/dev/shm")
    try:
        src = os.path.join(sf_dir, "lineitem.parquet")
        pq_dir = os.path.join(work, "pq_src")
        os.makedirs(pq_dir)
        shutil.copy(src, os.path.join(pq_dir, "rep000.parquet"))
        for c in range(1, 64):
            os.link(os.path.join(pq_dir, "rep000.parquet"),
                    os.path.join(pq_dir, f"rep{c:03d}.parquet"))
        total = os.path.getsize(src) * 64

        for mpb in (8, 16, 32, 64):
            spark.conf.set("spark.sql.files.maxPartitionBytes",
                           str(mpb << 20))
            df = spark.read.parquet(pq_dir)
            nparts = df.rdd.getNumPartitions()
            # scan only
            best_scan = best_wr = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best_scan = min(best_scan, time.perf_counter() - t0)
            for _ in range(3):
                out = os.path.join(work, "o.parquet")
                t0 = time.perf_counter()
                df.write.mode("overwrite").option(
                    "compression", "snappy").parquet(out)
                best_wr = min(best_wr, time.perf_counter() - t0)
                shutil.rmtree(out, ignore_errors=True)
            print(f"mpb={mpb}MB parts={nparts} "
                  f"scan={best_scan:.3f}s ({total/1e6/best_scan:.0f} MB/s) "
                  f"write={best_wr:.3f}s ({total/1e6/best_wr:.0f} MB/s)")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
