"""VERDICT r15 item 5 prototype: can a bit-exact Arrow (pandas-UDF)
accumulation beat the JVM's unrolled 64-term codegen sums on the ANN
assignment pass? Left-association preserved by accumulating dim-by-dim
(each += is one IEEE double add, vectorized over rows)."""
import os, sys, time
sys.path.insert(0, os.getcwd())
import numpy as np
import pandas as pd
from streaming_parquet_spark.session import get_spark
from pyspark.sql import functions as F
import streaming_parquet_spark.queries_ext as qx
from streaming_parquet_spark.operators.similarity import ivf_assign, release_materialized
spark = get_spark(app_name="arrow_proto", master="local[32]", shuffle_partitions=32)
from bench import _warm
_warm(spark, "/root/testdata/sf0.1")
_t = qx._t
emb = _t(spark, "/root/testdata/sf0.1", "embeddings")
cents = emb.filter(F.col("vec_id") < 8)
crows = sorted((r["vec_id"], list(r["embedding"])) for r in cents.collect())
C = np.array([c for _, c in crows], dtype=np.float64)  # 8 x 64
cids = np.array([i for i, _ in crows], dtype=np.int64)

def jvm():
    return ivf_assign(emb, cents, "vec_id", "embedding", 64).select("id", "cluster")

def arrow():
    def batches(it):
        for pdf in it:
            V = np.array(pdf["embedding"].tolist(), dtype=np.float64)  # n x 64
            n = V.shape[0]
            best_aff = None; best_c = None
            for ci in range(C.shape[0]):
                acc = np.zeros(n)
                for d in range(64):            # left-associated adds
                    acc = acc + V[:, d] * C[ci, d]
                if best_aff is None:
                    best_aff, best_c = acc, np.full(n, cids[ci])
                else:
                    # tie-break: higher aff, then LOWER cent_id (we scan ascending ids, so strict >)
                    take = acc > best_aff
                    best_aff = np.where(take, acc, best_aff)
                    best_c = np.where(take, cids[ci], best_c)
            yield pd.DataFrame({"id": pdf["vec_id"].astype("int64"), "cluster": best_c})
    return emb.select("vec_id", "embedding").mapInPandas(batches, "id long, cluster bigint")

# correctness: exact equality of assignments
a = {r["id"]: r["cluster"] for r in jvm().collect()}
b = {r["id"]: r["cluster"] for r in arrow().collect()}
print("assignments equal:", a == b, "n =", len(a))

for label, fn in (("jvm", jvm), ("arrow", arrow), ("jvm", jvm), ("arrow", arrow)):
    spark.catalog.clearCache(); release_materialized()
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    print(f"{label:6s} {time.perf_counter()-t0:6.3f}", flush=True)
