import os, sys, time, json
sys.path.insert(0, "/root/repo")
from detectingscc_spark.session import get_spark
from detectingscc_spark.corpus import generate_corpus
from detectingscc_spark.functions.dedup import minhash_signatures
from pyspark.sql import functions as F

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
n = int(os.environ.get("N", "150000"))
spark = get_spark(app_name=f"cpuprobe-{cpus}", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
docs = generate_corpus(spark, n).select(F.col("fid").alias("doc_id"), F.col("content").alias("text")).persist()
docs.count()
t0 = time.time()
sig = minhash_signatures(docs, num_hashes=16)
cnt = sig.count()
dt = time.time() - t0
print(json.dumps({"cpus": int(cpus), "docs": cnt, "wall": dt, "docs_per_sec": cnt/dt}))
