import sys, time, os, json
sys.path.insert(0, "/root/repo")
from detectingscc_spark.session import get_spark
from detectingscc_spark.corpus import generate_corpus
from detectingscc_spark.ingest import ingest
from detectingscc_spark.operators.scc import strongly_connected_components
from detectingscc_spark.plans.superstep import SuperstepRunner

n = int(os.environ.get("N", "100000"))
expand = os.environ.get("EXPAND", "join")
spark = get_spark(app_name="profile")
corpus = generate_corpus(spark, n).persist(); corpus.count()
verts, edges, _ = ingest(spark, edges_corpus := corpus)
edges = edges.persist(); ne = edges.count()

class T(SuperstepRunner):
    t0 = time.time()
    last = time.time()
    def log(self, phase, **kv):
        now = time.time()
        print(f"+{now-self.t0:7.1f} (+{now-self.last:5.1f}) step={self.superstep} {phase} {kv}", flush=True)
        self.last = now
        super().log(phase, **kv)

r = T(spark)
t0 = time.time()
res = strongly_connected_components(spark, edges, verts.select("id"),
        runner=r, local_finish_edges=100_000, expand=expand)
cnt = res.count()
print(json.dumps({"n": n, "edges": ne, "wall": time.time()-t0, "counters": r.counters, "expand": expand}), flush=True)
