import sys, time
sys.path.insert(0, "/root/repo")
from detectingscc_spark.session import get_spark
from detectingscc_spark.sources.gtgraph import read_gtgraph, gtgraph_meta
from detectingscc_spark.operators.scc import strongly_connected_components
from detectingscc_spark.plans.superstep import SuperstepRunner

spark = get_spark(master="local[8]", shuffle_partitions=8)
path = "/root/reference/data/sample128.gr"
v, _ = gtgraph_meta(spark, path)
edges = read_gtgraph(spark, path)

class LoudRunner(SuperstepRunner):
    def log(self, phase, **kv):
        print(f"[{time.strftime('%H:%M:%S')}] step={self.superstep} {phase} {kv}", flush=True)
        super().log(phase, **kv)

r = LoudRunner(spark)
res = strongly_connected_components(spark, edges, spark.range(1, v+1), runner=r, expand="csr")
print("RESULT", res.count(), flush=True)
