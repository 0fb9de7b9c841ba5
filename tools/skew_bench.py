"""Skew evidence at scale (VERDICT round-2 item 7): SCC on the corpus
import graph with a PLANTED mega-hub, salted vs unsalted.

The graph is the standard 4M-vertex synthetic import graph plus one hub:
vertex 0 gains out-edges to the first `hub_degree` vertices (3M by
default — past the 1.5M BROADCAST_ROW_LIMIT, so mid-BFS frontiers take
the shuffle-join path where a single-key adjacency of 3M rows is a real
straggler). Two runs in fresh pinned JVMs:

  salted:   hub_degree_threshold forced to 1_000_000 (per-hub salting
            engages for the 3M hub)
  unsalted: hub_degree_threshold = 10**15 (salting disabled; plain
            shuffle join + AQE skew splitting only)

NOTE on the shipped default: this benchmark's result moved the engine
default to 5_000_000, so under the SHIPPED default the planted 3M hub
takes the UNSALTED path — which is exactly what the measurement says it
should (AQE-only won 402s vs 610s).

Writes tools/skew_result.json and appends a row to tools/scaling_history.md
(summary curated in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from detectingscc_spark.session import get_spark
from detectingscc_spark.corpus import generate_corpus
from detectingscc_spark.ingest import ingest
from detectingscc_spark.operators.scc import strongly_connected_components

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
n_files = int(os.environ["SKEW_FILES"])
hub_degree = int(os.environ["SKEW_HUB_DEGREE"])
threshold = int(os.environ["SKEW_THRESHOLD"])
spark = get_spark(app_name=f"skew-{threshold}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
corpus = generate_corpus(spark, n_files).persist(); corpus.count()
verts, edges, _ = ingest(spark, corpus)
hub = spark.range(1, hub_degree + 1).select(
    F.lit(0).cast("long").alias("src"), F.col("id").alias("dst"))
edges = edges.select("src", "dst").unionByName(hub).persist()
n_edges = edges.count()
t0 = time.time()
n = strongly_connected_components(spark, edges, verts.select("id"),
                                  local_finish_edges=0,
                                  hub_degree_threshold=threshold).count()
dt = time.time() - t0
assert n == n_files, f"covered {n}/{n_files}"
print(json.dumps({"cpus": cpus, "wall_sec": dt, "edges": n_edges,
                  "hub_degree": hub_degree, "threshold": threshold,
                  "edges_per_sec": n_edges / dt}))
"""


def run(threshold: int, n_files: int, hub_degree: int, cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SKEW_FILES=str(n_files),
        SKEW_HUB_DEGREE=str(hub_degree),
        SKEW_THRESHOLD=str(threshold),
    )
    cmd = [sys.executable, "-c", CHILD % {"repo": REPO}]
    import shutil

    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result (threshold={threshold}): {out.stderr[-2000:]}")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=4_000_000)
    ap.add_argument("--hub-degree", type=int, default=3_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    salted = run(1_000_000, args.files, args.hub_degree, args.cpus)
    print(json.dumps(salted), flush=True)
    unsalted = run(10**15, args.files, args.hub_degree, args.cpus)
    print(json.dumps(unsalted), flush=True)

    result = {
        "job": "scc with planted hub (salted vs unsalted)",
        "n_files": args.files,
        "hub_degree": args.hub_degree,
        "salted": salted,
        "unsalted": unsalted,
        "speedup_salted_vs_unsalted": round(
            unsalted["wall_sec"] / salted["wall_sec"], 3
        ),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(os.path.join(REPO, "tools", "skew_result.json"), "w") as f:
        json.dump(result, f, indent=2)
    row = (
        f"\n| skew run {result['ts']} ({args.files/1e6:g}M files + {args.hub_degree/1e6:g}M-degree hub) "
        f"| salted: {salted['wall_sec']:.1f}s | unsalted: {unsalted['wall_sec']:.1f}s "
        f"| salting speedup {result['speedup_salted_vs_unsalted']:.2f}x |"
    )
    with open(os.path.join(REPO, "tools", "scaling_history.md"), "a") as f:
        f.write(row + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
