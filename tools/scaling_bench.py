"""Scaling-efficiency evidence (BASELINE.json: ≥0.8 from N to 4N).

No real cluster exists in this sandbox, so per the round instructions the
same SCC job runs on the same input at two parallelism levels —
local[8] and local[32] — in separate JVMs (fresh spark-submit-equivalent
subprocesses). Efficiency = (throughput@32 / throughput@8) / 4.

Writes tools/scaling_result.json and appends a row to tools/scaling_history.md
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
from detectingscc_spark.session import get_spark
from detectingscc_spark.corpus import generate_corpus
from detectingscc_spark.ingest import ingest
from detectingscc_spark.operators.scc import strongly_connected_components

cpus = os.environ["SPARK_GRAFT_CPUS"]
n_files = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "100000"))
expand = os.environ.get("SPARK_GRAFT_EXPAND", "join")
unroll = int(os.environ.get("SPARK_GRAFT_UNROLL", "1"))
spark = get_spark(app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus))
corpus = generate_corpus(spark, n_files).persist(); corpus.count()
verts, edges, _ = ingest(spark, corpus)
edges = edges.persist(); n_edges = edges.count()
t0 = time.time()
# local_finish_edges=0: fully distributed — the scaling criterion must not
# include a serial driver-side Tarjan tail (identical at both levels)
n = strongly_connected_components(spark, edges, verts.select("id"),
                                  local_finish_edges=0, expand=expand,
                                  bfs_unroll=unroll).count()
dt = time.time() - t0
assert n == n_files
print(json.dumps({"cpus": int(cpus), "wall_sec": dt, "expand": expand,
                  "unroll": unroll,
                  "edges": n_edges, "edges_per_sec": n_edges / dt}))
"""


def run(cpus: int, n_files: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_BENCH_FILES=str(n_files))
    cmd = [sys.executable, "-c", CHILD % {"repo": REPO}]
    # Pin the whole process tree (JVM GC/shuffle/IO threads, Python
    # workers) to exactly `cpus` cores: an N-core executor HAS only N
    # cores, so letting the local[8] JVM's auxiliary threads spill onto
    # the other 24 would overstate the 8-way baseline and understate
    # scaling efficiency.
    import shutil
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd,
        env=env, capture_output=True, text=True,
        # 32M at local[8] exceeds an hour on this VM; keep the guard but
        # make it generous and overridable
        timeout=int(os.environ.get("SPARK_GRAFT_CHILD_TIMEOUT", "10800")),
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            r = json.loads(line)
            # emit each leg as soon as it lands: a crash in a LATER leg
            # (e.g. the 24M local[32] memory-edge abort, BASELINE.md
            # round-4 notes) must not lose this leg's number
            print(f"leg cpus={cpus}: {line}", flush=True)
            return r
    # keep the FULL child output: the in-message tail is routinely too
    # short to contain the root cause (two 24M failures were undiagnosable
    # from the last 2000 chars alone — BASELINE.md round-4 notes)
    dump = os.path.join(REPO, "tools", f"scaling_child_fail_cpus{cpus}.log")
    with open(dump, "w") as f:
        f.write("=== stdout ===\n" + out.stdout + "\n=== stderr ===\n" + out.stderr)
    raise RuntimeError(
        f"no result from cpus={cpus} (full child output: {dump}): {out.stderr[-2000:]}"
    )


def main():
    n_files = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "100000"))
    trials = int(os.environ.get("SPARK_GRAFT_SCALING_TRIALS", "1"))
    los, his = [], []
    for t in range(trials):
        # alternate order so disk-cache / thermal drift cancels out
        if t % 2 == 0:
            los.append(run(8, n_files)); his.append(run(32, n_files))
        else:
            his.append(run(32, n_files)); los.append(run(8, n_files))
    med = lambda xs: sorted(xs)[len(xs) // 2]
    lo_tp = med([x["edges_per_sec"] for x in los])
    hi_tp = med([x["edges_per_sec"] for x in his])
    eff = (hi_tp / lo_tp) / 4.0
    lo, hi = los[0], his[0]
    result = {
        "job": "scc on synthetic import graph",
        "n_files": n_files,
        "trials": trials,
        "local8": lo,
        "local32": hi,
        "local8_all_sec": [round(x["wall_sec"], 1) for x in los],
        "local32_all_sec": [round(x["wall_sec"], 1) for x in his],
        "local8_median_eps": round(lo_tp, 1),
        "local32_median_eps": round(hi_tp, 1),
        "scaling_efficiency_8_to_32": round(eff, 3),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(os.path.join(REPO, "tools", "scaling_result.json"), "w") as f:
        json.dump(result, f, indent=2)
    row = (
        f"\n| scaling run {result['ts']} ({n_files / 1e6:g}M files, {trials} trial(s)) "
        f"| local[8]: {lo['wall_sec']:.1f}s "
        f"({lo['edges_per_sec']:.0f} e/s) | local[32]: {hi['wall_sec']:.1f}s "
        f"({hi['edges_per_sec']:.0f} e/s) | efficiency {eff:.3f} |"
    )
    with open(os.path.join(REPO, "tools", "scaling_history.md"), "a") as f:
        f.write(row + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
