"""Head-to-head of SCC frontier-expansion strategies (VERDICT round-2
item: record csr-vs-join at >=1M vertices and promote the winner).

Runs the same SCC job (fresh pinned JVM per run, via scaling_bench.run)
for each (expand, unroll) variant at the given size/parallelism and
appends results to tools/expand_headtohead.json.

Usage:
  python tools/expand_headtohead.py [--files 1000000] [--cpus 32]
      [--variants join:1,join:2,join:4,csr:1]
"""

from __future__ import annotations

import argparse
import json
import os

from scaling_bench import REPO, run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--variants", default="join:1,join:2,join:4,csr:1")
    args = ap.parse_args()

    results = []
    for spec in args.variants.split(","):
        expand, unroll = spec.split(":")
        os.environ["SPARK_GRAFT_EXPAND"] = expand
        os.environ["SPARK_GRAFT_UNROLL"] = unroll
        r = run(args.cpus, args.files)
        r["n_files"] = args.files
        print(json.dumps(r), flush=True)
        results.append(r)

    path = os.path.join(REPO, "tools", "expand_headtohead.json")
    hist = []
    if os.path.exists(path):
        with open(path) as f:
            hist = json.load(f)
    hist.extend(results)
    with open(path, "w") as f:
        json.dump(hist, f, indent=2)


if __name__ == "__main__":
    main()
