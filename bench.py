"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline queries:
  * graph algorithms (SCC + its coloring/partitioned variants /
    PageRank / WCC / LPA / triangles) on the deterministic synthetic
    import graph (corpus of $SPARK_GRAFT_BENCH_FILES files, default
    100k — successor-ring + shortcut shape, giant SCC backbone), the
    engine's primary workload
  * training-pipeline ops (minhash LSH, embedding top-k) and the
    relational layer at $SPARK_GRAFT_SF_DIR

Also reports scc_edges_per_sec (the BASELINE.md target metric). Runs on
local[$SPARK_GRAFT_CPUS]; scaling efficiency between two parallelism
levels is measured by tools/scaling_bench.py (same input, CPUS=8 vs 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "100000"))


def main():
    from detectingscc_spark.corpus import generate_corpus
    from detectingscc_spark.ingest import ingest
    from detectingscc_spark.operators.components import connected_components
    from detectingscc_spark.operators.lpa import label_propagation
    from detectingscc_spark.operators.pagerank import pagerank
    from detectingscc_spark.operators.scc import strongly_connected_components
    from detectingscc_spark.operators.triangles import triangle_count
    from detectingscc_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="bench")
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # EVERY leg records a MEDIAN of SPARK_GRAFT_MED_TRIALS (default 3)
    # in-JVM runs: this VM has a documented 1.6-2x per-run swing
    # (BASELINE.md round-4 paired adjudication) and a whole-suite
    # hypervisor swing that round 5 measured dragging even sub-second
    # relational legs +59% to +328% in lockstep, so ANY single sample
    # whipsaws round-over-round comparisons. All trial walls ride in
    # extras as <leg>_trials_sec. The one exception is the forced-fresh
    # LSH index build (extras-only, ~70s, documented one-time amortized
    # cost — tripling it buys nothing). Warm-JVM caveat: the trials
    # share one warmed JVM and persisted inputs, so trial 1 is
    # systematically the coldest and the median here is NOT comparable
    # to fresh-JVM-per-run figures — cross-round/cross-code A/B belongs
    # to tools/regression_bench.py's fresh-JVM order-alternated pairs.
    med_trials = max(1, int(os.environ.get(
        "SPARK_GRAFT_MED_TRIALS", os.environ.get("SPARK_GRAFT_SCC_TRIALS", "3"))))

    def timed_median(name, fn, expect=None, cleanup=None):
        """Median-of-trials wall time; `cleanup` runs on each trial's
        result except the last (e.g. unpersist an intermediate so the
        next trial rebuilds it honestly)."""
        walls, out = [], None
        for i in range(med_trials):
            t0 = time.time()
            out = fn()
            walls.append(round(time.time() - t0, 3))
            if expect is not None:
                assert out == expect, f"{name} returned {out}, expected {expect}"
            if cleanup is not None and i < med_trials - 1:
                cleanup(out)
        timings[name] = sorted(walls)[len(walls) // 2]
        extras[f"{name}_trials_sec"] = walls
        return out

    # ---- build the import graph once (ingest timed separately) -------
    corpus = generate_corpus(spark, N_FILES).persist()
    corpus.count()

    def do_ingest():
        verts, edges, _ = ingest(spark, corpus)
        edges = edges.persist()
        n_edges = edges.count()
        return verts, edges, n_edges

    verts, edges, n_edges = timed_median(
        "ingest_extract_edges", do_ingest, cleanup=lambda out: out[1].unpersist()
    )

    # headline = pure-distributed (local_finish_edges=0): no driver-side
    # Tarjan tail, so the number measures the engine, not driver python —
    # and it is the faster path at this size anyway.
    timed_median(
        "scc",
        lambda: strongly_connected_components(
            spark, edges, verts.select("id"), local_finish_edges=0
        ).count(),
        expect=N_FILES,
    )
    extras["scc_edges_per_sec"] = round(n_edges / timings["scc"], 1)
    extras["scc_n_edges"] = n_edges

    # secondary: the bounded local-finish tail (detectSCC merge-tail
    # analog, same knob the CLI/entry expose)
    timed_median(
        "scc_localtail_100k",
        lambda: strongly_connected_components(
            spark, edges, verts.select("id"), local_finish_edges=100_000
        ).count(),
        expect=N_FILES,
    )
    extras["scc_localtail_edges_per_sec"] = round(n_edges / timings["scc_localtail_100k"], 1)

    # the reference's own algorithm variants (vSlota/wSlota coloring,
    # detectSCC partition-first) on the SAME graph: correctness-green
    # since round 3 but perf-invisible until round 6 — a regression in
    # the coloring fixpoint or the partitioned local phase now shows in
    # the round-over-round record (VERDICT r5 item 2)
    from detectingscc_spark.operators.coloring import scc_coloring
    from detectingscc_spark.operators.partitioned import scc_partitioned

    timed_median(
        "scc_coloring",
        lambda: scc_coloring(spark, edges, verts.select("id")).count(),
        expect=N_FILES,
    )
    timed_median(
        "scc_partitioned",
        lambda: scc_partitioned(
            spark, edges, verts.select("id"), n_parts=32, local_finish_edges=0
        ).count(),
        expect=N_FILES,
    )

    timed_median("pagerank_20it", lambda: pagerank(spark, edges, verts.select("id"), fixed_iters=20).count())
    timed_median("wcc", lambda: connected_components(spark, edges, verts.select("id")).count())
    timed_median("lpa_5r", lambda: label_propagation(spark, edges, verts.select("id"), rounds=5).count())
    timed_median("triangles", lambda: triangle_count(spark, edges))

    from detectingscc_spark.operators.hits import hits
    from detectingscc_spark.operators.triangles import (
        clustering_coefficient,
        degree_assortativity,
    )

    from detectingscc_spark.operators.truss import edge_support

    # edge_support is the per-round kernel of the k-truss peel; timing it
    # (not the 6-round peel) keeps the suite bounded while covering the
    # truss tier's cost driver.
    timed_median("edge_support", lambda: edge_support(spark, edges).count())
    timed_median("hits_10it", lambda: hits(spark, edges, verts.select("id"), iters=10).count())
    timed_median("clustering_coeff", lambda: clustering_coefficient(spark, edges).count())
    timed_median("assortativity", lambda: degree_assortativity(spark, edges).count(), expect=1)

    # ---- pipeline + relational layer on the sf dir --------------------
    for qname in ("minhash_pairs", "embedding_topk", "exact_dedup", "text_stats",
                  "repetition_stats", "bm25_topk", "stratified_sample",
                  "decontaminate",
                  "pricing_summary", "top_orders", "degrees", "sessionize"):
        fn = entry.queries()[qname]
        timed_median(qname, lambda fn=fn: fn(spark, SF_DIR).count())

    # ---- persisted-ANN: BUILD timed separately from PROBE -------------
    # The probe latency is the number the index exists to improve; the
    # build is a one-time amortized cost. Build forced fresh (rebuild)
    # so its timing is honest; the probes then hit the just-written,
    # content-keyed artifact. Extras-only: suite total stays comparable
    # with earlier rounds. Probes + the ~2s IVF build get the same
    # median discipline as everything else; the ~70s LSH build stays a
    # single sample (the one documented exception — see the median
    # comment above).
    def timed_extra_median(name, fn):
        walls = []
        for _ in range(med_trials):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
        extras[name] = sorted(walls)[len(walls) // 2]
        extras[f"{name.removesuffix('_sec')}_trials_sec"] = walls

    t0 = time.time()
    entry.ensure_lsh_index(spark, SF_DIR, n_tables=8, rebuild=True)
    extras["ann_lsh_build_sec"] = round(time.time() - t0, 3)
    lsh_probe = entry.queries()["ann_lsh_indexed"]
    timed_extra_median("ann_probe_sec", lambda: lsh_probe(spark, SF_DIR).count())

    timed_extra_median(
        "ann_ivf_build_sec",
        lambda: entry.ensure_ivf_index(spark, SF_DIR, n_centroids=16, rebuild=True),
    )
    ivf_probe = entry.queries()["ann_ivf_indexed"]
    timed_extra_median("ann_ivf_probe_sec", lambda: ivf_probe(spark, SF_DIR).count())

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "graph+pipeline suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "bench_graph_files": N_FILES,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
