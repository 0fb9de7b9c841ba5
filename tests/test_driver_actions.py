"""Driver-action budget guard.

At cluster scale the engine's Amdahl term is the NUMBER of driver
actions (Spark jobs) per run, not any one job's size: every superstep
costs a fixed scheduling round-trip, so an accidental second eager
action per tick (a stray .count(), an un-folded Observation, an eager
sizing job) silently doubles the fixed cost long before any benchmark
at fixture scale notices. The counts below are exactly reproducible
run-to-run (74/74/74 across trials at commit time); the bounds carry
~15% headroom for benign plan evolution while still catching a
+1-action-per-tick regression (sample1 alone has 7 FWD + 7 BWD hops,
so that failure mode adds >=14 jobs)."""

import os

from detectingscc_spark.operators.scc import strongly_connected_components
from detectingscc_spark.sources.gtgraph import gtgraph_meta, read_gtgraph

from .conftest import REF_DATA

# measured 62 (sample0) / 74 (sample1) jobs at the round-6 commit
_BUDGET = {"sample0": 72, "sample1": 85}


def _jobs_for_scc(spark, name):
    path = os.path.join(REF_DATA, f"{name}.gr")
    v, _ = gtgraph_meta(spark, path)
    edges = read_gtgraph(spark, path)
    sc = spark.sparkContext
    group = f"action-budget-{name}"
    sc.setJobGroup(group, "driver-action budget guard")
    try:
        n = strongly_connected_components(
            spark, edges, spark.range(1, v + 1), local_finish_edges=0
        ).count()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert n == v
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_scc_driver_action_budget(spark):
    for name, budget in _BUDGET.items():
        jobs = _jobs_for_scc(spark, name)
        assert jobs <= budget, (
            f"scc on {name} submitted {jobs} Spark jobs (budget {budget}): "
            "a new eager action per tick multiplies superstep fixed cost "
            "at cluster scale — fold the count into the tick's Observation "
            "or make the frame lazy"
        )


def test_hits_driver_action_budget(spark):
    """hits() submits a LINEAR number of jobs in the iteration count:
    measured exactly 16/iteration + 6 constant (iters 1..4 -> 22/38/54/70
    at commit time; the 16 = 2 eager raw-push checkpoints plus AQE
    stage/broadcast sub-jobs per half-step). The budget (60 for iters=3,
    ~11% headroom) catches the two regressions that matter at cluster
    scale: a new eager action per half-step (+6) and, worse, any
    superlinear growth from un-truncated lineage re-evaluation."""
    from detectingscc_spark.operators.hits import hits

    path = os.path.join(REF_DATA, "sample1.gr")
    v, _ = gtgraph_meta(spark, path)
    edges = read_gtgraph(spark, path)
    sc = spark.sparkContext
    group = "action-budget-hits"
    sc.setJobGroup(group, "driver-action budget guard")
    try:
        n = hits(spark, edges, spark.range(1, v + 1), iters=3).count()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert n == v
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    assert jobs <= 60, (
        f"hits(iters=3) submitted {jobs} Spark jobs (budget 60, measured "
        "54 = 16/iter + 6 at commit time): an eager action crept into the "
        "per-half-step path or lineage re-evaluation went superlinear"
    )
