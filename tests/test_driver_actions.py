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
