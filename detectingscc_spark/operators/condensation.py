"""Condensation-DAG analytics: transitive closure by path doubling and
per-component descendant counts (SURVEY.md §2.11 companion family — the
natural follow-on query over the contracted graph the partitioned
engine's merge phase produces, operators/partitioned.py).

Path doubling R ← R ∪ (R ∘ R) converges in ⌈log₂(longest path)⌉ rounds
instead of the longest path itself — the standard trade for distributed
closure (each round is one self-join + distinct on the reach set).

Scale contract: the reach SET (not the input graph) is the cost — for a
web-graph condensation the closure can be quadratic in components, so
this op is intended for bounded condensations (the contraction output of
an SCC run; on sf-scale fixtures tens-to-thousands of components), with
max_rounds as the loud guard. The per-component COUNT output is always
small; only the intermediate reach frame grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepRunner


def transitive_closure(
    spark: SparkSession,
    edges: DataFrame,
    *,
    max_rounds: int = 32,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """All reachability pairs (src, dst), src ≠ dst, of a DAG.

    Cycles would make a (x, x) pair appear and the loop still converges
    (the closure is finite), so the DAG requirement is about output
    semantics, not termination.
    """
    runner = runner or SuperstepRunner(spark, run_id="tclosure")
    r = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    ).distinct()
    r, n = runner.tick("reach", r)
    for i in range(max_rounds):
        runner.superstep = i + 1
        runner.bump("iterations")
        comp = (
            r.join(
                r.select(F.col("src").alias("dst"), F.col("dst").alias("dst2")), "dst"
            )
            .select("src", F.col("dst2").alias("dst"))
        )
        nxt = r.unionAll(comp).distinct()
        nxt, n_next = runner.tick("reach_next", nxt)
        runner.promote("reach_next", "reach")
        converged = n_next == n
        r, n = nxt, n_next
        if converged:
            break
    else:
        raise RuntimeError(f"transitive_closure: no fixpoint within max_rounds={max_rounds}")
    result = r
    runner.release("reach")
    return result


def dag_reachability(
    spark: SparkSession,
    dag_edges: DataFrame,
    comps: DataFrame | None = None,
    **kw,
) -> DataFrame:
    """(scc_id, n_desc): number of distinct components reachable from
    each component of the condensation (0 for sinks). `comps(scc_id)`
    widens the universe to components with no DAG edges at all."""
    closure = transitive_closure(spark, dag_edges, **kw)
    counts = closure.groupBy(F.col("src").alias("scc_id")).agg(
        F.count(F.lit(1)).alias("n_desc")
    )
    universe = dag_edges.select(F.col("src").cast("long").alias("scc_id")).union(
        dag_edges.select(F.col("dst").cast("long").alias("scc_id"))
    )
    if comps is not None:
        universe = universe.union(comps.select(F.col("scc_id").cast("long")))
    return (
        universe.distinct()
        .join(counts, "scc_id", "left")
        .select("scc_id", F.coalesce(F.col("n_desc"), F.lit(0)).alias("n_desc"))
    )
