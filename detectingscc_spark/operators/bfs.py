"""Multi-source BFS shortest hop-distance (link-graph primitive; the
directed single-direction specialization of the SCC engine's frontier
machinery, exposed as its own operator).

dist(v) = min hops from any source to v along directed edges; vertices
unreachable from the source set are absent from the output. A bounded
run (`max_hops`) is a fixed-depth deterministic recurrence, so the
DuckDB oracle expresses it directly as a recursive CTE with min(dist)
(BFS_DIST_SQL in __spark_entry__).

Scale notes: per hop ONE shuffle — the frontier-edge join grouped by
dst; the settled-distance frame is only probed with a left_anti join
(new = reached minus settled), never rewritten; frontiers shrink once
the wavefront passes the graph's bulk. Same plan shape as the SCC
engine's forward sweep (operators/scc.py::_bfs_join), minus the
direction tagging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepRunner


def bfs_distances(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    *,
    max_hops: int = 64,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """Return (id: long, dist: long) for every vertex reachable from
    `sources` (an `id` DataFrame) within `max_hops` directed hops;
    sources themselves have dist 0."""
    runner = runner or SuperstepRunner(spark, run_id="bfs")
    E = (
        edges.select(F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    E, _ = runner.tick("edges", E.repartition("src"), detach=False)

    seed = sources.select(F.col("id").cast("long")).distinct().withColumn(
        "dist", F.lit(0).cast("long")
    )
    seed, f_cnt = runner.tick("settled_0", seed)
    # settled accumulates as materialized fragments (one per hop) — each
    # hop issues exactly ONE driver action (the `new` tick); the settled
    # view is a union of already-checkpointed leaves, probed by the
    # anti-join, never rewritten
    frags = [seed]
    settled_view = seed
    front = seed.select("id")

    hops = 0
    while f_cnt and hops < max_hops:
        hops += 1
        runner.superstep = hops
        runner.bump("FWD_iterations")
        reached = (
            E.join(front.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        new = reached.join(settled_view.select("id"), "id", "left_anti").withColumn(
            "dist", F.lit(hops).cast("long")
        )
        new, n_cnt = runner.tick(f"settled_{hops}", new)
        if n_cnt == 0:
            break
        frags.append(new)
        settled_view = settled_view.unionByName(new)
        front = new.select("id")
        f_cnt = n_cnt
    result = settled_view.select("id", "dist")
    runner.release("edges")
    return result
