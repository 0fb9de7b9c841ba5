"""Landmark-based harmonic (closeness-family) centrality — the standard
scalable centrality estimate for web-scale link graphs (exact Brandes-
style betweenness is O(V·E); landmark methods are what runs at 100 TB).

dist(lm, v) = min directed hops from landmark lm to v. Per vertex:
  n_reached = |{lm : 0 < dist(lm, v) <= max_hops}|
  harmonic  = Σ_{lm, dist>0} 1 / dist(lm, v)
Landmarks are a deterministic id predicate, so the whole computation is
a fixed deterministic recurrence and the DuckDB oracle is one recursive
CTE with min(dist) per (lm, id) (HARMONIC_SQL in __spark_entry__ caps
the walk depth identically, so the two engines settle the same pairs).

Scale notes: all landmark BFS waves run SIMULTANEOUSLY in one keyed
frontier — per hop ONE shuffle (the frontier-edge join grouped by
(lm, dst)), never one job per landmark. The settled (lm, id, dist) set
uses the same fragment-compaction discipline as operators/bfs.py: a
compacted base plus at most COMPACT_EVERY lazy-union fragments probed by
anti-join, re-checkpointed every COMPACT_EVERY hops. State is
O(landmarks × reachable vertices) rows of 3 longs — the landmark count
is the knob that trades accuracy for state, exactly as in published
landmark-centrality systems.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepRunner


def landmark_distances(
    spark: SparkSession,
    edges: DataFrame,
    landmarks: DataFrame,
    *,
    max_hops: int = 32,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """(lm: long, id: long, dist: long) for every vertex reachable from
    each landmark within `max_hops` directed hops (dist 0 = the landmark
    itself). All landmarks advance in one keyed frontier."""
    runner = runner or SuperstepRunner(spark, run_id="landmarks")
    E = (
        edges.select(F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    E, _ = runner.tick("edges", E.repartition("src"), detach=False)

    seed = (
        landmarks.select(F.col("id").cast("long"))
        .distinct()
        .select(F.col("id").alias("lm"), F.col("id"), F.lit(0).cast("long").alias("dist"))
    )
    seed, f_cnt = runner.tick("settled_0", seed)
    COMPACT_EVERY = 8
    frag_slots: list[str] = ["settled_0"]
    settled_view = seed
    front = seed.select("lm", "id")

    hops = 0
    while f_cnt and hops < max_hops:
        hops += 1
        runner.superstep = hops
        runner.bump("FWD_iterations")
        reached = (
            E.join(front.withColumnRenamed("id", "src"), "src")
            .select("lm", F.col("dst").alias("id"))
            .distinct()
        )
        new = reached.join(
            settled_view.select("lm", "id"), ["lm", "id"], "left_anti"
        ).withColumn("dist", F.lit(hops).cast("long"))
        new, n_cnt = runner.tick(f"settled_{hops}", new)
        if n_cnt == 0:
            break
        frag_slots.append(f"settled_{hops}")
        settled_view = settled_view.unionByName(new)
        if len(frag_slots) >= COMPACT_EVERY:
            settled_view, _ = runner.tick(
                "settled_base", settled_view, count=False, detach=False
            )
            for s in frag_slots[:-1]:
                runner.release(s)
            frag_slots = frag_slots[-1:]
        front = new.select("lm", "id")
        f_cnt = n_cnt
    result = settled_view.select("lm", "id", "dist")
    runner.release("edges")
    return result


def harmonic_centrality(
    spark: SparkSession,
    edges: DataFrame,
    landmarks: DataFrame,
    *,
    max_hops: int = 32,
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """(id, n_reached, harmonic6) over the full vertex universe of
    `edges`: how many landmarks reach each vertex and the harmonic sum
    of those distances (self-distance 0 excluded, per the standard
    harmonic definition; unreached vertices get 0 / 0.0)."""
    md = landmark_distances(spark, edges, landmarks, max_hops=max_hops, runner=runner)
    agg = (
        md.where(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            F.round(F.sum(F.lit(1.0) / F.col("dist")), 6).alias("harmonic6"),
        )
    )
    verts = (
        edges.select(F.col("src").cast("long").alias("id"))
        .union(edges.select(F.col("dst").cast("long").alias("id")))
        .distinct()
    )
    return verts.join(agg, "id", "left").select(
        "id",
        F.coalesce(F.col("n_reached"), F.lit(0)).alias("n_reached"),
        F.coalesce(F.col("harmonic6"), F.lit(0.0)).alias("harmonic6"),
    )
