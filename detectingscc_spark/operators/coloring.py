"""SCC via coloring / MultiStep (the reference's `vSlota`/`wSlota`
variants, /root/reference/src/scc_Coloring.cu:403-701 and :6-400).

Algorithm per round (host loop at /root/reference/src/scc_Coloring.cu:
590-637):
  1. max-color propagation to fixpoint over forward edges:
     color(v) = max(v, colors of out-neighbors)
     (`colorPropagation`, /root/reference/src/scc_kernels.cu:539-564) —
     at fixpoint color(v) = max id forward-reachable from v;
  2. roots: color(v) == v (`selectPivotColoring`, scc_kernels.cu:567-580);
  3. forward BFS from each root CONFINED to its color class
     (`fwdColoring`, scc_kernels.cu:584-610): every reached w has
     color w = root, i.e. w reaches root, and root reaches w — so the
     visited set is exactly root's SCC; retire it with
     scc_id = min member id;
  4. survivors reset (`updateColoring`, scc_kernels.cu:614-623); repeat.

trim1 runs once per round like vSlota (scc_Coloring.cu:507-508), not to
fixpoint. Like vHong, an initial single-pivot FB round knocks out the
giant SCC first — we skip that and let color classes handle it: the max
root's class IS the giant SCC's closure, and pointer-jumping keeps the
propagation rounds logarithmic.

Same output contract as operators/scc.py; equivalence tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepRunner
from .scc import _bc, _canonical_edges


def scc_coloring(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    *,
    runner: SuperstepRunner | None = None,
    max_rounds: int = 64,
    max_prop_iters: int = 200,
    max_bfs_hops: int = 10_000,
) -> DataFrame:
    runner = runner or SuperstepRunner(spark, run_id="scc_coloring")
    E = _canonical_edges(edges)
    verts = E.select(F.col("src").alias("id")).union(E.select(F.col("dst").alias("id"))).distinct()
    if vertices is not None:
        verts = verts.union(vertices.select(F.col("id").cast("long"))).distinct()

    active, a_cnt = runner.tick("active", verts.select("id"))
    re, _ = runner.tick("re", E, detach=False)
    done, _ = runner.tick("done", spark.createDataFrame([], "id long, scc_id long"), count=False)

    rnd = 0
    while a_cnt > 0:
        rnd += 1
        runner.bump("iterations")
        runner.superstep = rnd
        if rnd > max_rounds:
            raise RuntimeError("coloring SCC did not converge")

        # residual edges between active vertices
        av = _bc(active, a_cnt)
        re, re_cnt = runner.tick(
            "re",
            re.join(av.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(av.withColumnRenamed("id", "dst"), "dst", "left_semi"),
            detach=False,
        )

        # trim1 once (vSlota style)
        has_out = re.select(F.col("src").alias("id")).distinct()
        has_in = re.select(F.col("dst").alias("id")).distinct()
        survivors, s_cnt = runner.tick(
            "active_next", active.join(has_out, "id", "left_semi").join(has_in, "id", "left_semi")
        )
        if s_cnt < a_cnt:
            trimmed = active.join(survivors.select("id"), "id", "left_anti")
            done, _ = runner.tick(
                "done",
                done.unionByName(trimmed.select("id", F.col("id").alias("scc_id"))),
                count=False,
            )
        runner.promote("active_next", "active")
        active, a_cnt = survivors, s_cnt
        if a_cnt == 0:
            break
        re, re_cnt = runner.tick(
            "re",
            re.join(_bc(active, a_cnt).withColumnRenamed("id", "src"), "src", "left_semi")
            .join(_bc(active, a_cnt).withColumnRenamed("id", "dst"), "dst", "left_semi"),
            detach=False,
        )

        # ---- max-color propagation with pointer jumping ---------------
        # color(v) = max id forward-reachable; pull-max over out-edges,
        # then jump color <- color(color) (both monotone increasing)
        from pyspark.sql import Observation

        col_df, _ = runner.tick("color", active.select("id", F.col("id").alias("color")))
        prev = None  # colors monotone non-decreasing; sum fixpoint = converged
        converged = False
        for it in range(max_prop_iters):
            runner.bump("FWD_iterations")
            nbr = (
                re.join(col_df.select(F.col("id").alias("dst"), F.col("color").alias("nc")), "dst")
                .groupBy("src")
                .agg(F.max("nc").alias("nmax"))
                .select(F.col("src").alias("id"), "nmax")
            )
            c1 = col_df.join(nbr, "id", "left").select(
                "id", F.greatest(F.col("color"), F.coalesce(F.col("nmax"), F.col("color"))).alias("color")
            )
            c2 = c1.alias("a").join(
                c1.select(F.col("id").alias("color"), F.col("color").alias("cc")).alias("b"),
                "color",
                "left",
            ).select(
                F.col("id"),
                F.greatest(F.col("color"), F.coalesce(F.col("cc"), F.col("color"))).alias("color"),
            )
            obs = Observation(f"col_{rnd}_{it}")
            col_df, _ = runner.tick(
                "color", c2.observe(obs, F.sum("color").alias("s")), count=False
            )
            cur = obs.get["s"]
            if cur == prev:
                converged = True
                break
            prev = cur
        if not converged:
            # stale colors would let the class-confined BFS split an SCC
            # silently; fail loudly like the FB engine's max_rounds guard
            raise RuntimeError(
                f"color propagation did not converge in {max_prop_iters} iterations"
            )

        # ---- forward BFS from roots within color class -> SCCs --------
        ce = (
            re.join(col_df.select(F.col("id").alias("src"), F.col("color").alias("sc")), "src")
            .join(col_df.select(F.col("id").alias("dst"), F.col("color").alias("dc")), "dst")
            .where(F.col("sc") == F.col("dc"))
            .select("src", "dst")
        )
        ce, _ = runner.tick("ce", ce, detach=False)
        vis, v_cnt = runner.tick("vis", col_df.where(F.col("color") == F.col("id")).select("id"), detach=False)
        front, f_cnt = vis, v_cnt
        hops = 0
        while f_cnt > 0:
            hops += 1
            if hops > max_bfs_hops:
                raise RuntimeError("coloring BFS exceeded max hops")
            runner.bump("BWD_iterations")
            new = (
                ce.join(_bc(front.withColumnRenamed("id", "src"), f_cnt), "src")
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(vis, "id", "left_anti")
            )
            front, f_cnt = runner.tick("front", new, detach=False)
            if f_cnt:
                vis, _ = runner.tick("vis", vis.unionByName(front), count=False, detach=False)

        # retired = visited; scc label = min member id per color class
        retired = vis.join(col_df, "id")
        reps = retired.groupBy("color").agg(F.min("id").alias("scc_id"))
        new_done = retired.join(_bc(reps, None), "color").select("id", "scc_id")
        done, _ = runner.tick("done", done.unionByName(new_done), count=False)
        active, a_cnt = runner.tick("active", active.join(vis, "id", "left_anti"))
        runner.log("coloring_round", round=rnd, active=a_cnt)
        for s in ("color", "ce", "vis", "front"):
            runner.release(s)

    return done.select(F.col("id").cast("long"), F.col("scc_id").cast("long"))
