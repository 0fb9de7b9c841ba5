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

Superstep fixed-cost discipline (round-7, guide §2.4 — the leg was
job-count-bound, ~85 ms of scheduling+planning per Spark job at any
scale):
  * the round-entry residual refresh is skipped in round 1 (every vertex
    is active — a no-op filter) and the post-trim refresh is skipped
    when trim1 removed nothing;
  * trim1's endpoint probes are semi-joins against the RAW src/dst
    columns — the old per-side `.distinct()` bought nothing (the hash
    build dedups) and cost an exchange each;
  * each propagation tick applies pointer jumps FIRST, against the
    already-MATERIALIZED color frame (cheap broadcast self-lookups), and
    then one pull-max — the old pull-then-jump self-join re-evaluated
    the whole un-materialized pull subtree twice per tick (Spark does
    not reuse subplans) and sort-merge-joined it. Two jumps per tick
    triple path-shortening per round; any trajectory reaches the same
    unique fixpoint (max forward-reachable id), detected by the same
    monotone color-sum observation;
  * the class-confined BFS keeps the visited set as a lazy union of
    materialized per-hop fragments (one tick per hop, compacted every
    8 hops — operators/bfs.py discipline) instead of re-materializing
    the whole visited set every hop;
  * retired vertices accumulate as materialized `done` fragments unioned
    once at the end (the scc.py emit_done discipline) instead of
    rewriting the whole done set every round.

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
    prop_jumps: int = 2,
) -> DataFrame:
    runner = runner or SuperstepRunner(spark, run_id="scc_coloring")
    E = _canonical_edges(edges)
    verts = E.select(F.col("src").alias("id")).union(E.select(F.col("dst").alias("id"))).distinct()
    if vertices is not None:
        verts = verts.union(vertices.select(F.col("id").cast("long"))).distinct()

    active, a_cnt = runner.tick("active", verts.select("id"))
    re, re_cnt = runner.tick("re", E, detach=False)

    done_frags: list[DataFrame] = []

    def emit_done(new_rows: DataFrame) -> None:
        frag, _ = runner.tick(
            f"done_{len(done_frags)}", new_rows.select("id", "scc_id"),
            count=False, detach=False,
        )
        done_frags.append(frag)

    def all_done() -> DataFrame:
        out = done_frags[0]
        for frag in done_frags[1:]:
            out = out.unionByName(frag)
        return out

    emit_done(spark.createDataFrame([], "id long, scc_id long"))

    rnd = 0
    while a_cnt > 0:
        rnd += 1
        runner.bump("iterations")
        runner.superstep = rnd
        if rnd > max_rounds:
            raise RuntimeError("coloring SCC did not converge")

        # residual edges between active vertices (round 1: every vertex is
        # active, the filter is a no-op — skip the tick entirely)
        if rnd > 1:
            av = _bc(active, a_cnt)
            re, re_cnt = runner.tick(
                "re",
                re.join(av.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(av.withColumnRenamed("id", "dst"), "dst", "left_semi"),
                detach=False,
            )

        # trim1 once (vSlota style): semi-probe the raw endpoint columns
        # (no distinct — the semi-join hash build dedups for free)
        survivors, s_cnt = runner.tick(
            "active_next",
            active.join(re.select(F.col("src").alias("id")), "id", "left_semi")
            .join(re.select(F.col("dst").alias("id")), "id", "left_semi"),
        )
        if s_cnt < a_cnt:
            emit_done(
                active.join(survivors.select("id"), "id", "left_anti")
                .select("id", F.col("id").alias("scc_id"))
            )
        runner.promote("active_next", "active")
        trimmed = s_cnt < a_cnt
        active, a_cnt = survivors, s_cnt
        if a_cnt == 0:
            break
        if trimmed:
            re, re_cnt = runner.tick(
                "re",
                re.join(_bc(active, a_cnt).withColumnRenamed("id", "src"), "src", "left_semi")
                .join(_bc(active, a_cnt).withColumnRenamed("id", "dst"), "dst", "left_semi"),
                detach=False,
            )

        # ---- max-color propagation with pointer jumping ---------------
        # color(v) = max id forward-reachable. Each tick: `prop_jumps`
        # pointer jumps against the MATERIALIZED previous colors (pure
        # broadcast lookups, no recompute), then one pull-max over
        # out-edges. Monotone increasing; sum fixpoint = converged.
        from pyspark.sql import Observation

        from .scc import BROADCAST_ROW_LIMIT, _part_target

        # while the color frame is broadcast-able every pull join is
        # broadcast-hash, so a PERSISTED copy of the residual partitioned
        # by the pull's AGG key (src) makes each propagation tick's
        # aggregation exchange-free (persist, unlike localCheckpoint,
        # preserves partitioning and the broadcast join carries it
        # through). Past the broadcast regime the pull is a shuffle join
        # on dst and the re frame is used as-is.
        if a_cnt <= BROADCAST_ROW_LIMIT:
            prop_re, _ = runner.tick(
                "prop_re",
                re.repartition(_part_target(re_cnt), "src"),
                truncate=False, count=False, detach=False,
            )
        else:
            prop_re = re

        col_df, _ = runner.tick("color", active.select("id", F.col("id").alias("color")))
        prev = None
        converged = False
        for it in range(max_prop_iters):
            runner.bump("FWD_iterations")
            cur = col_df
            for _j in range(prop_jumps):
                # lookup side is the detached (stats-reset) color frame —
                # hint the broadcast from the driver-known row count
                cur = cur.join(
                    _bc(col_df.select(F.col("id").alias("color"), F.col("color").alias("cc")), a_cnt),
                    "color",
                    "left",
                ).select(
                    "id",
                    F.greatest(F.col("color"), F.coalesce(F.col("cc"), F.col("color"))).alias("color"),
                )
            nbr = (
                prop_re.join(_bc(cur.select(F.col("id").alias("dst"), F.col("color").alias("nc")), a_cnt), "dst")
                .groupBy("src")
                .agg(F.max("nc").alias("nmax"))
                .select(F.col("src").alias("id"), "nmax")
            )
            c1 = cur.join(_bc(nbr, a_cnt), "id", "left").select(
                "id", F.greatest(F.col("color"), F.coalesce(F.col("nmax"), F.col("color"))).alias("color")
            )
            obs = Observation(f"col_{rnd}_{it}")
            col_df, _ = runner.tick(
                "color", c1.observe(obs, F.sum("color").alias("s")), count=False
            )
            cur_sum = obs.get["s"]
            if cur_sum == prev:
                converged = True
                prev_iters = it + 1
                break
            prev = cur_sum
        if not converged:
            # stale colors would let the class-confined BFS split an SCC
            # silently; fail loudly like the FB engine's max_rounds guard
            raise RuntimeError(
                f"color propagation did not converge in {max_prop_iters} iterations"
            )
        runner.log("color_prop_done", iters=prev_iters)

        # ---- forward BFS from roots within color class -> SCCs --------
        ce = (
            re.join(_bc(col_df.select(F.col("id").alias("src"), F.col("color").alias("sc")), a_cnt), "src")
            .join(_bc(col_df.select(F.col("id").alias("dst"), F.col("color").alias("dc")), a_cnt), "dst")
            .where(F.col("sc") == F.col("dc"))
            .select("src", "dst")
        )
        # persisted + partitioned by the hop dedup key (dst): while the
        # frontier broadcasts, each BFS hop's distinct is exchange-free
        ce, _ = runner.tick(
            "ce", ce.repartition(_part_target(re_cnt), "dst"),
            truncate=False, count=False, detach=False,
        )
        # visited set = compacted base + materialized per-hop fragments
        # (lazy union, one tick per hop — operators/bfs.py discipline)
        seed, v_cnt = runner.tick(
            "vis_0", col_df.where(F.col("color") == F.col("id")).select("id"), detach=False
        )
        COMPACT_EVERY = 8
        frag_slots = ["vis_0"]
        vis_view = seed
        front, f_cnt = seed, v_cnt
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
                .join(vis_view, "id", "left_anti")
            )
            front, f_cnt = runner.tick(f"vis_{hops}", new, detach=False)
            if f_cnt:
                frag_slots.append(f"vis_{hops}")
                vis_view = vis_view.unionByName(front)
                if len(frag_slots) >= COMPACT_EVERY:
                    vis_view, _ = runner.tick(
                        "vis_base", vis_view, count=False, detach=False
                    )
                    # newest fragment stays alive: it is the live frontier
                    for s in frag_slots[:-1]:
                        runner.release(s)
                    frag_slots = frag_slots[-1:]

        runner.log("class_bfs_done", hops=hops)
        # retired = visited; scc label = min member id per color class
        retired = vis_view.join(_bc(col_df, a_cnt), "id")
        reps = retired.groupBy("color").agg(F.min("id").alias("scc_id"))
        emit_done(retired.join(_bc(reps, a_cnt), "color").select("id", "scc_id"))
        active, a_cnt = runner.tick("active", active.join(vis_view, "id", "left_anti"))
        runner.log("coloring_round", round=rnd, active=a_cnt, prop_iters=prev_iters, bfs_hops=hops)
        for s in ("color", "ce", "vis_base", "prop_re", *frag_slots):
            runner.release(s)

    return all_done().select(F.col("id").cast("long"), F.col("scc_id").cast("long"))
