"""Strongly connected components via forward-backward reachability with
trim-1/trim-2 pruning (FB-Trim), as iterative DataFrame supersteps.

Re-expresses the reference's `vHong` driver
(/root/reference/src/scc_WCC.cu:568-967) Spark-first:

  phase                reference                       here
  -----                ---------                       ----
  trim1 fixpoint       scc_kernels.cu:187-233          degree semi-joins + anti-join
  trim2                scc_kernels.cu:236-357          indeg==1 mutual-only-neighbor self-join
  pivot election       scc_kernels.cu:57-74,643-656    groupBy(range).agg(max_by(id, struct(prod,-id)))
                       (racy argmax)                   -> deterministic tie-break
  FW/BW BFS            scc_kernels.cu:360-386,419-445  frontier join vs residual edges
  update 3r+fw+2bw     scc_kernels.cu:124-142          (range,sub)->min(id) re-labeling
                                                       (bounded labels, no 3^k overflow)
  WCC decomposition    scc_WCC.cu:829-840              hash-min + pointer jumping

Output contract: (id: long, scc_id: long) with scc_id = min member id
(canonical labels; the reference's racy pivots make its raw labels
nondeterministic, but the partition itself is identical).

Scale notes (100 TB design): residual edges are re-materialized per round
so BFS joins never touch the full edge table; frontiers are broadcast
while small; all per-vertex state is (id, range, fw, bw) — 25 bytes/row;
every round localCheckpoints state to truncate lineage and optionally
commits a durable parquet checkpoint for resume (north_rule). When the
residual shrinks below `local_finish_edges` the driver finishes it with an
in-memory Tarjan pass — the distributed rounds have already removed the
giant SCC and trims, and a sub-threshold tail is latency- not
throughput-bound (mirrors the intent of detectSCC's merge phase,
/root/reference/src/scc_WCC.cu:1345-1528, without its quadratic closure
sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.superstep import SuperstepRunner

BROADCAST_ROW_LIMIT = 2_000_000


def _bc(df: DataFrame, cnt: int | None) -> DataFrame:
    """Broadcast hint for driver-known-small frames (frontiers, pivots)."""
    if cnt is not None and cnt <= BROADCAST_ROW_LIMIT:
        return F.broadcast(df)
    return df


def _canonical_edges(edges: DataFrame) -> DataFrame:
    """Dedup + drop self loops. SCC membership is invariant under both
    (the reference keeps duplicate edges, /root/reference/src/load.cpp;
    results agree — see tests on the dup-edge fixture)."""
    return (
        edges.select(F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
    )


def _tarjan_local(edge_rows, vertex_ids):
    """Iterative Tarjan on the (small) residual graph, driver-side.
    Returns {vertex: scc_min_id}."""
    adj: dict = {v: [] for v in vertex_ids}
    for s, d in edge_rows:
        if s in adj and d in adj:
            adj[s].append(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    result = {}
    counter = [0]
    for root in vertex_ids:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            nbrs = adj[v]
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    if index[w] < low[v]:
                        low[v] = index[w]
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    result[w] = m
            work.pop()
            if work:
                p, _ = work[-1]
                if low[v] < low[p]:
                    low[p] = low[v]
    return result


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    *,
    runner: SuperstepRunner | None = None,
    checkpoint_dir: str | None = None,
    max_rounds: int = 64,
    max_bfs_hops: int = 10_000,
    local_finish_edges: int = 0,
    decompose_every: int = 4,
    decompose_iters: int = 12,
    trim2_enabled: bool = True,
) -> DataFrame:
    """Compute SCCs of a directed graph given as edges(src, dst).

    `vertices(id)` optionally supplies isolated vertices (GTgraph declares
    V explicitly; vertices without arcs are singleton SCCs — e.g.
    /root/reference/data/sample0.gr has V=6 with two arcless vertices).

    Set `local_finish_edges > 0` to let the driver finish a sub-threshold
    residual with in-memory Tarjan (recommended ~2e5 for interactive runs;
    tests exercise both paths).
    """
    runner = runner or SuperstepRunner(spark, checkpoint_dir=checkpoint_dir)

    resumed = runner.resume()
    done_parts: list[DataFrame] = []
    if resumed is not None:
        _, states = resumed
        active, a_cnt = runner.tick("active", states["active"])
        done, _ = runner.tick("done", states["done"])
        done_parts.append(done)
        E, _ = runner.tick("edges", states["edges"])
        rnd = runner.superstep
    else:
        E, _ = runner.tick("edges", _canonical_edges(edges).repartition("src"))
        verts = E.select(F.col("src").alias("id")).union(E.select(F.col("dst").alias("id"))).distinct()
        if vertices is not None:
            verts = verts.union(vertices.select(F.col("id").cast("long"))).distinct()
        init = verts.select("id", F.lit(0).cast("long").alias("range"))
        active, a_cnt = runner.tick("active", init)
        empty_done = spark.createDataFrame([], "id long, scc_id long")
        done, _ = runner.tick("done", empty_done)
        done_parts.append(done)
        rnd = 0

    def emit_done(new_rows: DataFrame) -> None:
        nonlocal done
        d, _ = runner.tick("done", done.unionByName(new_rows.select("id", "scc_id")))
        done = d
        done_parts[:] = [d]

    while a_cnt > 0:
        rnd += 1
        runner.superstep = rnd
        runner.bump("iterations")
        if rnd > max_rounds:
            raise RuntimeError(f"SCC did not converge in {max_rounds} rounds")

        # ---- optional range decomposition (weak components of residual) --
        if rnd > 1 and decompose_every and (rnd - 2) % decompose_every == 0:
            active, a_cnt = _decompose(runner, spark, E, active, a_cnt, decompose_iters)
            runner.log("decompose", active=a_cnt)

        # ---- trim1 fixpoint ------------------------------------------
        active, a_cnt = _trim1_fixpoint(runner, E, active, a_cnt, emit_done)
        if a_cnt == 0:
            break

        # ---- trim2 (2-cycle SCCs), then re-trim if it fired ----------
        if trim2_enabled:
            active, a_cnt, fired = _trim2(runner, E, active, a_cnt, emit_done)
            if fired:
                active, a_cnt = _trim1_fixpoint(runner, E, active, a_cnt, emit_done)
            if a_cnt == 0:
                break

        # ---- residual same-range edges (all later phases touch only this)
        a_src = _bc(active, a_cnt).select(F.col("id").alias("src"), F.col("range").alias("srange"))
        a_dst = _bc(active, a_cnt).select(F.col("id").alias("dst"), F.col("range").alias("drange"))
        re = (
            E.join(a_src, "src")
            .join(a_dst, "dst")
            .where(F.col("srange") == F.col("drange"))
            .select("src", "dst", F.col("srange").alias("range"))
        )
        re_f, re_cnt = runner.tick("re_f", re.repartition("src"))
        runner.log("residual", active=a_cnt, edges=re_cnt)

        # ---- optional driver-side finish for a tiny residual ----------
        if local_finish_edges and re_cnt <= local_finish_edges:
            rows = [(r["src"], r["dst"]) for r in re_f.select("src", "dst").collect()]
            ids = [r["id"] for r in active.select("id").collect()]
            labels = _tarjan_local(rows, ids)
            pdf_done = spark.createDataFrame(
                [(int(v), int(s)) for v, s in labels.items()], "id long, scc_id long"
            )
            emit_done(pdf_done)
            a_cnt = 0
            runner.log("local_finish", vertices=len(ids), edges=len(rows))
            break

        re_b, _ = runner.tick("re_b", re_f.repartition("dst"))

        # ---- pivot election: per-range argmax of indeg*outdeg ---------
        outd = re_f.groupBy("src").count().select(F.col("src").alias("id"), F.col("count").alias("od"))
        ind = re_b.groupBy("dst").count().select(F.col("dst").alias("id"), F.col("count").alias("inde"))
        degs = outd.join(ind, "id", "full").select(
            "id", (F.coalesce("od", F.lit(0)) * F.coalesce("inde", F.lit(0))).alias("prod")
        )
        pivots = (
            active.join(degs, "id", "left")
            .select("id", "range", F.coalesce("prod", F.lit(0)).alias("prod"))
            .groupBy("range")
            .agg(F.expr("max_by(id, struct(prod, -id))").alias("pivot"))
        )
        pivots, p_cnt = runner.tick("pivots", pivots)
        runner.log("pivots", ranges=p_cnt)

        # ---- FW + BW BFS from all pivots, confined to their range -----
        state = active.join(
            _bc(pivots, p_cnt).select(F.col("range"), F.col("pivot")), "range", "left"
        ).select(
            "id",
            "range",
            F.coalesce(F.col("id") == F.col("pivot"), F.lit(False)).alias("fw"),
            F.coalesce(F.col("id") == F.col("pivot"), F.lit(False)).alias("bw"),
        )
        state, _ = runner.tick("state", state)
        ff, f_cnt = runner.tick("ff", state.where("fw").select("id"))
        fb, b_cnt = runner.tick("fb", state.where("bw").select("id"))

        hops = 0
        while f_cnt > 0 or b_cnt > 0:
            hops += 1
            if hops > max_bfs_hops:
                raise RuntimeError("BFS exceeded max hops")
            new_f = new_b = None
            # frontiers are bare id sets: residual edges are already
            # same-range, so expansion cannot leak across ranges
            if f_cnt > 0:
                runner.bump("FWD_iterations")
                cand = (
                    re_f.join(_bc(ff.withColumnRenamed("id", "src"), f_cnt), "src")
                    .select(F.col("dst").alias("id"))
                    .distinct()
                )
                new_f = cand.join(state.where(~F.col("fw")).select("id"), "id", "left_semi")
            if b_cnt > 0:
                runner.bump("BWD_iterations")
                cand = (
                    re_b.join(_bc(fb.withColumnRenamed("id", "dst"), b_cnt), "dst")
                    .select(F.col("src").alias("id"))
                    .distinct()
                )
                new_b = cand.join(state.where(~F.col("bw")).select("id"), "id", "left_semi")

            if new_f is not None:
                ff, f_cnt = runner.tick("ff", new_f)
            else:
                f_cnt = 0
            if new_b is not None:
                fb, b_cnt = runner.tick("fb", new_b)
            else:
                b_cnt = 0
            if f_cnt == 0 and b_cnt == 0:
                break

            upd = None
            if f_cnt > 0:
                upd = ff.select("id", F.lit(True).alias("nf"), F.lit(False).alias("nb"))
            if b_cnt > 0:
                ub = fb.select("id", F.lit(False).alias("nf"), F.lit(True).alias("nb"))
                upd = ub if upd is None else upd.unionByName(ub)
            upd = upd.groupBy("id").agg(F.max("nf").alias("nf"), F.max("nb").alias("nb"))
            state = (
                state.join(_bc(upd, (f_cnt or 0) + (b_cnt or 0)), "id", "left")
                .select(
                    "id",
                    "range",
                    (F.col("fw") | F.coalesce(F.col("nf"), F.lit(False))).alias("fw"),
                    (F.col("bw") | F.coalesce(F.col("nb"), F.lit(False))).alias("bw"),
                )
            )
            state, _ = runner.tick("state", state)
        runner.log("bfs", hops=hops)

        # ---- update: FW∩BW = pivot's SCC; survivors re-ranged ---------
        in_scc = state.where(F.col("fw") & F.col("bw"))
        reps = in_scc.groupBy("range").agg(F.min("id").alias("scc_id"))
        emit_done(in_scc.join(_bc(reps, p_cnt), "range").select("id", "scc_id"))

        surv = state.where(~(F.col("fw") & F.col("bw"))).withColumn(
            "sub", F.when(F.col("fw"), 1).when(F.col("bw"), 2).otherwise(0)
        )
        regroup = surv.groupBy("range", "sub").agg(F.min("id").alias("new_range"))
        active = surv.join(_bc(regroup, None), ["range", "sub"]).select(
            "id", F.col("new_range").alias("range")
        )
        active, a_cnt = runner.tick("active", active)
        runner.log("update", active=a_cnt)

        runner.maybe_checkpoint({"active": active, "done": done, "edges": E})
        for name in ("re_f", "re_b", "pivots", "state", "ff", "fb"):
            runner.release(name)

    runner.maybe_checkpoint({"active": active, "done": done, "edges": E}, force=True)
    result = done.select(F.col("id").cast("long"), F.col("scc_id").cast("long"))
    runner.log("final", sccs=None)
    return result


def _trim1_fixpoint(runner, E, active, a_cnt, emit_done):
    """Iteratively retire vertices with zero active same-range in- or
    out-neighbors (singleton SCCs) — reference trim1,
    /root/reference/src/scc_kernels.cu:187-233."""
    while a_cnt > 0:
        runner.bump("Trimm_iterations")
        a_src = _bc(active, a_cnt).select(F.col("id").alias("src"), F.col("range").alias("srange"))
        a_dst = _bc(active, a_cnt).select(F.col("id").alias("dst"), F.col("range").alias("drange"))
        ae = (
            E.join(a_src, "src").join(a_dst, "dst").where(F.col("srange") == F.col("drange"))
        )
        has_out = ae.select(F.col("src").alias("id")).distinct()
        has_in = ae.select(F.col("dst").alias("id")).distinct()
        survivors = (
            active.join(has_out, "id", "left_semi").join(has_in, "id", "left_semi")
        )
        survivors, s_cnt = runner.tick("active_next", survivors)
        trimmed_cnt = a_cnt - s_cnt
        runner.log("trim1", trimmed=trimmed_cnt, active=s_cnt)
        if trimmed_cnt > 0:
            trimmed = active.join(survivors.select("id"), "id", "left_anti").select(
                "id", F.col("id").alias("scc_id")
            )
            emit_done(trimmed)
        runner.promote("active_next", "active")
        active, a_cnt = survivors, s_cnt
        if trimmed_cnt == 0:
            break
    return active, a_cnt


def _trim2(runner, E, active, a_cnt, emit_done):
    """Retire 2-cycle SCCs {u,k} where each is the other's only active
    same-range in-neighbor (or only out-neighbor) — reference trim2,
    /root/reference/src/scc_kernels.cu:236-357. scc_id = min(u,k)."""
    a_src = _bc(active, a_cnt).select(F.col("id").alias("src"), F.col("range").alias("srange"))
    a_dst = _bc(active, a_cnt).select(F.col("id").alias("dst"), F.col("range").alias("drange"))
    ae = (
        E.join(a_src, "src").join(a_dst, "dst")
        .where(F.col("srange") == F.col("drange"))
        .select("src", "dst")
    )
    only_in = (
        ae.groupBy("dst").agg(F.count("*").alias("c"), F.min("src").alias("nbr"))
        .where("c = 1")
        .select(F.col("dst").alias("id"), "nbr")
    )
    only_out = (
        ae.groupBy("src").agg(F.count("*").alias("c"), F.min("dst").alias("nbr"))
        .where("c = 1")
        .select(F.col("src").alias("id"), "nbr")
    )

    def mutual(only_nbr):
        a = only_nbr.alias("a")
        b = only_nbr.alias("b")
        return (
            a.join(b, (F.col("a.nbr") == F.col("b.id")) & (F.col("b.nbr") == F.col("a.id")))
            .where(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("u"),
                F.col("b.id").alias("k"),
            )
        )

    pairs = mutual(only_in).unionByName(mutual(only_out)).distinct()
    pairs, pair_cnt = runner.tick("t2pairs", pairs)
    if pair_cnt == 0:
        runner.release("t2pairs")
        return active, a_cnt, False
    retired = pairs.select(F.col("u").alias("id"), F.col("u").alias("scc_id")).unionByName(
        pairs.select(F.col("k").alias("id"), F.col("u").alias("scc_id"))
    ).distinct()
    retired, r_cnt = runner.tick("t2retired", retired)
    emit_done(retired)
    active = active.join(retired.select("id"), "id", "left_anti")
    active, a_cnt = runner.tick("active", active)
    runner.log("trim2", retired=r_cnt, active=a_cnt)
    runner.release("t2pairs")
    runner.release("t2retired")
    return active, a_cnt, True


def _decompose(runner, spark, E, active, a_cnt, iters):
    """Refine ranges to weak components of the residual graph via
    hash-min label propagation + pointer jumping (reference's 'WCC
    decomposition', /root/reference/src/scc_WCC.cu:829-840 /
    scc_kernels.cu:496-536). Any partial refinement is correct: an SCC is
    weakly connected, so min-labels never split an SCC across ranges."""
    a_src = _bc(active, a_cnt).select(F.col("id").alias("src"), F.col("range").alias("srange"))
    a_dst = _bc(active, a_cnt).select(F.col("id").alias("dst"), F.col("range").alias("drange"))
    re = (
        E.join(a_src, "src").join(a_dst, "dst")
        .where(F.col("srange") == F.col("drange"))
        .select("src", "dst")
    )
    und = re.unionByName(re.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    und, _ = runner.tick("dec_edges", und.repartition("src"))

    lab = active.select("id", F.col("id").alias("label"))
    lab, _ = runner.tick("dec_lab", lab)
    prev_sum = lab.agg(F.sum("label")).first()[0]
    for _ in range(iters):
        nbr = (
            und.join(lab.select(F.col("id").alias("dst"), F.col("label").alias("nl")), "dst")
            .groupBy("src")
            .agg(F.min("nl").alias("nmin"))
            .select(F.col("src").alias("id"), "nmin")
        )
        lab1 = lab.join(nbr, "id", "left").select(
            "id", F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label")
        )
        # pointer jumping: label <- label(label)
        l2 = lab1.alias("a").join(
            lab1.select(F.col("id").alias("label"), F.col("label").alias("ll")).alias("b"),
            "label",
            "left",
        ).select(F.col("id"), F.least(F.col("label"), F.coalesce(F.col("ll"), F.col("label"))).alias("label"))
        lab, _ = runner.tick("dec_lab", l2)
        new_sum = lab.agg(F.sum("label")).first()[0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    active = active.join(lab, "id").select("id", F.col("label").alias("range"))
    active, a_cnt = runner.tick("active", active)
    runner.release("dec_edges")
    runner.release("dec_lab")
    return active, a_cnt
