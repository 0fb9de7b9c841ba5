"""HITS (hubs & authorities, Kleinberg 1999) — link-graph companion to
PageRank (north-rule tier; the reference's domain is link-graph
analytics, SURVEY.md §2.11).

Synchronous power iteration on the adjacency matrix pair:
  auth_k(v) = sum_{(u,v) in E} hub_{k-1}(u),  then L1-normalize
  hub_k(u)  = sum_{(u,v) in E} auth_k(v),     then L1-normalize
L1 normalization (not L2) keeps every operation a plain sum/division —
no sqrt — so the DuckDB oracle (unrolled CTE chain in __spark_entry__)
mirrors the arithmetic op-for-op and the final round(8) absorbs
double-sum reordering, exactly the proven PageRank-oracle pattern.

100 TB shape + round-7 action halving: state between half-steps is the
UN-normalized push (id, raw) — only vertices actually receiving score —
plus its L1 total as a 1-row frame. The normalizer division raw/total
rides INSIDE the next half-step's join as a broadcast scalar (the
pagerank dangling-mass pattern), so each half-step is ONE driver action
(the eager checkpoint of the raw push: one hash join + one map-side-
partial agg over 2-column frames) instead of the round-6 two (raw push +
materialized full-universe normalized frame). Arithmetic is unchanged
bit-for-bit: s(u) = raw(u)/t is computed per edge row by the identical
double division before entering the sum, vertices absent from the raw
frame contributed exactly 0.0 before, and the full-universe
coalesce(raw,0)/t frame is built once at the end instead of every
half-step. Duplicate edges contribute multiplicity, matching the
reference loader's keep-duplicates semantics
(/root/reference/src/load.cpp:43).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .scc import BROADCAST_ROW_LIMIT


def _normalized(v: DataFrame, raw: DataFrame, total: DataFrame, out: str) -> DataFrame:
    """Full-universe normalized scores: coalesce(raw, 0)/t over verts."""
    return (
        v.join(raw, "id", "left")
        .crossJoin(F.broadcast(total))
        .select("id", (F.coalesce(F.col("raw"), F.lit(0.0)) / F.col("t")).alias(out))
    )


def _keyed_copies(e: DataFrame) -> dict[str, DataFrame]:
    """Persist the edge table twice, hash-partitioned by src and by dst —
    the dual forward/backward adjacency layout the reference itself
    keeps. persist (unlike localCheckpoint) preserves partitioning, so a
    half-step that broadcast-joins the score side and aggregates on the
    copy's key plans its aggregation exchange-free; past the broadcast
    regime the copy keyed by the JOIN key keeps the edge table from
    reshuffling. Cost: the edge bytes twice, the CSR+CSC trade."""
    out = {}
    for key in ("src", "dst"):
        c = e.repartition(key).persist(StorageLevel.MEMORY_AND_DISK)
        c.write.format("noop").mode("overwrite").save()
        out[key] = c
    return out


def _unpersist_copies(copies: dict[str, DataFrame]) -> None:
    for c in copies.values():
        try:
            c.unpersist()
        except Exception:
            pass


def hits(
    spark: SparkSession,
    edges: DataFrame,
    verts: DataFrame,
    iters: int = 10,
) -> DataFrame:
    """(id, auth, hub) after `iters` L1-normalized sync iterations.

    Vertices with no in-edges have auth 0 (and symmetrically for hub);
    both columns are defined over the full vertex universe `verts(id)`.
    """
    if iters < 1:
        raise ValueError(f"hits: iters must be >= 1, got {iters}")
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    v = verts.select(F.col("id").cast("long").alias("id"))
    n = v.count()
    if n == 0:
        # ANSI mode constant-folds the 1/n seed at plan time, so an empty
        # universe must short-circuit rather than build a 1/0 literal
        return v.select("id", F.lit(0.0).alias("auth"), F.lit(0.0).alias("hub"))

    ecopies = _keyed_copies(e)
    bcast_mode = n <= BROADCAST_ROW_LIMIT

    def _push(raw_prev: DataFrame, total_prev: DataFrame | None,
              key_in: str, key_out: str):
        """One matrix application: raw_out(v) = Σ_{edges} raw_prev(u)/t.
        The division by the carried normalizer happens per edge row —
        the identical double op the round-6 materialized-scores form
        applied per vertex — so sums see bit-identical terms. Seed
        half-step (total_prev None): scores are already normalized.
        ONE driver action: the eager checkpoint of the raw push (the
        normalizer and the next half-step both read it). The edge copy
        keyed by the AGG key makes the aggregation exchange-free while
        the score side broadcasts; past that, the JOIN-key copy keeps
        the edge table from reshuffling."""
        ek = ecopies[key_out] if bcast_mode else ecopies[key_in]
        j = ek.join(raw_prev.withColumnRenamed("id", key_in), key_in)
        if total_prev is None:
            s = F.col("raw")
        else:
            j = j.crossJoin(F.broadcast(total_prev))
            s = F.col("raw") / F.col("t")
        raw = (
            j.groupBy(F.col(key_out).alias("id"))
            .agg(F.sum(s).alias("raw"))
        ).localCheckpoint(eager=True)
        total = raw.agg(F.sum("raw").alias("t"))
        return raw, total

    seed = v.select("id", (F.lit(1.0) / F.lit(float(n))).alias("raw"))
    auth_raw = hub_raw = None
    a_t = h_t = None
    for k in range(iters):
        auth_raw, a_t = _push(hub_raw if k else seed, h_t if k else None, "src", "dst")
        hub_raw, h_t = _push(auth_raw, a_t, "dst", "src")
    # safe to release: the result plan reads only v and the checkpointed
    # raw frames, never the edge copies
    _unpersist_copies(ecopies)
    return (
        _normalized(v, auth_raw, a_t, "auth")
        .join(_normalized(v, hub_raw, h_t, "hub"), "id")
        .select("id", "auth", "hub")
    )


def eigencentrality(
    spark: SparkSession,
    edges: DataFrame,
    iters: int = 10,
) -> DataFrame:
    """Eigenvector centrality of the undirected simple view: (id, score)
    after `iters` L1-normalized power iterations x ← A·x / ‖A·x‖₁ from
    the uniform start. L1 (not L2) keeps every op a sum/division so the
    unrolled-CTE DuckDB oracle mirrors it exactly (the HITS pattern —
    same carried-normalizer half-step shape: one hash join + one scalar
    agg per iteration over 2-column frames, one driver action each)."""
    from .kcore import undirected_edges

    und = undirected_edges(edges)
    sym = und.select(F.col("a").alias("u"), F.col("b").alias("w")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("w"))
    )
    v = und.select(F.col("a").alias("id")).union(und.select(F.col("b").alias("id"))).distinct()
    n = v.count()
    if n == 0:
        # see hits(): the 1/n seed would constant-fold to 1/0 under ANSI
        return v.select("id", F.lit(0.0).alias("score"))
    # persist the symmetrized table once (it was re-derived — distinct +
    # union — every iteration), keyed by the agg key in the broadcast
    # regime so each iteration's aggregation is exchange-free, by the
    # join key past it
    sym_key = "w" if n <= BROADCAST_ROW_LIMIT else "u"
    sym = sym.repartition(sym_key).persist(StorageLevel.MEMORY_AND_DISK)
    sym.write.format("noop").mode("overwrite").save()
    raw = v.select("id", (F.lit(1.0) / F.lit(float(n))).alias("raw"))
    total = None
    for k in range(iters):
        j = sym.join(raw.withColumnRenamed("id", "u"), "u")
        if total is None:
            s = F.col("raw")
        else:
            j = j.crossJoin(F.broadcast(total))
            s = F.col("raw") / F.col("t")
        raw = (
            j.groupBy(F.col("w").alias("id"))
            .agg(F.sum(s).alias("raw"))
        ).localCheckpoint(eager=True)
        total = raw.agg(F.sum("raw").alias("t"))
    try:
        sym.unpersist()
    except Exception:
        pass
    return _normalized(v, raw, total, "score")


def salsa(
    spark: SparkSession,
    edges: DataFrame,
    verts: DataFrame,
    iters: int = 10,
) -> DataFrame:
    """SALSA (Lempel & Moran 2000): HITS with COLUMN-normalized pushes —
    each push divides a vertex's score by its degree before sending, so
    the walk is the stochastic hub<->authority random walk rather than
    the raw adjacency power iteration. (id, auth, hub) after `iters`
    L1-normalized sync iterations over the vertex universe `verts(id)`.

    Same carried-normalizer half-step shape as hits(): the degree
    weights are folded into the edge table ONCE (w_out = 1/outdeg(src),
    w_in = 1/indeg(dst) — the pagerank edge-fold trick), then each
    half-step is one hash join + one agg of (raw/t)*w, one driver
    action. Duplicate edges keep multiplicity in both the degree and the
    push, mirroring hits().
    """
    if iters < 1:
        raise ValueError(f"salsa: iters must be >= 1, got {iters}")
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    v = verts.select(F.col("id").cast("long").alias("id"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    indeg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("ind"))
    ew = (
        e.join(outdeg, "src")
        .join(indeg, "dst")
        .select(
            "src",
            "dst",
            (F.lit(1.0) / F.col("od")).alias("w_out"),
            (F.lit(1.0) / F.col("ind")).alias("w_in"),
        )
    )
    n = v.count()
    if n == 0:
        # see hits(): the 1/n seed would constant-fold to 1/0 under ANSI
        return v.select("id", F.lit(0.0).alias("auth"), F.lit(0.0).alias("hub"))
    ecopies = _keyed_copies(ew)
    bcast_mode = n <= BROADCAST_ROW_LIMIT

    def _wpush(raw_prev: DataFrame, total_prev: DataFrame | None,
               key_in: str, key_out: str, w: str):
        """Weighted half-step: the per-edge term is (raw/t)*w — the same
        div-then-mul order as the round-6 materialized s*w form. Edge
        copy choice: agg key in the broadcast regime, join key past it
        (see _keyed_copies)."""
        ek = ecopies[key_out] if bcast_mode else ecopies[key_in]
        j = ek.join(raw_prev.withColumnRenamed("id", key_in), key_in)
        if total_prev is None:
            s = F.col("raw")
        else:
            j = j.crossJoin(F.broadcast(total_prev))
            s = F.col("raw") / F.col("t")
        raw = (
            j.groupBy(F.col(key_out).alias("id"))
            .agg(F.sum(s * F.col(w)).alias("raw"))
        ).localCheckpoint(eager=True)
        total = raw.agg(F.sum("raw").alias("t"))
        return raw, total

    seed = v.select("id", (F.lit(1.0) / F.lit(float(n))).alias("raw"))
    auth_raw = hub_raw = None
    a_t = h_t = None
    for k in range(iters):
        auth_raw, a_t = _wpush(hub_raw if k else seed, h_t if k else None,
                               "src", "dst", "w_out")
        hub_raw, h_t = _wpush(auth_raw, a_t, "dst", "src", "w_in")
    _unpersist_copies(ecopies)
    return (
        _normalized(v, auth_raw, a_t, "auth")
        .join(_normalized(v, hub_raw, h_t, "hub"), "id")
        .select("id", "auth", "hub")
    )
