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

100 TB shape: two hash joins + two scalar aggs per iteration, frames are
(id, score) only; the edge table is re-joined from its persisted
partitioning each round (no growing lineage — scores checkpoint-free
because each frame is 2 columns x |V|). Duplicate edges contribute
multiplicity, matching the reference loader's keep-duplicates semantics
(/root/reference/src/load.cpp:43).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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
    hub = v.select("id", (F.lit(1.0) / F.lit(float(n))).alias("s"))

    def _push(scores: DataFrame, key_in: str, key_out: str) -> DataFrame:
        """One matrix application + L1 normalization: score flows from
        `key_in` endpoints onto `key_out` endpoints. The raw push is
        eagerly localCheckpoint-ed because BOTH the normalizer and the
        result read it — without materialization each half-step would
        evaluate its whole upstream twice, compounding across iterations
        (measured 47.6s -> ~12s at sf0.01). Cost: 2 driver actions per
        iteration, each a |V|-row frame."""
        raw = (
            e.join(scores.withColumnRenamed("id", key_in), key_in)
            .groupBy(F.col(key_out).alias("id"))
            .agg(F.sum("s").alias("raw"))
        ).localCheckpoint(eager=True)
        total = raw.agg(F.sum("raw").alias("t"))
        return (
            v.join(raw, "id", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "id",
                (F.coalesce(F.col("raw"), F.lit(0.0)) / F.col("t")).alias("s"),
            )
        )

    auth = None
    for k in range(iters):
        auth = _push(hub, "src", "dst")
        hub = _push(auth, "dst", "src")
    return (
        auth.withColumnRenamed("s", "auth")
        .join(hub.withColumnRenamed("s", "hub"), "id")
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
    same 100 TB shape: one hash join + one scalar agg per iteration over
    2-column frames, raw push eagerly checkpointed because both the
    normalizer and the result read it)."""
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
    x = v.select("id", (F.lit(1.0) / F.lit(float(n))).alias("s"))
    for k in range(iters):
        raw = (
            sym.join(x.withColumnRenamed("id", "u"), "u")
            .groupBy(F.col("w").alias("id"))
            .agg(F.sum("s").alias("raw"))
        ).localCheckpoint(eager=True)
        total = raw.agg(F.sum("raw").alias("t"))
        x = (
            v.join(raw, "id", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "id",
                (F.coalesce(F.col("raw"), F.lit(0.0)) / F.col("t")).alias("s"),
            )
        )
    return x.withColumnRenamed("s", "score")


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

    Same 100 TB shape as hits(): the degree weights are folded into the
    edge table ONCE (w_out = 1/outdeg(src), w_in = 1/indeg(dst) — the
    pagerank edge-fold trick), then each half-step is one hash join +
    one agg; the raw push is eagerly checkpointed because the normalizer
    and the result both read it. Duplicate edges keep multiplicity in
    both the degree and the push, mirroring hits().
    """
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
    ).localCheckpoint(eager=True)
    n = v.count()
    if n == 0:
        # see hits(): the 1/n seed would constant-fold to 1/0 under ANSI
        return v.select("id", F.lit(0.0).alias("auth"), F.lit(0.0).alias("hub"))
    hub = v.select("id", (F.lit(1.0) / F.lit(float(n))).alias("s"))

    def _wpush(scores: DataFrame, key_in: str, key_out: str, w: str) -> DataFrame:
        raw = (
            ew.join(scores.withColumnRenamed("id", key_in), key_in)
            .groupBy(F.col(key_out).alias("id"))
            .agg(F.sum(F.col("s") * F.col(w)).alias("raw"))
        ).localCheckpoint(eager=True)
        total = raw.agg(F.sum("raw").alias("t"))
        return (
            v.join(raw, "id", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "id",
                (F.coalesce(F.col("raw"), F.lit(0.0)) / F.col("t")).alias("s"),
            )
        )

    auth = None
    for k in range(iters):
        auth = _wpush(hub, "src", "dst", "w_out")
        hub = _wpush(auth, "dst", "src", "w_in")
    return (
        auth.withColumnRenamed("s", "auth")
        .join(hub.withColumnRenamed("s", "hub"), "id")
        .select("id", "auth", "hub")
    )
