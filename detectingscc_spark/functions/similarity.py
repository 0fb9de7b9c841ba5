"""Similarity search over embeddings(vec_id, embedding: array<float>, label).

  brute_force_topk  exact cosine top-k for a set of query vectors —
                    the correctness baseline. JVM-side zip_with/aggregate
                    dot products (no Python in the loop).
  lsh_buckets       random-hyperplane LSH bucketing. Plane weights are a
                    deterministic sha256-derived constant matrix computed
                    once on the driver and inlined as array literals — no
                    RNG state, no per-row hashing, bit-identical on any
                    engine (the DuckDB oracle embeds the same literals).
  ann_topk_lsh      approximate top-k with L INDEPENDENT TABLES +
                    multi-probe (OR-amplification): every vector gets L
                    buckets in ONE scan; each query probes, per table,
                    its own bucket plus all buckets within Hamming
                    distance `probe_hamming`; the candidate union is then
                    exactly re-ranked by cosine. Keeps the bucketed
                    O(candidates) join shape (the 100 TB path: bucket
                    join instead of cross join) at recall >= 0.8.

  ivf_cells /       IVF scale path: deterministic anchor-point coarse
  ann_topk_ivf      quantizer (centroid j = embedding j), inverted-list
                    probe of the n_probe nearest cells, exact re-rank.

Tuning note: the synthetic fixture embeddings are near-isotropic (top-5
neighbor cosines ~0.35-0.5), the hardest case for hyperplane LSH — the
default (20 tables x 8 planes, Hamming<=1) measures recall ~0.9 at ~50%
candidate fraction there. On real clustered embeddings the same config
probes a far smaller fraction; shrink n_tables / raise n_planes as the
data allows.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ANN_DIMS = 64  # hyperplane width; bucketing uses the first ANN_DIMS dims


def plane_weights(n_planes: int, seed: int = 7, dims: int = ANN_DIMS) -> list[list[float]]:
    """Deterministic pseudo-hyperplane weights: plane p, dim d weight =
    (int(sha256("{seed}|{p}|{d}")[:8]) % 2001 - 1000) / 1000. Pure
    stdlib — reproducible everywhere, embeddable as SQL literals."""
    return [
        [
            (
                int.from_bytes(
                    hashlib.sha256(f"{seed}|{p}|{d}".encode()).digest()[:8], "big"
                )
                % 2001
                - 1000
            )
            / 1000.0
            for d in range(dims)
        ]
        for p in range(n_planes)
    ]


def _bucket_expr(n_planes: int, seed: int, dims: int) -> str:
    """SQL expression (over column `v`) for the sign-bit bucket of one
    table: sum over planes of (dot(v[:dims], w_p) >= 0) << p, with the
    weight vectors inlined as array literals (pure codegen arithmetic,
    zero per-row hashing)."""
    W = plane_weights(n_planes, seed, dims)
    terms = []
    for p in range(n_planes):
        arr = "array(" + ",".join(repr(x) for x in W[p]) + ")"
        dot = (
            f"aggregate(zip_with(slice(v, 1, {dims}), {arr}, (x, y) -> x * y),"
            f" cast(0.0 as double), (a, x) -> a + x)"
        )
        terms.append(f"(CASE WHEN {dot} >= 0.0D THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


def probe_offsets(n_planes: int, probe_hamming: int = 1) -> list[int]:
    """XOR masks for multi-probe: all bucket offsets within Hamming
    distance <= probe_hamming (0 first, then single bits, then pairs...)."""
    offs = [0]
    for r in range(1, probe_hamming + 1):
        for bits in combinations(range(n_planes), r):
            offs.append(sum(1 << b for b in bits))
    return offs


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def brute_force_topk(emb: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """(query_id, vec_id, cos, rank) — exact top-k cosine neighbors of each
    query vector (excluding itself). Deterministic tie-break: higher cos
    first, then lower vec_id. Queries are broadcast (tiny side)."""
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v")).withColumn(
        "norm", _norm(F.col("v"))
    )
    q = base.where(F.col("vec_id").isin([int(x) for x in query_ids])).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    scored = (
        F.broadcast(q)
        .join(base, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def lsh_buckets(
    emb: DataFrame, n_planes: int = 8, seed: int = 7, dims: int = ANN_DIMS
) -> DataFrame:
    """(vec_id, bucket, v) — sign-bit bucket from n pseudo-hyperplanes.

    The weight matrix is inlined as array literals (see plane_weights), so
    bucketing is pure whole-stage-codegen arithmetic: one fold per plane,
    zero hashing per row, identical on every executor and engine."""
    bucket = F.expr(_bucket_expr(n_planes, seed, dims))
    return emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v")).select(
        "vec_id", bucket.alias("bucket"), "v"
    )


def lsh_buckets_multi(
    emb: DataFrame, n_planes: int, n_tables: int, seed: int = 7, dims: int = ANN_DIMS
) -> DataFrame:
    """(vec_id, tbl, bucket) — L independent hash tables computed in ONE
    scan of the embedding table (table t uses seed + 1000*t), exploded to
    one row per (vector, table). At 100 TB this is the write-side of an
    LSH index: partition/bucket the output by (tbl, bucket) and the probe
    join below becomes a pruned scan."""
    structs = ", ".join(
        f"struct({t} AS tbl, ({_bucket_expr(n_planes, seed + 1000 * t, dims)}) AS bucket)"
        for t in range(n_tables)
    )
    return (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .select("vec_id", F.explode(F.expr(f"array({structs})")).alias("tb"))
        .select("vec_id", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    )


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    sample_cap: int = 10_000,
    seed: int = 7,
) -> list[list[float]]:
    """Spherical k-means coarse quantizer, trained on a deterministic
    sample — the production-shaped replacement for the anchor-point
    quantizer (returns [cid][dim] centroid rows, L2-normalized).

    Deterministic end to end: the sample is the `sample_cap` rows with
    the smallest xxhash64(vec_id, seed) (a TakeOrderedAndProject, no full
    sort — at 100 TB this is one pruned scan); init is farthest-point
    (k-means++ without RNG) from the sample vector of minimum hash;
    Lloyd assignment breaks ties toward the lowest centroid id; empty
    clusters keep their previous centroid. The trained centroids are a
    tiny driver-side constant (K x dim doubles) broadcast into the
    assignment join, exactly like Faiss IVF's coarse quantizer."""
    import numpy as np

    sample = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .orderBy(F.xxhash64("vec_id", F.lit(seed)), F.col("vec_id"))
        .limit(int(sample_cap))
        .collect()
    )
    X = np.array([r["v"] for r in sample], dtype=np.float64)
    if X.ndim != 2 or X.shape[0] == 0:
        raise ValueError("train_ivf_centroids: embedding table is empty")
    norms = np.linalg.norm(X, axis=1)
    X = X[norms > 0] / norms[norms > 0, None]
    if len(X) == 0:
        raise ValueError("train_ivf_centroids: no nonzero embeddings to train on")
    k = min(n_centroids, len(X))
    # farthest-point init: greedy max-min cosine distance, start at row 0
    # (the min-hash sample row) — deterministic, spread-out seeds
    cent_idx = [0]
    sim_to_nearest = X @ X[0]
    for _ in range(1, k):
        nxt = int(np.argmin(sim_to_nearest))
        cent_idx.append(nxt)
        sim_to_nearest = np.maximum(sim_to_nearest, X @ X[nxt])
    C = X[cent_idx].copy()
    for _ in range(iters):
        sims = X @ C.T  # cosine == dot on the unit sphere
        assign = np.argmax(sims, axis=1)  # np.argmax: first (lowest) index wins ties
        for j in range(k):
            members = X[assign == j]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    C[j] = m / n
    return [[float(x) for x in row] for row in C]


def _centroid_frame(emb: DataFrame, n_centroids: int, centroids: list[list[float]] | None):
    """(cid, cv, cn) frame: trained centroids as literals if given, else
    the anchor-point quantizer (centroid j = embedding j)."""
    if centroids is not None:
        spark = emb.sparkSession
        rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
        cents = spark.createDataFrame(rows, "cid int, cv array<double>")
        return cents.withColumn("cn", _norm(F.col("cv")))
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("norm", _norm(F.col("v")))
    return base.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("norm").alias("cn")
    )


def ivf_cells(
    emb: DataFrame, n_centroids: int = 16, centroids: list[list[float]] | None = None
) -> DataFrame:
    """(vec_id, cell) — IVF coarse quantizer: cell = argmax cosine over
    centroids, ties -> lowest centroid id. Centroids are either trained
    (pass `centroids` from train_ivf_centroids) or the deterministic
    anchor points (centroid j = embedding j, no training state).

    Scale shape: assignment is O(N x K) with K ~ sqrt(N) centroids
    broadcast to every executor; the inverted lists are then the
    partition/bucket key for the probe-side join (same shape Faiss IVF
    uses)."""
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("norm", _norm(F.col("v")))
    cents = _centroid_frame(emb, n_centroids, centroids)
    scored = base.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cid",
        F.round(_dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cn")), 6).alias("ccos"),
    )
    return scored.groupBy("vec_id").agg(
        F.expr("max_by(cid, struct(ccos, -cid))").alias("cell")
    )


def ann_topk_ivf(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 8,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: each query probes its n_probe nearest
    centroids' inverted lists; candidates are exactly re-ranked by
    cosine. Deterministic end to end; full DuckDB oracle. Pass trained
    `centroids` (train_ivf_centroids) for the production quantizer; the
    default anchor quantizer needs no training state."""
    qids = [int(x) for x in query_ids]
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("norm", _norm(F.col("v")))
    cents = _centroid_frame(emb, n_centroids, centroids)
    assign = ivf_cells(emb, n_centroids, centroids)
    qbase = base.where(F.col("vec_id").isin(qids))
    qcent = qbase.crossJoin(F.broadcast(cents)).select(
        F.col("vec_id").alias("query_id"),
        "cid",
        F.round(_dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cn")), 6).alias("ccos"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("cid").asc())
    probes = (
        qcent.withColumn("pr", F.row_number().over(w_probe))
        .where(F.col("pr") <= n_probe)
        .select("query_id", F.col("cid").alias("cell"))
    )
    cand = (
        F.broadcast(probes)
        .join(assign, "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    qv = qbase.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    scored = (
        cand.join(base, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ann_topk_lsh(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 20,
    probe_hamming: int = 1,
    seed: int = 7,
    dims: int = ANN_DIMS,
) -> DataFrame:
    """Approximate top-k via L-table multi-probe LSH: candidates =
    union over tables of (query's bucket + every bucket within Hamming
    distance `probe_hamming`), deduped, then exactly re-ranked by cosine.
    Deterministic end to end (literal plane weights + (cos desc, vec_id
    asc) tie-break) — checked against a full DuckDB oracle; recall vs
    brute_force_topk >= 0.8 is asserted in tests as the quality bar."""
    qids = [int(x) for x in query_ids]
    b = lsh_buckets_multi(emb, n_planes, n_tables, seed, dims)
    offsets = probe_offsets(n_planes, probe_hamming)
    probes = "array(" + ",".join(f"bucket ^ {m}" for m in offsets) + ")"
    q = b.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        "tbl",
        F.explode(F.expr(probes)).alias("bucket"),
    )
    cand = (
        F.broadcast(q)
        .join(b, ["tbl", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("norm", _norm(F.col("v")))
    qbase = base.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    scored = (
        cand.join(base, "vec_id")
        .join(F.broadcast(qbase), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
