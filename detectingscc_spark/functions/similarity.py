"""Similarity search over embeddings(vec_id, embedding: array<float>, label).

  brute_force_topk  exact cosine top-k for a set of query vectors —
                    the correctness baseline. JVM-side zip_with/aggregate
                    dot products (no Python in the loop).
  lsh_buckets       random-hyperplane LSH bucketing (sign bits from
                    seeded deterministic pseudo-hyperplanes built with
                    xxhash64 — no RNG state, reproducible on any cluster).
  ann_topk_lsh      approximate top-k: probe only the query's bucket
                    (the 100 TB path: bucket join instead of cross join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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


def lsh_buckets(emb: DataFrame, n_planes: int = 8, seed: int = 7) -> DataFrame:
    """(vec_id, bucket) — sign-bit bucket from n pseudo-hyperplanes.

    Plane p's weight for dimension d = (xxhash64(seed, p, d) % 2001 - 1000)
    / 1000.0: deterministic, computed on the fly, identical on every
    executor — no broadcast state needed.
    """
    v = F.col("v")
    dims = F.size(v)
    planes = []
    for p in range(n_planes):
        w = F.transform(
            F.sequence(F.lit(0), dims - 1),
            lambda d, p=p: (
                F.pmod(F.xxhash64(F.lit(seed), F.lit(p), d), F.lit(2001)) - 1000
            ).cast("double")
            / 1000.0,
        )
        dot = F.aggregate(F.zip_with(v, w, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
        planes.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)) * (2**p))
    bucket = sum(planes)
    return emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v")).select(
        "vec_id", bucket.alias("bucket"), "v"
    )


def ann_topk_lsh(emb: DataFrame, query_ids: list[int], k: int = 5, n_planes: int = 6) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    Recall measured vs brute_force_topk in tests (quality metric, not
    an exactness contract)."""
    b = lsh_buckets(emb, n_planes=n_planes)
    b = b.withColumn("norm", _norm(F.col("v")))
    q = b.where(F.col("vec_id").isin([int(x) for x in query_ids])).select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
    )
    scored = (
        F.broadcast(q)
        .join(b, "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
