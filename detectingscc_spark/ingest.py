"""Ingest: corpus(repo, path, commit, lang, content) → graph tables.

Produces
  vertices(id: long, repo: string, path: string)   dense ids
  edges(src: long, dst: long, part: int)           import/call references

Two extraction paths with identical output:
  * `extract_import_edges`        — Spark built-ins (regexp_extract_all +
    explode), whole-stage-codegen JVM path; the default.
  * `extract_import_edges_pandas` — Arrow-vectorized mapInPandas
    (pandas .str.findall, no per-row Python loop), the extension point the
    north_star mandates for extractors that need real parsers.

Invariant (input_hint): sha256(content) per row is unchanged through
ingest — `content_manifest` snapshots it before, `verify_sha256` checks
after (tests/test_ingest.py).

Vertex ids: minted from the corpus's own fid when present, else dense
rank over sorted (repo, path) — deterministic either way. Edge `part` is
an explicit hash-partition label (analog of the reference's METIS labels,
/root/reference/src/load.cpp:115-130).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMPORT_RE = r"import pkg\d+\.mod(\d+)"


def content_manifest(corpus: DataFrame) -> DataFrame:
    """(repo, path, sha) — the per-row ingest invariant, per input_hint."""
    return corpus.select("repo", "path", F.sha2(F.col("content"), 256).alias("sha"))


def verify_sha256(before: DataFrame, corpus_after: DataFrame) -> int:
    """Rows whose sha changed through ingest (must be 0)."""
    after = content_manifest(corpus_after)
    return (
        before.alias("b")
        .join(after.alias("a"), ["repo", "path"])
        .where(F.col("b.sha") != F.col("a.sha"))
        .count()
    )


def mint_vertices(corpus: DataFrame) -> DataFrame:
    """vertices(id, repo, path). Uses the corpus `fid` column when present
    (synthetic corpus), else a deterministic dense rank of (repo, path):
    id = (# files in lexicographically earlier repos) + rank of path
    within this repo - 1. Identical ordering to a global (repo, path)
    sort, but the only windows are (a) per-repo row_number — partitioned,
    scales with the largest repo — and (b) a cumulative sum over the repo
    dimension (one row per repo), never a single-task pass over all files
    (the classic unpartitioned-Window scale killer).
    """
    if "fid" in corpus.columns:
        return corpus.select(F.col("fid").alias("id"), "repo", "path")
    from pyspark.sql import Window

    d = corpus.select("repo", "path").distinct()
    local = d.withColumn(
        "rn", F.row_number().over(Window.partitionBy("repo").orderBy("path"))
    )
    w_repo = Window.orderBy("repo").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("repo")
        .agg(F.count("*").alias("cnt"))
        .select("repo", F.coalesce(F.sum("cnt").over(w_repo), F.lit(0)).alias("off"))
    )
    return local.join(F.broadcast(offsets), "repo").select(
        (F.col("off") + F.col("rn") - 1).cast("long").alias("id"), "repo", "path"
    )


def extract_import_edges(corpus: DataFrame, n_parts: int = 32) -> DataFrame:
    """edges(src, dst, part) via JVM-side regexp extraction.

    dst file id is encoded in the import line (`import pkgX.mod<id>`),
    matching the synthetic generator; a production extractor would join
    module names against the vertices dimension instead.
    """
    verts = mint_vertices(corpus)
    e = (
        corpus.join(verts.select("repo", "path", F.col("id").alias("src")), ["repo", "path"])
        .select(
            "src",
            # Column-API regexp (no SQL string re-escaping of backslashes)
            F.explode(
                F.transform(
                    F.regexp_extract_all(F.col("content"), F.lit(IMPORT_RE), F.lit(1)),
                    lambda x: x.cast("long"),
                )
            ).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .distinct()
    )
    return e.withColumn("part", F.pmod(F.col("src"), F.lit(n_parts)).cast("int"))


def extract_import_edges_pandas(corpus: DataFrame, n_parts: int = 32) -> DataFrame:
    """Same extraction via Arrow-batched mapInPandas (vectorized pandas
    string ops — the pattern for extractors Spark SQL can't express)."""
    verts = mint_vertices(corpus)
    src_content = corpus.join(
        verts.select("repo", "path", F.col("id").alias("src")), ["repo", "path"]
    ).select("src", "content")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        pat = re.compile(IMPORT_RE)
        for pdf in batches:
            found = pdf["content"].str.findall(pat)
            out = pd.DataFrame({"src": pdf["src"].values, "dst": found.values})
            out = out.explode("dst").dropna(subset=["dst"])
            out["dst"] = out["dst"].astype("int64")
            yield out[["src", "dst"]]

    e = src_content.mapInPandas(extract, schema="src long, dst long").distinct()
    return e.withColumn("part", F.pmod(F.col("src"), F.lit(n_parts)).cast("int"))


def ingest(
    spark: SparkSession, corpus: DataFrame, n_parts: int = 32, use_pandas: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Full ingest: returns (vertices, edges, sha_manifest)."""
    manifest = content_manifest(corpus)
    verts = mint_vertices(corpus)
    extractor = extract_import_edges_pandas if use_pandas else extract_import_edges
    edges = extractor(corpus, n_parts=n_parts)
    return verts, edges, manifest
