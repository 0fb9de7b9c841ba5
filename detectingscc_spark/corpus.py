"""Deterministic synthetic source-code corpus
(repo, path, commit, lang, content) — the engine's primary input shape per
BASELINE.json `input_hint` (Iceberg-shaped table of repositories).

Generated entirely JVM-side (spark.range + built-in functions, seeded
xxhash64) so a 10^12-file corpus could be minted in parallel with no
Python in the loop and no external data. Every file's `content` embeds
`import pkg{t//13}.mod{t}` lines; those lines ARE the edge set, so the
extracted graph is exactly reproducible from (seed, n_files).

Graph shape: a deterministic successor edge i -> (i+1) % n for most files
(long cycles / giant SCC backbone, the shape FB-Trim's pivot heuristic
targets) plus 0-3 hash-pseudorandom shortcut imports per file (shortcuts +
trim fodder). Mirrors the giant-SCC profile of the reference's largest
fixture (/root/reference/data/sample2.gr: 32,768 V, 4,889 SCCs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ("py", "java", "go", "ts")


def _h(seed: int, *cols: Column) -> Column:
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def _target_array(n_files: int, seed: int) -> Column:
    """Deterministic import-target array for column `fid` (the edge rule)."""
    n = F.lit(n_files)
    # successor edge for ~6/7 of files; plus k in 0..3 hash shortcuts
    succ = F.when(
        (F.col("fid") % 7 != 0) & (n > 1),
        F.array(F.pmod(F.col("fid") + 1, n)),
    ).otherwise(F.array().cast("array<bigint>"))
    k = (_h(seed, F.col("fid")) % 4).cast("int")
    shortcuts = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.lit(3)),
            lambda j: F.when(j <= k, F.pmod(_h(seed + 1, F.col("fid"), j), n)).otherwise(F.lit(None)),
        ),
        lambda t: t.isNotNull() & (t != F.col("fid")),
    )
    return F.array_distinct(F.concat(succ, shortcuts))


def generate_corpus(spark: SparkSession, n_files: int, seed: int = 42) -> DataFrame:
    """Corpus table with n_files rows; file id i <-> (repo, path) bijection.

    repo = org{i//170}/repo{i//17}, path = src/pkg{(i%17)//13}/mod{i}.py
    """
    df = spark.range(n_files).withColumnRenamed("id", "fid")
    targets = _target_array(n_files, seed)

    repo = F.concat(F.lit("org"), (F.col("fid") / 170).cast("long"), F.lit("/repo"), (F.col("fid") / 17).cast("long"))
    path = F.concat(
        F.lit("src/pkg"), ((F.col("fid") % 17) / 13).cast("long"), F.lit("/mod"), F.col("fid"), F.lit(".py")
    )
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), (F.col("fid") % 4 + 1).cast("int"))

    import_lines = F.array_join(
        F.transform(
            targets,
            lambda t: F.concat(F.lit("import pkg"), (t / 13).cast("long"), F.lit(".mod"), t),
        ),
        "\n",
    )
    filler = F.concat(
        F.lit("\n\ndef handler_"),
        F.col("fid"),
        F.lit("():\n    return "),
        (_h(seed + 2, F.col("fid")) % 100000),
        F.lit("\n"),
    )
    content = F.concat(
        F.lit("# module "), F.col("fid"), F.lit(" auto-generated\n"), import_lines, filler
    )
    commit = F.substring(F.sha2(F.concat(repo, F.lit(":"), path, F.lit(":c0")), 256), 1, 40)

    return df.select(
        F.col("fid"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def expected_edges(spark: SparkSession, n_files: int, seed: int = 42) -> DataFrame:
    """The generator-rule edge set (src fid, dst fid), computed from the
    rule itself (NOT by parsing content) — tests verify the ingest
    extraction reproduces this exactly."""
    return (
        spark.range(n_files)
        .withColumnRenamed("id", "fid")
        .select(F.col("fid").alias("src"), F.explode(_target_array(n_files, seed)).alias("dst"))
    )
