"""Graph derivation helpers.

`derived_edges` builds a deterministic directed graph from the driver's
TPC-H-ish testdata so graph operators can be correctness-checked against
a DuckDB oracle on the exact same input: the rule is plain modular
arithmetic, expressible verbatim in ANSI SQL (see
__spark_entry__.oracle_sql — `DERIVED_EDGES_SQL`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DERIVED_V = 997  # prime vertex-space size for the testdata-derived graph


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def derived_edges(spark: SparkSession, sf_dir: str, v: int = DERIVED_V) -> DataFrame:
    """edges(src, dst) = distinct (l_orderkey % v, l_partkey % v), no
    self-loops. Matches DERIVED_EDGES_SQL in __spark_entry__ verbatim."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            (F.col("l_orderkey") % v).cast("long").alias("src"),
            (F.col("l_partkey") % v).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def derived_vertices(spark: SparkSession, sf_dir: str, v: int = DERIVED_V) -> DataFrame:
    e = derived_edges(spark, sf_dir, v)
    return e.select(F.col("src").alias("id")).union(e.select(F.col("dst").alias("id"))).distinct()
