"""GTgraph text source → edge DataFrame.

Format (parsed by the reference at /root/reference/src/load.cpp:31-45):
`c` comment lines, one `p sp <V> <E>` problem line, `a <u> <v> <w>` arc
lines with 1-indexed vertices. Weights are parsed and DISCARDED (the
reference does the same at /root/reference/src/load.cpp:43); duplicate
edges are KEPT (e.g. /root/reference/data/sample0.gr repeats `a 4 1 1`).

Spark-first: the file is read with spark.read.text and split with
built-in functions — no Python row loop — so a 100 GB GTgraph dump would
parse in parallel across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_gtgraph(spark: SparkSession, path: str) -> DataFrame:
    """Parse a GTgraph file into edges(src: long, dst: long).

    Vertices remain 1-indexed as in the file; the engine's operators work
    on arbitrary long ids so no re-indexing is required.
    """
    lines = spark.read.text(path)
    arcs = lines.where(F.col("value").startswith("a"))
    parts = F.split(F.regexp_replace(F.trim("value"), r"\s+", " "), " ")
    return arcs.select(
        parts.getItem(1).cast("long").alias("src"),
        parts.getItem(2).cast("long").alias("dst"),
    )


def gtgraph_meta(spark: SparkSession, path: str) -> tuple[int, int]:
    """Return (V, E) from the `p sp V E` problem line."""
    row = (
        spark.read.text(path)
        .where(F.col("value").startswith("p"))
        .select(F.split(F.regexp_replace(F.trim("value"), r"\s+", " "), " ").alias("p"))
        .select(
            F.col("p").getItem(2).cast("long").alias("v"),
            F.col("p").getItem(3).cast("long").alias("e"),
        )
        .first()
    )
    return int(row["v"]), int(row["e"])


def read_metis_partition(spark: SparkSession, path: str) -> DataFrame:
    """METIS `.part` file → (id: long, part: int); one label per line,
    vertex ids implicit by line order, 1-indexed (mirrors
    /root/reference/src/load.cpp:115-130)."""
    import pandas as pd

    with open(path) as f:
        labels = [int(x) for x in f.read().split()]
    pdf = pd.DataFrame({"id": range(1, len(labels) + 1), "part": labels})
    return spark.createDataFrame(pdf)
