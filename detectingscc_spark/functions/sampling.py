"""Deterministic sampling for reproducible corpus curation.

`df.sample()` is seed-dependent on partitioning and Spark version — a
pipeline that must be re-runnable (and oracle-checkable) needs a sample
predicate that is a pure function of the row key. The portable choice:
the first hex nibble of sha256(key) selects rate/16 of rows, identically
in Spark, DuckDB, or any engine with sha256.

100 TB shape: the predicate is codegen arithmetic pushed into the scan
(no shuffle, no state); the per-stratum report is one hash agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def deterministic_keep(key: Column, rate_16ths: int = 2) -> Column:
    """True for ~rate_16ths/16 of rows, as a pure function of `key`."""
    if not 1 <= rate_16ths <= 16:
        raise ValueError("rate_16ths must be in 1..16")
    nib = F.substring(F.sha2(key.cast("string"), 256), 1, 1)
    return nib.isin(*_HEX[:rate_16ths])


def stratified_sample_stats(
    docs: DataFrame, strata_col: str = "lang", rate_16ths: int = 2
) -> DataFrame:
    """(stratum, total, sampled, rate) — apply the deterministic sample
    and report realised per-stratum rates, the audit artifact a curation
    run persists next to the sampled output."""
    keep = deterministic_keep(F.col("doc_id"), rate_16ths)
    return (
        docs.groupBy(F.col(strata_col).alias("stratum"))
        .agg(
            F.count("*").alias("total"),
            F.sum(keep.cast("long")).alias("sampled"),
        )
        .select(
            "stratum",
            "total",
            "sampled",
            F.round(F.col("sampled") / F.col("total"), 6).alias("rate"),
        )
    )
