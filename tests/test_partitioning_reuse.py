"""Round-7 load-bearing mechanism guard.

The iterative engines persist their loop-invariant edge frames keyed by
the aggregation key (broadcast regime) so every superstep's aggregation
plans as a partial+final HashAggregate pair with NO shuffle Exchange:
this works because `persist()` preserves a frame's physical partitioning
through `tick(truncate=False)` while `localCheckpoint()` does not.
WCC/LPA/PageRank/coloring/scc-BFS all rely on it (OPTIMIZATION_r07.md).
If a Spark upgrade ever stops propagating partitioning through
persist + broadcast join + projection, these assertions flag it before
the bench does.
"""

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _n_shuffle_exchanges_outside_cache(df) -> int:
    """Count shuffle Exchange operators in the TOP-LEVEL plan only (the
    one-time cached-build subtree inside InMemoryRelation is expected to
    contain the keying exchange)."""
    s = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    total = 0
    for line in s.splitlines():
        if "InMemoryRelation" in line:
            break  # everything below is the cached build
        if "Exchange" in line and "BroadcastExchange" not in line:
            total += 1
    return total


def test_persist_preserves_partitioning_for_exchange_free_agg(spark):
    e = spark.range(50_000).select(
        (F.col("id") % 997).alias("src"), ((F.col("id") * 7) % 997).alias("dst")
    )
    lab = (
        spark.range(997)
        .select(F.col("id"), F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )
    ep = e.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)
    ep.write.format("noop").mode("overwrite").save()
    # the tick(detach=False) alias projection must not drop partitioning
    ep = ep.select([F.col(c).alias(c) for c in ep.columns])
    pull = (
        ep.join(
            F.broadcast(lab.select(F.col("id").alias("dst"), F.col("label").alias("nl"))),
            "dst",
        )
        .groupBy("src")
        .agg(F.min("nl").alias("nmin"))
    )
    assert _n_shuffle_exchanges_outside_cache(pull) == 0, (
        "broadcast join + projection no longer carry persisted hash "
        "partitioning into the aggregation — the engines' exchange-free "
        "superstep shape (OPTIMIZATION_r07.md) is broken"
    )
    # result sanity: the exchange-free plan computes the same aggregate
    expected = (
        e.join(lab.select(F.col("id").alias("dst"), F.col("label").alias("nl")), "dst")
        .groupBy("src")
        .agg(F.min("nl").alias("nmin"))
    )
    got = {(r["src"], r["nmin"]) for r in pull.collect()}
    want = {(r["src"], r["nmin"]) for r in expected.collect()}
    assert got == want
    ep.unpersist()


def test_localcheckpoint_does_not_preserve_partitioning(spark):
    """Documents the asymmetry the engines code around: if this ever
    starts passing the exchange-free way, the persist work-arounds can
    be simplified (and this test updated) — either way it should be a
    conscious decision, not a silent plan change."""
    e = spark.range(50_000).select(
        (F.col("id") % 997).alias("src"), ((F.col("id") * 7) % 997).alias("dst")
    )
    ck = e.repartition("src").localCheckpoint(eager=True)
    agg = ck.groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    assert _n_shuffle_exchanges_outside_cache(agg) >= 1
