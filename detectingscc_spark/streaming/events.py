"""Structured Streaming layer.

The reference is batch-only (SURVEY.md §2.10); the engine adds the
standard streaming surface a link-graph/training pipeline needs:

  * `stream_events`        file-source readStream over parquet drops
  * `hourly_counts`        watermarked tumbling-window aggregation
  * `run_to_memory`        availableNow trigger -> in-memory table
                           (test/bootstrap harness; production sinks are
                           parquet/Iceberg via the same writer settings)

Incremental edge ingest: `stream_corpus_edges` applies the SAME
extraction expression as batch ingest to a corpus stream, demonstrating
that ingest is replayable (checkpointed source offsets) — the streaming
complement of the superstep checkpoint/resume protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, input_dir: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h windows per event_type with late-data watermark."""
    return (
        events.withColumn("ts_ltz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_ltz", watermark)
        .groupBy(F.window("ts_ltz", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "sum_value")
    )


def stream_corpus_edges(spark: SparkSession, input_dir: str, corpus_schema: str) -> DataFrame:
    """Streaming edge extraction: same expression as batch ingest
    (detectingscc_spark.ingest.IMPORT_RE), incremental over corpus drops."""
    from ..ingest import IMPORT_RE

    src = spark.readStream.schema(corpus_schema).parquet(input_dir)
    return src.select(
        F.col("fid").alias("src"),
        F.explode(
            F.transform(
                F.regexp_extract_all(F.col("content"), F.lit(IMPORT_RE), F.lit(1)),
                lambda x: x.cast("long"),
            )
        ).alias("dst"),
    )


def run_to_memory(df: DataFrame, name: str, output_mode: str = "complete"):
    """Drain all available input into an in-memory table; returns query."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
