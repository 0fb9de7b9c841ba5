"""Structured Streaming layer.

The reference is batch-only (SURVEY.md §2.10); the engine adds the
standard streaming surface a link-graph/training pipeline needs:

  * `stream_events`        file-source readStream over parquet drops
  * `hourly_counts`        watermarked tumbling-window aggregation
  * `sessionize_stream`    CUSTOM STATEFUL operator: gap-based sessions
                           per user via applyInPandasWithState (Arrow
                           batches, numpy gap-walk, per-user open-session
                           state carried across micro-batches, event-time
                           timeout flush at the watermark)
  * `dedup_stream`         streaming exact dedup: sha256 content key,
                           dropDuplicatesWithinWatermark (state bounded
                           by the watermark horizon, the scale-safe form
                           of streaming dedup)
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


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming gap-based sessionization (the stateful-streaming
    complement of the batch analytic-window sessionize query,
    __spark_entry__.q_sessionize — same 30-min-gap semantics).

    Per micro-batch and user: batch timestamps merge with the carried
    open session; every gap > gap_minutes CLOSES a session, which is
    emitted immediately; the trailing open session stays in GroupState
    with an event-time timeout one gap past its last event, so the
    watermark eventually flushes it. Output rows therefore match the
    batch query exactly for all sessions whose closing gap has been
    observed (tested).

    Emits (user_id, session_seq, n_events, session_start); session_seq is
    the 1-based per-user session counter, identical to the batch query's
    running sum of session starts. The counter SURVIVES a timeout flush:
    instead of state.remove(), the timed-out group keeps a closed marker
    (n=0, next seq) with no timeout set, so a user who returns after a
    flush continues numbering where the batch query would (tested across
    four checkpointed drains in test_streaming.py). The marker is one
    4-long row per ever-seen user — bounded by the user universe, the
    price of exact batch-parity numbering.
    """
    import numpy as np
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state):
        user_id = key[0]
        ts_us = []
        for pdf in pdfs:
            if len(pdf):
                ts_us.append(pdf["ts_ltz"].values.astype("datetime64[us]").astype("int64"))
        if state.hasTimedOut:
            start_us, last_us, n, seq = state.get
            # keep the per-user counter: closed marker (n=0), no timeout
            state.update((0, int(last_us), 0, int(seq) + 1))
            yield pd.DataFrame(
                {"user_id": [user_id], "session_seq": [seq], "n_events": [n],
                 "session_start": [pd.Timestamp(start_us, unit="us")]}
            )
            return
        ts = np.sort(np.concatenate(ts_us)) if ts_us else np.empty(0, "int64")
        if ts.size == 0:
            return
        fresh = not state.exists
        if state.exists:
            start_us, last_us, n, seq = state.get
            if n == 0:  # closed marker left by a timeout flush: resume numbering
                fresh = True
        if fresh:
            t0 = int(ts[0])
            if state.exists:
                seq = state.get[3]  # continue after the flushed session
            else:
                seq = 1
            start_us, last_us, n = t0, t0, 1
            ts = ts[1:]
        out_rows = {"user_id": [], "session_seq": [], "n_events": [], "session_start": []}
        for t in ts.tolist():
            if t - last_us > gap_us:
                out_rows["user_id"].append(user_id)
                out_rows["session_seq"].append(seq)
                out_rows["n_events"].append(n)
                out_rows["session_start"].append(pd.Timestamp(start_us, unit="us"))
                seq += 1
                start_us, n = t, 1
            else:
                n += 1
            last_us = t
        state.update((int(start_us), int(last_us), int(n), int(seq)))
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)  # ms epoch
        if out_rows["user_id"]:
            yield pd.DataFrame(out_rows)

    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = events.withColumn("ts_ltz", F.col("ts").cast("timestamp")).withWatermark(
        "ts_ltz", watermark
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, session_seq long, n_events long, session_start timestamp",
        stateStructType="start_us long, last_us long, n long, seq long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def dedup_stream(
    docs: DataFrame, ts_col: str = "ts", key_cols: tuple[str, ...] = ("content_sha",), watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact deduplication — the incremental complement of the
    batch `functions.dedup.exact_dedup` (same sha256-content identity).

    Rows carrying a key already seen within the watermark horizon are
    dropped; `dropDuplicatesWithinWatermark` bounds the dedup state by
    event time, which is what makes streaming dedup viable at corpus
    scale (an unbounded `dropDuplicates` would grow state forever).
    Expects a `content` column (the sha key is derived here) and an
    event-time column `ts_col`.
    """
    keyed = docs.withColumn("content_sha", F.sha2(F.col("content"), 256)).withColumn(
        "ts_wm", F.col(ts_col).cast("timestamp")
    )
    return keyed.withWatermark("ts_wm", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "complete", checkpoint_dir: str | None = None
):
    """Drain all available input into an in-memory table; returns query.

    With `checkpoint_dir`, source offsets and operator state persist, so
    repeated drains against the same checkpoint resume incrementally —
    the test-harness analogue of a production restart."""
    w = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    q.awaitTermination()
    return q
