"""Structured Streaming: windowed aggregation and incremental edge
extraction agree with their batch equivalents."""

import shutil

from pyspark.sql import functions as F

from detectingscc_spark.corpus import generate_corpus
from detectingscc_spark.ingest import extract_import_edges
from detectingscc_spark.streaming.events import (
    hourly_counts,
    run_to_memory,
    sessionize_stream,
    stream_corpus_edges,
    stream_events,
)

SF = "/root/testdata/sf0.001"


def test_stream_hourly_matches_batch(spark, tmp_path):
    src_dir = tmp_path / "events_in"
    src_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", src_dir / "part-0.parquet")
    agg = hourly_counts(stream_events(spark, str(src_dir)))
    run_to_memory(agg, "hourly_t")
    got = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.table("hourly_t").collect()
    }
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("hour"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .collect()
    )
    exp = {(r["hour"], r["event_type"]): (r["n"], r["sum_value"]) for r in batch}
    assert got == exp


def test_stateful_sessionize_closed_sessions_match_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: after one availableNow drain,
    every CLOSED session (all but each user's last) must match the batch
    analytic-window sessionize query exactly; the trailing open session
    per user stays in state awaiting the event-time timeout."""
    src_dir = tmp_path / "sess_in"
    src_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", src_dir / "part-0.parquet")
    sess = sessionize_stream(stream_events(spark, str(src_dir)))
    run_to_memory(sess, "sessions_t", output_mode="append")
    got = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["session_start"])
        for r in spark.table("sessions_t").collect()
    }

    import __spark_entry__ as se

    batch = se.q_sessionize(spark, SF).collect()
    last_seq = {}
    for r in batch:
        last_seq[r["user_id"]] = max(last_seq.get(r["user_id"], 0), r["session_seq"])
    all_batch = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["session_start"].replace(tzinfo=None))
        for r in batch
    }
    closed = {
        k: v for k, v in all_batch.items() if k[1] < last_seq[k[0]]
    }
    got_norm = {k: (n, s.replace(tzinfo=None)) for k, (n, s) in got.items()}
    # every emitted session matches the batch query exactly...
    for k, v in got_norm.items():
        assert all_batch[k] == v, (k, v, all_batch.get(k))
    # ...every gap-closed session was emitted (final sessions may also
    # appear when the event-time timeout fired before the drain ended)
    assert set(closed) <= set(got_norm)


def test_stream_edge_extraction_matches_batch(spark, tmp_path):
    n = 120
    corpus = generate_corpus(spark, n)
    cdir = str(tmp_path / "corpus_in")
    corpus.write.parquet(cdir)
    schema = "fid long, repo string, path string, commit string, lang string, content string"
    edges_stream = stream_corpus_edges(spark, cdir, schema)
    run_to_memory(edges_stream, "edges_t", output_mode="append")
    got = {(r["src"], r["dst"]) for r in spark.table("edges_t").collect()}
    exp = {
        (r["src"], r["dst"])
        for r in extract_import_edges(corpus).select("src", "dst").collect()
    }
    assert got == exp


def test_stream_dedup_exact(spark, tmp_path):
    """dropDuplicatesWithinWatermark dedup: one survivor per distinct
    content within the horizon, matching batch exact-dedup identity."""
    import pyspark.sql.functions as F

    from detectingscc_spark.streaming.events import dedup_stream, run_to_memory

    src_dir = tmp_path / "docs_in"
    src_dir.mkdir()
    base = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc body "), (F.col("id") % 20)).alias("content"),  # 3x dup per body
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("ts"),
    )
    base.write.mode("overwrite").parquet(str(src_dir))
    stream = spark.readStream.schema("doc_id long, content string, ts timestamp").parquet(str(src_dir))
    deduped = dedup_stream(stream, ts_col="ts")
    run_to_memory(deduped, "dedup_t", output_mode="append")
    got = spark.table("dedup_t").collect()
    shas = [r["content_sha"] for r in got]
    assert len(shas) == 20, f"expected 20 survivors, got {len(shas)}"
    assert len(set(shas)) == 20
    batch_shas = {
        r["sha"] for r in base.select(F.sha2("content", 256).alias("sha")).distinct().collect()
    }
    assert set(shas) == batch_shas


def test_sessionize_seq_survives_timeout_flush(spark, tmp_path):
    """A user whose open session is flushed by the event-time timeout and
    who later returns must CONTINUE session numbering (seq 2, 3, ...),
    not restart at 1 — exact parity with the batch query's running-sum
    numbering. Drives four checkpointed availableNow drains so the flush
    happens on the timeout path (no data for the user in that batch),
    which a single drain cannot exercise."""
    import pandas as pd
    from pyspark.sql import functions as F

    src_dir = tmp_path / "sess_seq_in"
    src_dir.mkdir()
    ckpt = str(tmp_path / "sess_seq_ckpt")
    t0 = 1700000000  # epoch seconds

    def write_batch(idx, rows):
        # rows: list of (user_id, offset_seconds)
        df = spark.createDataFrame(
            [(i, pd.Timestamp(t0 + off, unit="s").to_pydatetime(), uid, "click", 1.0, "{}")
             for i, (uid, off) in enumerate(rows)],
            schema="event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
        )
        df.coalesce(1).write.parquet(str(src_dir / f"b{idx}"))

    out_dir = str(tmp_path / "sess_seq_out")

    def drain(name):
        # memory sink cannot recover from a checkpoint; the parquet sink
        # is the fault-tolerant path and is what production would use
        sess = sessionize_stream(stream_events(spark, str(src_dir) + "/*"))
        q = (
            sess.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: user 42 two events 5 min apart; user 7 keeps the clock moving
    write_batch(1, [(42, 0), (42, 300), (7, 0)])
    drain("sess_seq_t1")
    # batch 2: only user 7, 10h later -> watermark passes user 42's
    # timeout (last_event + 30min); 42's open session flushes on the
    # TIMEOUT path (no data for 42 in this batch)
    write_batch(2, [(7, 36000)])
    drain("sess_seq_t2")
    # batch 3: user 42 returns 20h in -> must open session seq=2
    write_batch(3, [(42, 72000), (42, 72060)])
    drain("sess_seq_t3")
    # batch 4: user 7 at 30h advances the watermark so 42's second
    # session also flushes via timeout
    write_batch(4, [(7, 108000)])
    drain("sess_seq_t4")

    collected = spark.read.parquet(out_dir).collect()
    got42 = sorted(
        (r["session_seq"], r["n_events"]) for r in collected if r["user_id"] == 42
    )
    assert got42 == [(1, 2), (2, 2)], got42


def test_stream_ingest_then_scc_matches_batch(spark, tmp_path):
    """End-to-end incremental graph build: a 2-drop corpus stream feeds
    edge extraction; SCC on the accumulated edge snapshot equals the
    batch run over the union corpus — the streaming-ingest ->
    snapshot-algorithm contract."""
    from detectingscc_spark.operators.scc import strongly_connected_components

    full = generate_corpus(spark, 160).persist()
    full.count()
    cdir = tmp_path / "corpus_stream"
    cdir.mkdir()
    out_dir = str(tmp_path / "edges_out")
    ckpt = str(tmp_path / "ingest_ckpt")
    schema = "fid long, repo string, path string, commit string, lang string, content string"

    def drop_and_drain(part):
        part.coalesce(1).write.mode("append").parquet(str(cdir))
        q = (
            stream_corpus_edges(spark, str(cdir), schema)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drop_and_drain(full.where(F.col("fid") < 80))
    drop_and_drain(full.where(F.col("fid") >= 80))

    snap_edges = spark.read.parquet(out_dir)
    verts = full.select(F.col("fid").alias("id"))
    got = {
        (r["id"], r["scc_id"])
        for r in strongly_connected_components(spark, snap_edges, verts).collect()
    }
    batch_edges = extract_import_edges(full).select("src", "dst")
    exp = {
        (r["id"], r["scc_id"])
        for r in strongly_connected_components(spark, batch_edges, verts).collect()
    }
    assert got == exp
