"""Structured Streaming: the batch transforms must be stream-safe
(SURVEY §2.10) — same function, readStream source, availableNow trigger."""

from pyspark.sql import functions as F


def test_windowed_agg_stream_equals_batch(spark, sf_dir, tmp_path):
    from cam_etl_spark.io import load_table
    from cam_etl_spark.streaming.transforms import run_stream_over_directory, windowed_event_counts

    events = load_table(spark, sf_dir, "events")
    # stage the (nanos-normalized) events as a stream input directory
    input_dir = str(tmp_path / "in")
    events.write.parquet(input_dir)
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(events, "1 hour").collect()
    }

    q = run_stream_over_directory(
        spark,
        input_dir,
        events.schema,
        lambda df: windowed_event_counts(df, "1 hour", watermark="2 hours"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    stream = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in got.collect()
    }
    # Append-mode watermark semantics: windows still within the 2h watermark
    # of the max event time are held in state, not emitted, when input ends.
    assert stream, "stream produced no output"
    assert all(stream[k] == batch[k] for k in stream), "emitted windows must match batch"
    max_ts = max(r["ts"] for r in events.select("ts").collect())
    held_back = {k for k in batch if k not in stream}
    import datetime

    cutoff = (max_ts - datetime.timedelta(hours=3)).strftime("%Y-%m-%d %H:%M:%S")
    assert all(k[0] >= cutoff for k in held_back), "only trailing windows may be withheld"


def test_stream_static_enrich(spark, sf_dir, tmp_path):
    from cam_etl_spark.io import load_table
    from cam_etl_spark.streaming.transforms import stream_static_enrich

    events = load_table(spark, sf_dir, "events")
    input_dir = str(tmp_path / "in2")
    events.write.parquet(input_dir)
    dim = spark.createDataFrame(
        [("click", "interactive"), ("view", "passive")], "event_type string, kind string"
    )
    src = spark.readStream.schema(events.schema).parquet(input_dir)
    out = stream_static_enrich(src, dim, "event_type")
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "out2"))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out2"))
    assert got.count() == events.count()
    kinds = {r["event_type"]: r["kind"] for r in got.select("event_type", "kind").distinct().collect()}
    assert kinds.get("click") == "interactive"


def test_interval_stream_join_equals_batch(spark, sf_dir, tmp_path):
    """Stream-stream windowed join over micro-batched file streams must
    reproduce the batch interval join exactly (watermark > data disorder)."""
    from cam_etl_spark.io import load_table
    from cam_etl_spark.streaming.transforms import interval_stream_join

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click")
    views = e.filter(F.col("event_type") == "view")

    batch = {
        (r.click_id, r.view_id)
        for r in interval_stream_join(clicks, views, lookback="6 hours").collect()
    }

    clicks.repartition(3).write.parquet(str(tmp_path / "c"))
    views.repartition(3).write.parquet(str(tmp_path / "v"))
    cs = (
        spark.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "c"))
    )
    vs = (
        spark.readStream.schema(views.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "v"))
    )
    q = (
        interval_stream_join(cs, vs, lookback="6 hours", watermark="90 days")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.click_id, r.view_id)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == batch and len(batch) > 0


def test_sliding_window_stream_equals_batch(spark, sf_dir, tmp_path):
    from cam_etl_spark.io import load_table
    from cam_etl_spark.streaming.transforms import (
        run_stream_over_directory,
        sliding_event_counts,
    )

    events = load_table(spark, sf_dir, "events")
    input_dir = str(tmp_path / "in")
    events.write.parquet(input_dir)
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in sliding_event_counts(events, "2 hours", "1 hour").collect()
    }
    # every event contributes to exactly 2 overlapping windows
    n_events = events.count()
    assert sum(v[0] for v in batch.values()) == 2 * n_events

    q = run_stream_over_directory(
        spark,
        input_dir,
        events.schema,
        lambda df: sliding_event_counts(df, "2 hours", "1 hour", watermark="4 hours"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    stream = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert stream, "stream produced no output"
    assert all(stream[k] == batch[k] for k in stream), "emitted windows must match batch"
