"""Stream-safe transforms (SURVEY §2.10).

The reference has no streaming — it's a stated future requirement ("spatial
system emits events", /root/reference/etl-notes.md:9). The engine's
contract: every row-level transform (row→quad fan-out, enrichment joins
against static reference tables) is expressed as a pure DataFrame→DataFrame
function, so the same function applies to a batch DF and a ``readStream``
DF (stream-static joins, stateless projections). Windowed aggregation with
watermarks covers late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type. Works identically on a
    batch DF (oracle-checkable: window start == date_trunc) and a streaming
    DF (pass watermark to bound state)."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_event_counts(
    events: DataFrame,
    window_duration: str = "2 hours",
    slide: str = "1 hour",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """SLIDING-window counts/sums per event_type: each event lands in
    duration/slide overlapping windows (Spark's window() emits the window
    list; the explode is implicit). Same function is stream-safe — pass a
    watermark to bound state at duration + lateness. Batch semantics equal
    streaming semantics, which is what the oracle exploits: a window
    starting at date_trunc(slide, ts) - k*slide for k < duration/slide
    contains ts."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.window(F.col(ts_col), window_duration, slide).alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_static_enrich(stream_df: DataFrame, static_dim: DataFrame, on: str, how: str = "left") -> DataFrame:
    """Stream-static join: the streaming side keeps its micro-batch
    semantics, the static side is re-read per batch (broadcastable)."""
    return stream_df.join(F.broadcast(static_dim), on, how)


def run_stream_over_directory(
    spark,
    input_dir: str,
    schema,
    transform,
    output_path: str,
    checkpoint: str,
):
    """File-source streaming harness: readStream over a directory of files →
    transform → parquet sink with checkpointing. Used by tests to prove the
    batch transforms are stream-safe."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    out = transform(src)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    return q


def interval_stream_join(
    clicks: DataFrame,
    views: DataFrame,
    key: str = "user_id",
    lookback: str = "6 hours",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join: each click pairs with the same key's views
    in ``[click_ts - lookback, click_ts]``.

    The reference's stated streaming requirement (spatial events over
    message-oriented middleware, /root/reference/etl-notes.md:9) needs
    exactly this shape to correlate update events. Works identically on
    batch DataFrames (the DuckDB oracle form) and on streaming ones: under
    ``readStream`` BOTH sides get a watermark and Spark derives state
    eviction from the time-range join condition — without the range bound
    the join state would grow without limit. ``watermark`` should exceed
    the worst expected disorder; pairs older than it are dropped on the
    stream path (late data), which is the documented stream/batch delta.
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col(key).alias("c_key"),
        F.col("ts").alias("click_ts"),
    )
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col(key).alias("v_key"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    if watermark is not None and c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
        v = v.withWatermark("view_ts", watermark)
    cond = (
        (F.col("c_key") == F.col("v_key"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("view_ts") <= F.col("click_ts"))
    )
    # "left_outer" emits a null-match row for clicks with no view in the
    # lookback window — but ONLY once the (min-of-both-sides) watermark
    # passes the click's match horizon, because until then a matching
    # view could still arrive. A finite stream therefore under-emits
    # unless something advances the watermark past the tail; see
    # stream_stream_left_outer in plans/extensions.py for the
    # sentinel-and-resume pattern that makes it deterministic.
    # full_outer additionally emits null-click rows for views no
    # click ever matched; the key then comes from whichever side is
    # present
    user = (F.coalesce(F.col("c_key"), F.col("v_key"))
            if how == "full_outer" else F.col("c_key"))
    return c.join(v, cond, how).select(
        "click_id", "view_id", user.alias("user_id"), "click_ts", "view_ts", "view_value"
    )
