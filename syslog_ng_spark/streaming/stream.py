"""Structured Streaming variants of the pipeline stages.

The reference is a daemon: sources push, the pipe graph runs
continuously, timeouts fire off a timer wheel. The streaming rebuild maps
that onto micro-batches: ``readStream`` → the SAME column-expression
stages (parsers/filters/rewrites are pure projections, so batch and
stream share code verbatim) → watermarked windowed aggregation →
``foreachBatch`` fan-out writes.

Flow-control (cfg-tree.h:39) maps to ``maxFilesPerTrigger``/
``maxOffsetsPerTrigger``; the timer wheel maps to watermarks + session
windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.pipeline import Pipeline


def stream_route(
    stream_df: DataFrame,
    pipeline: Pipeline,
    base_path: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
):
    """Route a streaming frame through a Pipeline with one foreachBatch.

    Each micro-batch reuses the batch router (compute branch booleans
    once, N filtered writes) — exactly-once per sink comes from the
    streaming checkpoint + idempotent batch overwrites.
    """

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        routed = pipeline.route(batch_df, persist=True)
        try:
            for p in pipeline.paths:
                routed.sink(p.name).write.mode("append").format(fmt).save(
                    f"{base_path}/{p.name}"
                )
        finally:
            routed.unpersist()

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def windowed_counts(
    stream_df: DataFrame,
    key: list[str],
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key tumbling/sliding window counts with late-data handling —
    the streaming grouping-by analogue (metrics-probe shape)."""
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), *key)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def session_counts(
    stream_df: DataFrame,
    key: list[str],
    gap: str = "60 seconds",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time session windows — the timer-wheel timeout analogue
    (grouping-parser.c:159-180): a context closes after ``gap`` silence."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), *key)
        .agg(F.count(F.lit(1)).alias("n"))
    )
