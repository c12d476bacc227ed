"""Event-time windows — tumbling, sliding, session — usable in both
batch and Structured Streaming mode.

The reference has no streaming (SURVEY.md §2.9); its closest analog
is the daily catchup micro-batch (O2). This module provides the
engine's event-time surface: the same `F.window` / `session_window`
expressions work on a static DataFrame and on a `readStream` source;
`stream_events` wires the streaming variant with a watermark for
late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: dict[str, F.Column],
) -> DataFrame:
    """Tumbling event-time windows; emits window start/end + aggs."""
    grouped = df.groupBy(F.window(F.col(ts_col), duration), *keys)
    out = grouped.agg(*[c.alias(name) for name, c in aggs.items()])
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: dict[str, F.Column],
) -> DataFrame:
    grouped = df.groupBy(F.window(F.col(ts_col), duration, slide), *keys)
    out = grouped.agg(*[c.alias(name) for name, c in aggs.items()])
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: dict[str, F.Column],
) -> DataFrame:
    """Session windows: events < `gap` apart merge into one session
    (an event at exactly start+gap opens a new session)."""
    grouped = df.groupBy(F.session_window(F.col(ts_col), gap), *keys)
    out = grouped.agg(*[c.alias(name) for name, c in aggs.items()])
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *keys,
        *aggs.keys(),
    )


def stream_events(
    spark: SparkSession,
    source_path: str,
    schema,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """File-source streaming read with a watermark — the incremental
    ingest analog of the reference's daily catchup (O2), but with
    event-time late-data semantics. Pair with
    `.writeStream.trigger(availableNow=True)` for catchup batches."""
    return (
        spark.readStream.schema(schema)
        .parquet(source_path)
        .withWatermark(ts_col, watermark)
    )
