"""Streaming pipelines.

The reference's "stream" is a bounded pull iterator with no time
semantics (SURVEY.md §2.6). Structured Streaming is the Spark-native
superset: the same lens pipeline specs apply unchanged to a streaming
DataFrame because every built-in lens is an incremental-safe transform
(narrow projections/filters; aggregating lenses require a watermark).

``apply_stream`` intentionally reuses lens_spark.engine.append — a
DataFrame is a DataFrame; Catalyst handles incrementalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lens_spark import engine


def apply_stream(stream_df: DataFrame, spec) -> DataFrame:
    """Apply a pipeline spec to a streaming DataFrame."""
    return engine.append(stream_df, spec)


def windowed_counts(stream_df: DataFrame, *, ts_col: str, window: str = "1 hour",
                    watermark: str = "2 hours", keys: list[str] | None = None) -> DataFrame:
    """Event-time tumbling-window counts with late-data handling.

    Batch DataFrames run the same plan (watermark is a no-op), which is
    how the oracle checks this operator.
    """
    keys = keys or []
    df = stream_df
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            *keys,
            "n_events",
            F.round(F.col("sum_value"), 6).alias("sum_value"),
        )
    )
