"""Structured Streaming composition of the engine operators.

The reference is a pure batch library (no streaming surface); the engine adds
the standard streaming shape for the tile workload: a stream of point events
→ stateless tile assignment (the same native ``exprs.tile_from_xy``
projection — works unchanged on streams) → watermarked, windowed per-tile
counts.  Late data beyond the watermark is dropped by Spark's state store;
checkpointing gives exactly-once sink semantics.

Usage:
    stream = spark.readStream.schema(schema).parquet(in_dir)
    agg = stream_tile_counts(stream, tp, zoom=5, ts_col="ts",
                             window_duration="10 minutes", watermark="5 minutes")
    (agg.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .toTable("tile_counts"))
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import exprs
from .grid import PyramidConfig
from .operators import assign


def stream_with_tile(
    stream: DataFrame,
    tp: PyramidConfig,
    zoom: exprs.ZoomLike,
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """Stateless point→tile assignment on a streaming DataFrame — identical
    Column expressions as the batch operator (assign.with_tile)."""
    return assign.with_tile(stream, tp, zoom, x, y)


def stream_tile_counts(
    stream: DataFrame,
    tp: PyramidConfig,
    zoom: exprs.ZoomLike,
    ts_col: str = "ts",
    x: str = "lon",
    y: str = "lat",
    window_duration: str = "10 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Watermarked, windowed per-tile event counts.

    Output: (window struct, row, col, n).  State is bounded by the
    watermark; at 10^12-row scale the state key space is
    windows × populated tiles — partitioned by the same tile key as the
    batch aggregations.
    """
    tiled = stream_with_tile(stream.withWatermark(ts_col, watermark), tp, zoom, x, y)
    return (
        tiled.groupBy(F.window(F.col(ts_col), window_duration), "row", "col")
        .agg(F.count("*").alias("n"))
    )
