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

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


_DEDUP_OUT = T.StructType(
    [
        T.StructField("fp", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("is_new", T.BooleanType()),
    ]
)
_DEDUP_STATE = T.StructType([T.StructField("seen", T.IntegerType())])


def stream_exact_dedup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Custom stateful operator: exact streaming dedup across micro-batches
    via ``applyInPandasWithState``.

    Keyed by the md5 fingerprint of normalized text; GroupState remembers
    whether a fingerprint was already emitted, so only the FIRST arrival of
    each distinct document (smallest id within the batch) survives — the
    streaming counterpart of ``dedup.dedup_exact``.  State size = one int
    per distinct fingerprint; at scale, pair with a TTL timeout for bounded
    state.
    """
    def dedup_fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        seen = state.get[0] if state.exists else 0
        first_id = None
        for pdf in pdfs:
            if len(pdf) and first_id is None:
                first_id = int(pdf["doc_id"].min())
            elif len(pdf):
                first_id = min(first_id, int(pdf["doc_id"].min()))
        if first_id is None:
            return
        if not seen:
            state.update((1,))
            yield pd.DataFrame({"fp": [key[0]], "doc_id": [first_id], "is_new": [True]})

    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = stream.select(
        F.md5(
            F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
        ).alias("fp"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    return keyed.groupBy("fp").applyInPandasWithState(
        dedup_fn,
        outputStructType=_DEDUP_OUT,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
