"""Raster ↔ vector bridge + per-row image verification.

* ``raster_tile_windows``: map each image footprint onto pyramid tiles and
  compute the pixel window of the footprint inside each tile via the tile
  affine (``_tile.py:126-139``) — pure native Column math after the cover
  explode; this is the engine's "raster↔vector tiling onto row/col/zoom
  addressing" operator.
* ``verify_images``: the BASELINE per-row invariant — decode each image,
  REGENERATE the expected pixels deterministically from image_id
  (images.py), check allclose for ``raw`` / PSNR ≥ 40 dB for lossy, caption
  equality, and phash equality.  Arrow-batched ``mapInPandas``; no per-row
  Python UDFs.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import exprs, images
from .functions.multimodal import _shape_groups
from .grid import PyramidConfig
from .operators import cover as cover_ops


def raster_tile_windows(
    df: DataFrame,
    tp: PyramidConfig,
    zoom: exprs.ZoomLike,
    fp_left: str = "fp_left",
    fp_bottom: str = "fp_bottom",
    fp_right: str = "fp_right",
    fp_top: str = "fp_top",
    pixelbuffer: int = 0,
    max_cover_tiles: Optional[int] = None,
) -> DataFrame:
    """Explode images onto the tiles their footprint covers, with the pixel
    window of the footprint inside each (buffered) tile.

    Output adds: row, col, tile pixel window (win_col_off, win_row_off,
    win_width, win_height) — the affine-inverse mapping
    ``col = (x - tile.left)/px``, ``row = (tile.top - y)/py``, clipped to the
    tile shape.  Windows are in the tile's pixel grid; callers slice decoded
    arrays with them.
    """
    out = cover_ops.tiles_from_bounds(
        df, tp, zoom, left=fp_left, bottom=fp_bottom, right=fp_right, top=fp_top,
        max_cover_tiles=max_cover_tiles,
    )
    b = exprs.tile_bounds(tp, zoom, "row", "col", pixelbuffer)
    s = exprs.tile_shape(tp, zoom, "row", "col", pixelbuffer)
    px = exprs.pixel_x_size(tp, zoom)
    py = exprs.pixel_y_size(tp, zoom)
    w_px = s["width"].cast("long")
    h_px = s["height"].cast("long")

    # x-axis: a footprint straddling the antimeridian meets wrapped tiles —
    # evaluate the window at footprint shifts {0, ±span} and keep the one
    # with the widest overlap (native when-chain, no Python)
    def x_window(shift: float):
        fl = F.col(fp_left) + F.lit(shift)
        fr = F.col(fp_right) + F.lit(shift)
        off = F.greatest(exprs.trunc_long(F.floor((fl - b["left"]) / px)), F.lit(0).cast("long"))
        end = F.least(exprs.trunc_long(F.ceil((fr - b["left"]) / px)), w_px)
        width = F.greatest(end - off, F.lit(0).cast("long"))
        return off, width

    shifts = [0.0]
    if tp.is_global:
        span = tp.right - tp.left
        shifts += [-span, span]
    offs_widths = [x_window(sh) for sh in shifts]
    best_off, best_width = offs_widths[0]
    for off, width in offs_widths[1:]:
        better = width > best_width
        best_off = F.when(better, off).otherwise(best_off)
        best_width = F.when(better, width).otherwise(best_width)
    # keep offset within the tile even for zero-width windows
    best_off = F.least(best_off, w_px)

    row_off = F.greatest(exprs.trunc_long(F.floor((b["top"] - F.col(fp_top)) / py)), F.lit(0).cast("long"))
    row_end = F.least(exprs.trunc_long(F.ceil((b["top"] - F.col(fp_bottom)) / py)), h_px)
    return (
        out.withColumn("win_col_off", best_off)
        .withColumn("win_row_off", F.least(row_off, h_px))
        .withColumn("win_width", best_width)
        .withColumn("win_height", F.greatest(row_end - row_off, F.lit(0).cast("long")))
    )


_VERIFY_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("pixels_ok", T.BooleanType()),
        T.StructField("psnr", T.DoubleType()),
        T.StructField("caption_ok", T.BooleanType()),
        T.StructField("phash_ok", T.BooleanType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def verify_images(df: DataFrame, psnr_threshold: float = 40.0) -> DataFrame:
    """Per-row invariant check (BASELINE.json): decoded pixels vs the
    deterministic regeneration, caption equality, phash equality."""

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # vectorized by (w, h, fmt) group: decode/regenerate stacks, one
        # batched PSNR + average-hash per group (pixel regeneration stays
        # per-row — each row owns its own PCG64 stream); ~2x vs per-row
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            idxs = images.image_idx(pdf["image_id"])
            psnr_v = np.empty(m, dtype=np.float64)
            pixels_ok = np.zeros(m, dtype=bool)
            phash_ok = np.zeros(m, dtype=bool)
            for w, h, fmt, ii in _shape_groups(pdf):
                decoded = np.stack(
                    [images.decode(pdf["bytes"].iat[i], w, h, fmt) for i in ii]
                )
                expected = images.gen_pixels_batch(idxs[ii], w, h)
                diff = decoded.astype(np.float64) - expected.astype(np.float64)
                mse = np.einsum("nijk,nijk->n", diff, diff) / diff[0].size
                with np.errstate(divide="ignore"):
                    p = 10.0 * np.log10(255.0**2 / mse)
                p[mse == 0] = np.inf
                psnr_v[ii] = p
                pixels_ok[ii] = (mse == 0) if fmt == "raw" else (p >= psnr_threshold)
                phash_ok[ii] = (
                    images.average_hash_batch(decoded)
                    == pdf["phash"].to_numpy()[ii]
                )
            lon, lat = images._lonlat_batch(idxs)
            caption_ok = pdf["caption"].to_numpy() == images.captions_batch(idxs, lon, lat)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].values,
                    "fmt": pdf["fmt"].values,
                    "pixels_ok": pixels_ok,
                    "psnr": psnr_v,
                    "caption_ok": caption_ok,
                    "phash_ok": phash_ok,
                    "ok": pixels_ok & caption_ok & phash_ok,
                }
            )

    return df.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash").mapInPandas(
        check, schema=_VERIFY_SCHEMA
    )
