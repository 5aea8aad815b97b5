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
from .functions.multimodal import _shape_groups, decode_image, snapshot_decoders
from .grid import PyramidConfig
from .operators import assign
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


_COMPOSE_SCHEMA = T.StructType(
    [
        T.StructField("row", T.LongType()),
        T.StructField("col", T.LongType()),
        T.StructField("n_images", T.IntegerType()),
        T.StructField("tile_w", T.IntegerType()),
        T.StructField("tile_h", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
    ]
)

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("row", T.LongType()),
        T.StructField("col", T.LongType()),
        T.StructField("n_images", T.IntegerType()),
        T.StructField("tile_w", T.IntegerType()),
        T.StructField("tile_h", T.IntegerType()),
        T.StructField("sum_bytes", T.BinaryType()),
        T.StructField("cnt_bytes", T.BinaryType()),
    ]
)

_WIN_COLS = [
    "row", "col", "bytes", "w", "h", "fmt",
    "fp_left", "fp_bottom", "fp_right", "fp_top",
    "win_col_off", "win_row_off", "win_width", "win_height",
]


def _accumulate(pdf: pd.DataFrame, span, decoders=None) -> tuple:
    """Shared compose accumulator: decode every contributor in ``pdf`` (one
    tile, or one (tile, salt) slice of a hot tile), nearest-neighbor resample
    into the tile pixel grid, and add into int64 sum/count planes.  Integer
    sums are associative, so partial planes from disjoint slices merge to the
    exact same result as one pass (pytest pins byte-identity)."""
    tw = int(pdf["_tw"].iat[0])
    th = int(pdf["_th"].iat[0])
    t_left = float(pdf["_tl"].iat[0])
    t_top = float(pdf["_tt"].iat[0])
    pxs = float(pdf["_px"].iat[0])
    pys = float(pdf["_py"].iat[0])
    acc = np.zeros((th, tw, 3), dtype=np.int64)
    cnt = np.zeros((th, tw, 1), dtype=np.int64)
    blended = 0
    for rec in pdf.itertuples(index=False):
        img = decode_image(rec.bytes, int(rec.w), int(rec.h), rec.fmt, decoders)
        j0, i0 = int(rec.win_col_off), int(rec.win_row_off)
        ww, wh = int(rec.win_width), int(rec.win_height)
        j1, i1 = min(j0 + ww, tw), min(i0 + wh, th)
        if j1 <= j0 or i1 <= i0:
            # defensive only: the win_width/height > 0 filter already implies
            # off < tile dim (off < end <= dim), so every row here blends —
            # n_images therefore counts BLENDED contributors
            continue
        # antimeridian straddlers met this tile at a ±span shift of the
        # footprint: re-derive the winning shift from the window center
        fpl, fpr = rec.fp_left, rec.fp_right
        if span is not None:
            cx = t_left + (j0 + j1) / 2.0 * pxs
            k = round((cx - (fpl + fpr) / 2.0) / span)
            fpl, fpr = fpl + k * span, fpr + k * span
        # tile-pixel centers -> image pixel indices (nearest neighbor)
        fx = np.clip(
            ((t_left + (np.arange(j0, j1) + 0.5) * pxs) - fpl)
            / (fpr - fpl) * int(rec.w),
            0, int(rec.w) - 1,
        ).astype(np.int64)
        fy = np.clip(
            ((t_top - (np.arange(i0, i1) + 0.5) * pys) - rec.fp_top)
            / (rec.fp_bottom - rec.fp_top) * int(rec.h),
            0, int(rec.h) - 1,
        ).astype(np.int64)
        acc[i0:i1, j0:j1] += img[fy][:, fx].astype(np.int64)
        cnt[i0:i1, j0:j1] += 1
        blended += 1
    return acc, cnt, blended, tw, th


def _finalize(acc: np.ndarray, cnt: np.ndarray) -> bytes:
    return np.where(cnt > 0, acc // np.maximum(cnt, 1), 0).astype(np.uint8).tobytes()


def compose_tiles(
    df: DataFrame,
    tp: PyramidConfig,
    zoom: int,
    max_cover_tiles: Optional[int] = None,
    hot_threshold: int = 64,
    salt_buckets: int = 16,
    tiles_filter: Optional[DataFrame] = None,
    max_contributors_per_tile: Optional[int] = None,
) -> DataFrame:
    """Mosaic the images table onto pyramid tiles: every tile gets a raw
    RGB canvas composed from ALL images whose footprint covers it —
    nearest-neighbor resampled onto the tile's pixel grid, overlaps
    averaged (integer mean, deterministic).  The raster→vector tiling
    endgame: (row, col, n_images, tile_w, tile_h, bytes).  ``n_images``
    counts the contributors actually blended into the canvas (≡ the
    window-intersecting rows: win_width/height > 0 implies a non-empty
    clipped window).

    Execution shape — skew-split on runtime stats (the scale fix for hot
    tiles: a popular tile or any low-zoom compose previously concentrated
    EVERY contributor's bytes in one task):

    1. contributor counts per tile come from a slim no-bytes recompute of
       the cover/window math (column-pruned parquet scan, native exprs);
    2. cold tiles (count ≤ ``hot_threshold``) join the counts and compose in
       one ``applyInPandas`` pass — the join shuffle doubles as the groupBy
       shuffle, so contributor bytes still move exactly once;
    3. hot tiles hash-salt contributors into ``salt_buckets`` slices, each
       slice accumulates a partial int32 (sum, count) canvas — per-task bytes
       bounded by count/S contributors — and a second stage merges ≤S small
       canvases per tile.  Integer-mean output is bit-identical to the
       single-pass path (associative sums; pytest pins it).

    ``tiles_filter`` (optional, columns row/col) restricts composition to
    those tile keys via a BROADCAST semi-join applied before any bytes move
    — the incremental-maintenance hook (`incremental.py`): contributor bytes
    shuffle only for the dirty tiles, so update cost is ∝ |dirty cover|,
    not |corpus|.  The filter set is a tile cover (≤ matrix size at the
    compose zoom), small by construction.

    ``max_contributors_per_tile`` (optional): the salted hot path bounds
    per-TASK bytes, but a pathological tile (10⁶ contributors) still pays
    10⁶ decodes spread across its salt slices.  With the cap set, tiles
    over it blend only a deterministic hash-sample of ~cap contributors
    (keep-probability cap/count on a seeded xxhash64 of the contributor
    identity — stable across retries, NO rand()), the rest are counted,
    not decoded.  The output gains an ``n_quarantined`` column (0 for
    uncapped tiles); ``n_images`` keeps counting what was actually
    blended, so ``n_images + n_quarantined`` = the true contributor count.
    Mirrors ``max_cover_tiles``: an explicit, observable bound instead of
    a silent runaway.  Default ``None`` = exact blend of everything (and
    the output schema is unchanged).
    """
    keys = None
    if tiles_filter is not None:
        keys = F.broadcast(tiles_filter.select("row", "col").distinct())
    slim = df.drop("bytes", "caption") if "caption" in df.columns else df.drop("bytes")
    counts = raster_tile_windows(slim, tp, zoom, max_cover_tiles=max_cover_tiles).filter(
        (F.col("win_width") > 0) & (F.col("win_height") > 0)
    )
    if keys is not None:
        counts = counts.join(keys, ["row", "col"], "left_semi")
    counts = counts.groupBy("row", "col").agg(F.count(F.lit(1)).alias("_tile_n"))

    win = raster_tile_windows(df, tp, zoom, max_cover_tiles=max_cover_tiles)
    win = win.filter((F.col("win_width") > 0) & (F.col("win_height") > 0))
    if keys is not None:
        win = win.join(keys, ["row", "col"], "left_semi")
    s = exprs.tile_shape(tp, zoom, "row", "col")
    b = exprs.tile_bounds(tp, zoom, "row", "col")
    px = exprs.pixel_x_size(tp, zoom)
    py = exprs.pixel_y_size(tp, zoom)
    # hot-path salt: MUST include a per-row unique column (image_id) —
    # exact-duplicate contributors (the same image re-ingested, a canonical
    # hot-tile cause) share footprint/dims/fmt and would otherwise collapse
    # into one salt bucket, degenerating the skew split back to one task.
    # Deterministic (no rand()): a retried map task must re-emit the same
    # bucket keys or rows shift buckets mid-shuffle.
    salt_cols = ["fp_left", "fp_bottom", "fp_right", "fp_top", "w", "h", "fmt"]
    if "image_id" in win.columns:
        salt_cols = ["image_id", *salt_cols]
    salt = F.pmod(F.xxhash64(*salt_cols), F.lit(salt_buckets))
    proj = [
        *_WIN_COLS,
        salt.alias("_salt"),
        s["width"].cast("int").alias("_tw"),
        s["height"].cast("int").alias("_th"),
        b["left"].alias("_tl"),
        b["top"].alias("_tt"),
        px.alias("_px"),
        py.alias("_py"),
    ]
    if max_contributors_per_tile is not None:
        # uniform-in-[0,1) per contributor, seeded apart from the salt hash
        # so sampling and salting stay uncorrelated; deterministic across
        # task retries (same discipline as the salt)
        qh = (
            F.pmod(F.xxhash64(F.lit("tmx_quarantine"), *salt_cols), F.lit(1 << 30))
        ).cast("double") / F.lit(float(1 << 30))
        proj.append(qh.alias("_qh"))
    win = win.select(*proj).join(counts, on=["row", "col"])

    quarantine = None
    if max_contributors_per_tile is not None:
        cap = int(max_contributors_per_tile)
        keep = (F.col("_tile_n") <= cap) | (
            F.col("_qh") * F.col("_tile_n") < F.lit(float(cap))
        )
        quarantine = (
            win.filter(~keep)
            .groupBy("row", "col")
            .agg(F.count(F.lit(1)).alias("n_quarantined"))
        )
        win = win.filter(keep).drop("_qh")

    span = (tp.right - tp.left) if tp.is_global else None
    decoders = snapshot_decoders()  # ships to executors in the kernel closures

    def compose(pdf: pd.DataFrame) -> pd.DataFrame:
        acc, cnt, blended, tw, th = _accumulate(pdf, span, decoders)
        return pd.DataFrame(
            {
                "row": [int(pdf["row"].iat[0])],
                "col": [int(pdf["col"].iat[0])],
                "n_images": [blended],
                "tile_w": [tw],
                "tile_h": [th],
                "bytes": [_finalize(acc, cnt)],
            }
        )

    cold = (
        win.filter(F.col("_tile_n") <= hot_threshold)
        .drop("_salt")  # keep the cold-path Arrow transfer slim
        .groupBy("row", "col")
        .applyInPandas(compose, schema=_COMPOSE_SCHEMA)
    )

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        acc, cnt, blended, tw, th = _accumulate(pdf, span, decoders)
        return pd.DataFrame(
            {
                "row": [int(pdf["row"].iat[0])],
                "col": [int(pdf["col"].iat[0])],
                "n_images": [blended],
                "tile_w": [tw],
                "tile_h": [th],
                # 255·n fits int32 up to 8.4M contributors per slice
                "sum_bytes": [acc.astype(np.int32).tobytes()],
                "cnt_bytes": [cnt.astype(np.int32).tobytes()],
            }
        )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        tw = int(pdf["tile_w"].iat[0])
        th = int(pdf["tile_h"].iat[0])
        acc = np.zeros((th, tw, 3), dtype=np.int64)
        cnt = np.zeros((th, tw, 1), dtype=np.int64)
        for rec in pdf.itertuples(index=False):
            acc += np.frombuffer(rec.sum_bytes, dtype=np.int32).reshape(th, tw, 3)
            cnt += np.frombuffer(rec.cnt_bytes, dtype=np.int32).reshape(th, tw, 1)
        return pd.DataFrame(
            {
                "row": [int(pdf["row"].iat[0])],
                "col": [int(pdf["col"].iat[0])],
                "n_images": [int(pdf["n_images"].sum())],
                "tile_w": [tw],
                "tile_h": [th],
                "bytes": [_finalize(acc, cnt)],
            }
        )

    hot = (
        win.filter(F.col("_tile_n") > hot_threshold)
        .groupBy("row", "col", "_salt")
        .applyInPandas(partial, schema=_PARTIAL_SCHEMA)
        .groupBy("row", "col")
        .applyInPandas(merge, schema=_COMPOSE_SCHEMA)
    )

    result = cold.unionByName(hot)
    if quarantine is not None:
        result = result.join(quarantine, ["row", "col"], "left").withColumn(
            "n_quarantined", F.coalesce(F.col("n_quarantined"), F.lit(0))
        )
    return result


_OVERVIEW_SCHEMA = T.StructType(
    [
        T.StructField("row", T.LongType()),
        T.StructField("col", T.LongType()),
        T.StructField("n_children", T.IntegerType()),
        T.StructField("tile_w", T.IntegerType()),
        T.StructField("tile_h", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
    ]
)


def overview_level(tiles: DataFrame) -> DataFrame:
    """One pyramid overview step: composed tiles at zoom z → tiles at z-1.

    Each parent (row//2, col//2) assembles from its ≤4 children: a child is
    2×2 box-filtered (integer mean — deterministic, exact) to half
    resolution and placed in its quadrant (row%2, col%2); missing quadrants
    stay black.  Mirrors the overview/downsample step of gdal2tiles-style
    pyramid builds on the reference's grid addressing (row/col halve per
    zoom on both pyramid axes, ``tilematrix/_tile.py`` get_parent).

    Scale shape: a NATIVE ``collect_list`` agg on the parent key (bounded at
    4 elements per group — group memory is 4 canvases regardless of corpus
    size, no skew possible, partial-agg map side), then ``mapInPandas``
    downsamples THOUSANDS of parents per Arrow batch in one stacked numpy
    pass.  The earlier per-parent ``applyInPandas`` shape paid a pandas
    frame per ≤4-row group (measured 2.6x slower on a z6 full-matrix chain,
    where tiny groups dominate).
    Input needs uniform even-dimension raw-RGB tiles (``compose_tiles``
    output on a mt=1 grid).
    """

    def down(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            out_rows = pdf["_pr"].to_numpy()
            out_cols = pdf["_pc"].to_numpy()
            # flatten (parent, children≤4) into parallel child arrays;
            # pidx is non-decreasing (row order), so parent blocks map to
            # contiguous child ranges via searchsorted
            pidx, qr, qc, bufs = [], [], [], []
            for i, kids in enumerate(pdf["_kids"]):
                for k in kids:
                    pidx.append(i)
                    qr.append(int(k["row"]) % 2)
                    qc.append(int(k["col"]) % 2)
                    bufs.append(k["bytes"])
            dims = {(len(b)) for b in bufs}
            tw = int(pdf["_kids"].iat[0][0]["tile_w"])
            th = int(pdf["_kids"].iat[0][0]["tile_h"])
            tile_bytes = th * tw * 3
            if len(dims) != 1 or next(iter(dims)) != tile_bytes or tw % 2 or th % 2:
                raise ValueError(
                    "overview_level requires uniform even tile dims (mt=1 grid)"
                )
            hw, hh = tw // 2, th // 2
            n_children = np.zeros(n, dtype=np.int32)
            np.add.at(n_children, pidx, 1)
            pidx_a = np.asarray(pidx, dtype=np.int64)
            qr_a = np.asarray(qr, dtype=np.int64)
            qc_a = np.asarray(qc, dtype=np.int64)
            # two-level chunking (the CLAUDE.md multi-worker mmap/TLB
            # discipline, r4 item #8): parent canvas blocks ≤ ~512 KB so no
            # multi-MB zeros allocation ever mmaps, child-step uint16
            # temporaries ≤ ~128 KB so sums stay cache-resident; one output
            # frame per block frees each canvas chunk as soon as its bytes
            # are materialized instead of holding batch-sized peaks
            pblock = max(1, (1 << 19) // tile_bytes)
            cstep = max(1, (1 << 17) // (tile_bytes * 2))
            for ps in range(0, n, pblock):
                pe = min(ps + pblock, n)
                cs0, ce0 = np.searchsorted(pidx_a, [ps, pe])
                canvases = np.zeros((pe - ps, 2, hh, 2, hw, 3), dtype=np.uint8)
                for s in range(int(cs0), int(ce0), cstep):
                    e = min(s + cstep, int(ce0))
                    stack = np.frombuffer(b"".join(bufs[s:e]), dtype=np.uint8).reshape(
                        e - s, hh, 2, hw, 2, 3
                    )
                    # pairwise sums fit uint16 (max 4*255); //4 == the exact
                    # integer box-filter mean
                    ds = (stack.astype(np.uint16).sum(axis=(2, 4)) // 4).astype(np.uint8)
                    canvases[pidx_a[s:e] - ps, qr_a[s:e], :, qc_a[s:e], :, :] = ds
                flat = canvases.reshape(pe - ps, tile_bytes)
                yield pd.DataFrame(
                    {
                        "row": out_rows[ps:pe],
                        "col": out_cols[ps:pe],
                        "n_children": n_children[ps:pe],
                        "tile_w": np.full(pe - ps, tw, dtype=np.int32),
                        "tile_h": np.full(pe - ps, th, dtype=np.int32),
                        "bytes": [flat[i].tobytes() for i in range(pe - ps)],
                    }
                )

    grouped = (
        tiles.select("row", "col", "tile_w", "tile_h", "bytes")
        .groupBy(F.shiftright("row", 1).alias("_pr"), F.shiftright("col", 1).alias("_pc"))
        .agg(F.collect_list(F.struct("row", "col", "tile_w", "tile_h", "bytes")).alias("_kids"))
    )
    return grouped.mapInPandas(down, schema=_OVERVIEW_SCHEMA)


def build_overviews(tiles: DataFrame, base_zoom: int, min_zoom: int) -> dict:
    """Chain ``overview_level`` from ``base_zoom`` down to ``min_zoom``;
    returns {zoom: DataFrame}.  For resumable per-zoom commits use
    ``jobs/overview_job.py`` (PyramidJob: each level reads the previously
    committed one, so a crashed build resumes mid-pyramid)."""
    if min_zoom >= base_zoom:
        raise ValueError("min_zoom must be below base_zoom")
    out = {base_zoom: tiles}
    cur = tiles
    for z in range(base_zoom - 1, min_zoom - 1, -1):
        cur = overview_level(cur)
        out[z] = cur
    return out


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
    decoders = snapshot_decoders()  # ships to executors in the closure

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
                    [decode_image(pdf["bytes"].iat[i], w, h, fmt, decoders) for i in ii]
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


def rasterize_bins(
    df: DataFrame,
    tp: PyramidConfig,
    zoom: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """The native binning core of ``rasterize_points``: one row per
    NON-EMPTY pixel bin — (row, col, py, px, n).  Pure Column math (tile
    assignment + trunc((coord - tile_origin)/pixel_size) clamped to the
    tile grid) into a two-level hash agg; the shuffle carries bins, not
    points.  Fully SQL-expressible — this is the value-oracled surface."""
    ts = int(tp.tile_size)
    if tp.metatiling != 1:
        raise ValueError("rasterize requires an mt=1 grid")
    tiled = assign.with_tile(
        df.select(F.col(lon_col).alias("_x"), F.col(lat_col).alias("_y")),
        tp, zoom, "_x", "_y", out_tile_id=None,
    )
    b = exprs.tile_bounds(tp, zoom, "row", "col")
    px_sz = exprs.pixel_x_size(tp, zoom)
    py_sz = exprs.pixel_y_size(tp, zoom)
    px = F.least(
        F.greatest(exprs.trunc_long((F.col("_x") - b["left"]) / px_sz), F.lit(0)),
        F.lit(ts - 1),
    )
    py = F.least(
        F.greatest(exprs.trunc_long((b["top"] - F.col("_y")) / py_sz), F.lit(0)),
        F.lit(ts - 1),
    )
    return (
        tiled.select("row", "col", px.alias("px"), py.alias("py"))
        .groupBy("row", "col", "py", "px")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_RASTERIZE_SCHEMA = T.StructType(
    [
        T.StructField("row", T.LongType()),
        T.StructField("col", T.LongType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("tile_w", T.IntegerType()),
        T.StructField("tile_h", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
    ]
)


def rasterize_points(
    df: DataFrame,
    tp: PyramidConfig,
    zoom: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Vector→raster rasterization: burn point density into per-tile RGB
    canvases (the inverse direction of ``raster_tile_windows``).  Each
    point lands in the pixel bin of its tile (same tile_from_xy edge rules,
    then trunc((x - tile_left)/pixel_size) clamped to the tile grid); the
    canvas is gray = min(count, 255) replicated to 3 channels so the heat
    tile chains straight into ``overview_level`` for a full density
    pyramid.  mt=1 grids (uniform tile dims), like the overview chain.

    Scale shape: the pixel binning is a NATIVE two-level aggregation —
    groupBy(tile, pixel) partial-aggregates map-side (the shuffle carries
    one row per NON-EMPTY pixel bin, not per point), then the per-tile
    canvas assembly is a bounded ``collect_list`` (≤ tile_w·tile_h bins)
    + ``mapInPandas`` scatter, the overview pattern.  No skew: a hot tile
    is at most tile_w·tile_h rows after the first agg regardless of point
    count.  The bin surface (row, col, px_row, px_col, n) is fully
    SQL-expressible — value-oracled by the ``rasterize_bins`` driver query;
    canvas bytes are pinned by the numpy-mirror pytest.
    """
    ts = int(tp.tile_size)
    bins = rasterize_bins(df, tp, zoom, lon_col, lat_col)

    def burn(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            out_bytes = []
            n_points = []
            for kids in pdf["_bins"]:
                canvas = np.zeros((ts, ts), dtype=np.uint8)
                pys = np.array([k["py"] for k in kids], dtype=np.int64)
                pxs = np.array([k["px"] for k in kids], dtype=np.int64)
                ns = np.array([k["n"] for k in kids], dtype=np.int64)
                canvas[pys, pxs] = np.minimum(ns, 255).astype(np.uint8)
                out_bytes.append(
                    np.repeat(canvas[:, :, None], 3, axis=2).tobytes()
                )
                n_points.append(int(ns.sum()))
            yield pd.DataFrame(
                {
                    "row": pdf["_r"],
                    "col": pdf["_c"],
                    "n_points": n_points,
                    "tile_w": np.full(n, ts, dtype=np.int32),
                    "tile_h": np.full(n, ts, dtype=np.int32),
                    "bytes": out_bytes,
                }
            )

    grouped = bins.groupBy(
        F.col("row").alias("_r"), F.col("col").alias("_c")
    ).agg(F.collect_list(F.struct("py", "px", "n")).alias("_bins"))
    return grouped.mapInPandas(burn, schema=_RASTERIZE_SCHEMA)


def zonal_stats(
    tiles: DataFrame,
    zones: DataFrame,
    tp: PyramidConfig,
    zoom: int,
    zone_id_col: str = "zone_id",
    left: str = "left",
    bottom: str = "bottom",
    right: str = "right",
    top: str = "top",
    band: int = 0,
    max_cover_tiles: Optional[int] = None,
) -> DataFrame:
    """Zonal statistics: per-zone pixel aggregates over a tiled raster —
    the raster-analytics counterpart of ``pip_join`` (vector zones x raster
    pyramid instead of vector points x polygons).  Each zone's bbox is
    covered onto tiles (reference ``tiles_from_bounds`` semantics), the
    pixel window of the zone inside each tile is the ``raster_tile_windows``
    affine-inverse mapping, and the stats run over band ``band`` of every
    pixel whose cell intersects the zone (window semantics — floor/ceil of
    the edge offsets, the same rule the compose path uses).

    Input ``tiles``: (row, col, tile_w, tile_h, bytes) canvases
    (``compose_tiles`` output shape; band count inferred per row from
    ``len(bytes) / (tile_w * tile_h)``).  Input ``zones``: one bbox per
    zone.  Output: one row per zone with >= 1 covered pixel —
    (zone_id, n_tiles, n_px, sum_val, min_val, max_val, mean_val).

    Scale shape: the zone-window table (zones x covering tiles, native
    Column math only) BROADCASTS into the tile join, so tile bytes are
    never shuffled — canvases stream scan -> Arrow kernel exactly once,
    and the kernel emits 5-int partials per (zone, tile) pair; the only
    corpus-wide exchange is the final groupBy on zone_id (tiny: one
    partial per covered pair, partial-agg map side).  A zone overlapping
    T tiles costs T pair rows, never a canvas copy per zone-pixel.
    ``max_cover_tiles`` guards runaway zone bboxes (two-stage cover
    explode).  mean_val = sum/count as one exact IEEE double division.
    """
    win = raster_tile_windows(
        zones.select(zone_id_col, left, bottom, right, top),
        tp,
        zoom,
        fp_left=left,
        fp_bottom=bottom,
        fp_right=right,
        fp_top=top,
        max_cover_tiles=max_cover_tiles,
    )
    win = win.filter((F.col("win_width") > 0) & (F.col("win_height") > 0)).select(
        F.col(zone_id_col).alias("_zid"),
        "row",
        "col",
        "win_col_off",
        "win_row_off",
        "win_width",
        "win_height",
    )
    joined = (
        tiles.select("row", "col", "tile_w", "tile_h", "bytes")
        .join(F.broadcast(win), ["row", "col"])
        .select(
            "_zid",
            "tile_w",
            "tile_h",
            "bytes",
            "win_col_off",
            "win_row_off",
            "win_width",
            "win_height",
        )
    )

    part_schema = T.StructType(
        [
            T.StructField("_zid", zones.schema[zone_id_col].dataType),
            T.StructField("n_px", T.LongType()),
            T.StructField("sum_val", T.LongType()),
            T.StructField("min_val", T.LongType()),
            T.StructField("max_val", T.LongType()),
        ]
    )
    band_i = int(band)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            tw = pdf["tile_w"].to_numpy()
            th = pdf["tile_h"].to_numpy()
            c0 = pdf["win_col_off"].to_numpy()
            r0 = pdf["win_row_off"].to_numpy()
            cw = pdf["win_width"].to_numpy()
            rh = pdf["win_height"].to_numpy()
            n_px = np.empty(m, dtype=np.int64)
            s = np.empty(m, dtype=np.int64)
            mn = np.empty(m, dtype=np.int64)
            mx = np.empty(m, dtype=np.int64)
            for i in range(m):
                buf = pdf["bytes"].iat[i]
                h, w = int(th[i]), int(tw[i])
                nb = len(buf) // (h * w)
                if nb * h * w != len(buf) or band_i >= nb:
                    raise ValueError(
                        f"canvas of {len(buf)} bytes is not {h}x{w}xB "
                        f"with band {band_i} present"
                    )
                v = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, nb)[
                    r0[i] : r0[i] + rh[i], c0[i] : c0[i] + cw[i], band_i
                ]
                n_px[i] = v.size
                s[i] = int(v.sum(dtype=np.int64))
                mn[i] = int(v.min())
                mx[i] = int(v.max())
            yield pd.DataFrame(
                {
                    "_zid": pdf["_zid"].values,
                    "n_px": n_px,
                    "sum_val": s,
                    "min_val": mn,
                    "max_val": mx,
                }
            )

    part = joined.mapInPandas(stats, schema=part_schema)
    return (
        part.groupBy("_zid")
        .agg(
            F.count(F.lit(1)).alias("n_tiles"),
            F.sum("n_px").alias("n_px"),
            F.sum("sum_val").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
        .select(
            F.col("_zid").alias(zone_id_col),
            "n_tiles",
            "n_px",
            "sum_val",
            "min_val",
            "max_val",
            (F.col("sum_val").cast("double") / F.col("n_px").cast("double")).alias(
                "mean_val"
            ),
        )
    )


def zonal_poly_stats(
    tiles: DataFrame,
    zones: DataFrame,
    tp: PyramidConfig,
    zoom: exprs.ZoomLike,
    zone_id_col: str = "zone_id",
    poly_x_col: str = "poly_x",
    poly_y_col: str = "poly_y",
    band: int = 0,
    max_cover_tiles: Optional[int] = None,
) -> DataFrame:
    """Zonal statistics over CONVEX POLYGON zones — the polygon×raster
    counterpart of :func:`zonal_stats` (which takes bboxes): a pixel
    belongs to the zone iff its CENTER passes every half-plane sign test
    of the CCW vertex ring, ``(x2−x1)·(cy−y1) − (y2−y1)·(cx−x1) ≥ 0``
    (boundary inclusive).  The test is a fixed IEEE double expression, so
    numpy, Spark and DuckDB produce bit-identical masks — the oracle
    needs NO tolerance even though the zones are rotated geometry.

    Input ``zones``: (zone_id, poly_x array<double>, poly_y array<double>)
    — CCW convex ring, no repeated closing vertex.  Output and scale shape
    are identical to zonal_stats: the zone bbox is derived natively from
    the ring, covers onto tiles via ``raster_tile_windows``, the
    (zone, tile, window, ring) table BROADCASTS onto the canvas scan —
    tile bytes never shuffle — and the kernel reduces each window's
    masked pixels to 5-int partials; one final groupBy on zone_id.  The
    per-window mask costs E·|window| multiply-adds (E = ring length),
    vectorized, temporaries window-sized (≤ a few KB)."""
    xs, ys = F.col(poly_x_col), F.col(poly_y_col)
    zb = zones.select(
        zone_id_col,
        poly_x_col,
        poly_y_col,
        F.array_min(xs).alias("_zl"),
        F.array_min(ys).alias("_zb"),
        F.array_max(xs).alias("_zr"),
        F.array_max(ys).alias("_zt"),
    )
    win = raster_tile_windows(
        zb,
        tp,
        zoom,
        fp_left="_zl",
        fp_bottom="_zb",
        fp_right="_zr",
        fp_top="_zt",
        max_cover_tiles=max_cover_tiles,
    )
    zoom_i = int(zoom)
    pxs = float(tp.pixel_x_size(zoom_i))
    pys = float(tp.pixel_y_size(zoom_i))
    tsx = float(tp.tile_x_size(zoom_i))
    tsy = float(tp.tile_y_size(zoom_i))
    win = win.filter((F.col("win_width") > 0) & (F.col("win_height") > 0)).select(
        F.col(zone_id_col).alias("_zid"),
        F.col(poly_x_col).alias("_px_ring"),
        F.col(poly_y_col).alias("_py_ring"),
        "row",
        "col",
        "win_col_off",
        "win_row_off",
        "win_width",
        "win_height",
        (F.lit(float(tp.left)) + F.col("col") * F.lit(tsx)).alias("_tleft"),
        (F.lit(float(tp.top)) - F.col("row") * F.lit(tsy)).alias("_ttop"),
    )
    joined = (
        tiles.select("row", "col", "tile_w", "tile_h", "bytes")
        .join(F.broadcast(win), ["row", "col"])
        .select(
            "_zid",
            "_px_ring",
            "_py_ring",
            "_tleft",
            "_ttop",
            "tile_w",
            "tile_h",
            "bytes",
            "win_col_off",
            "win_row_off",
            "win_width",
            "win_height",
        )
    )
    part_schema = T.StructType(
        [
            T.StructField("_zid", zones.schema[zone_id_col].dataType),
            T.StructField("n_px", T.LongType()),
            T.StructField("sum_val", T.LongType()),
            T.StructField("min_val", T.LongType()),
            T.StructField("max_val", T.LongType()),
        ]
    )
    band_i = int(band)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            keep, n_px, s, mn, mx = [], [], [], [], []
            for i in range(m):
                buf = pdf["bytes"].iat[i]
                h, w = int(pdf["tile_h"].iat[i]), int(pdf["tile_w"].iat[i])
                nb = len(buf) // (h * w)
                if nb * h * w != len(buf) or band_i >= nb:
                    raise ValueError(
                        f"canvas of {len(buf)} bytes is not {h}x{w}xB "
                        f"with band {band_i} present"
                    )
                r0 = int(pdf["win_row_off"].iat[i])
                c0 = int(pdf["win_col_off"].iat[i])
                rh = int(pdf["win_height"].iat[i])
                cw = int(pdf["win_width"].iat[i])
                v = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, nb)[
                    r0 : r0 + rh, c0 : c0 + cw, band_i
                ]
                # pixel centers in world coords — the EXACT expression the
                # oracle mirrors: t_left + (pj + 0.5)*px, t_top - (pi + 0.5)*py
                cx = pdf["_tleft"].iat[i] + (
                    c0 + np.arange(cw, dtype=np.float64) + 0.5
                ) * pxs
                cy = pdf["_ttop"].iat[i] - (
                    r0 + np.arange(rh, dtype=np.float64) + 0.5
                ) * pys
                rx = np.asarray(pdf["_px_ring"].iat[i], dtype=np.float64)
                ry = np.asarray(pdf["_py_ring"].iat[i], dtype=np.float64)
                mask = np.ones((rh, cw), dtype=bool)
                for e in range(len(rx)):
                    x1, y1 = rx[e], ry[e]
                    x2, y2 = rx[(e + 1) % len(rx)], ry[(e + 1) % len(ry)]
                    mask &= (x2 - x1) * (cy[:, None] - y1) - (y2 - y1) * (
                        cx[None, :] - x1
                    ) >= 0.0
                vals = v[mask]
                if not len(vals):
                    continue
                keep.append(i)
                n_px.append(len(vals))
                s.append(int(vals.sum(dtype=np.int64)))
                mn.append(int(vals.min()))
                mx.append(int(vals.max()))
            if keep:
                yield pd.DataFrame(
                    {
                        "_zid": pdf["_zid"].iloc[keep].values,
                        "n_px": np.asarray(n_px, np.int64),
                        "sum_val": np.asarray(s, np.int64),
                        "min_val": np.asarray(mn, np.int64),
                        "max_val": np.asarray(mx, np.int64),
                    }
                )

    part = joined.mapInPandas(stats, schema=part_schema)
    return (
        part.groupBy("_zid")
        .agg(
            F.count(F.lit(1)).alias("n_tiles"),
            F.sum("n_px").alias("n_px"),
            F.sum("sum_val").alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
        .select(
            F.col("_zid").alias(zone_id_col),
            "n_tiles",
            "n_px",
            "sum_val",
            "min_val",
            "max_val",
            (
                F.col("sum_val").cast("double") / F.col("n_px").cast("double")
            ).alias("mean_val"),
        )
    )


def zonal_class_counts(
    tiles: DataFrame,
    zones: DataFrame,
    tp: PyramidConfig,
    zoom: exprs.ZoomLike,
    zone_id_col: str = "zone_id",
    left: str = "left",
    bottom: str = "bottom",
    right: str = "right",
    top: str = "top",
    band: int = 0,
    max_cover_tiles: Optional[int] = None,
) -> DataFrame:
    """Zonal CLASS histogram: per-zone pixel counts per category value —
    the categorical companion of :func:`zonal_stats` (land-cover
    composition inside each zone: how many pixels of each class code).
    Window semantics, inputs, and the scale shape are identical to
    zonal_stats — zone windows BROADCAST onto the canvas scan, bytes never
    shuffle — but the kernel reduces each (zone, tile) window to its
    SPARSE bincount (≤256 rows per pair, usually far fewer) instead of
    5-int moments, and the final exchange groups on (zone, class).

    Output: (zone_id, class, n_px) — one row per class present in the
    zone; all integers, so the cross-engine oracle is hash-exact."""
    win = raster_tile_windows(
        zones.select(zone_id_col, left, bottom, right, top),
        tp,
        zoom,
        fp_left=left,
        fp_bottom=bottom,
        fp_right=right,
        fp_top=top,
        max_cover_tiles=max_cover_tiles,
    )
    win = win.filter((F.col("win_width") > 0) & (F.col("win_height") > 0)).select(
        F.col(zone_id_col).alias("_zid"),
        "row",
        "col",
        "win_col_off",
        "win_row_off",
        "win_width",
        "win_height",
    )
    joined = (
        tiles.select("row", "col", "tile_w", "tile_h", "bytes")
        .join(F.broadcast(win), ["row", "col"])
        .select(
            "_zid",
            "tile_w",
            "tile_h",
            "bytes",
            "win_col_off",
            "win_row_off",
            "win_width",
            "win_height",
        )
    )
    part_schema = T.StructType(
        [
            T.StructField("_zid", zones.schema[zone_id_col].dataType),
            T.StructField("class", T.IntegerType()),
            T.StructField("n_px", T.LongType()),
        ]
    )
    band_i = int(band)

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            zids, clss, cnts = [], [], []
            tw = pdf["tile_w"].to_numpy()
            th = pdf["tile_h"].to_numpy()
            c0 = pdf["win_col_off"].to_numpy()
            r0 = pdf["win_row_off"].to_numpy()
            cw = pdf["win_width"].to_numpy()
            rh = pdf["win_height"].to_numpy()
            for i in range(m):
                buf = pdf["bytes"].iat[i]
                h, w = int(th[i]), int(tw[i])
                nb = len(buf) // (h * w)
                if nb * h * w != len(buf) or band_i >= nb:
                    raise ValueError(
                        f"canvas of {len(buf)} bytes is not {h}x{w}xB "
                        f"with band {band_i} present"
                    )
                v = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, nb)[
                    r0[i] : r0[i] + rh[i], c0[i] : c0[i] + cw[i], band_i
                ]
                bc = np.bincount(v.ravel(), minlength=256)
                nz = np.nonzero(bc)[0]
                zids.append(np.full(len(nz), pdf["_zid"].iat[i]))
                clss.append(nz.astype(np.int32))
                cnts.append(bc[nz].astype(np.int64))
            if zids:
                yield pd.DataFrame(
                    {
                        "_zid": np.concatenate(zids),
                        "class": np.concatenate(clss),
                        "n_px": np.concatenate(cnts),
                    }
                )

    part = joined.mapInPandas(hist, schema=part_schema)
    return (
        part.groupBy("_zid", "class")
        .agg(F.sum("n_px").alias("n_px"))
        .select(F.col("_zid").alias(zone_id_col), "class", "n_px")
    )


def zonal_majority(
    tiles: DataFrame,
    zones: DataFrame,
    tp: PyramidConfig,
    zoom: exprs.ZoomLike,
    zone_id_col: str = "zone_id",
    **kwargs,
) -> DataFrame:
    """Majority (mode) class per zone — the classic categorical zonal
    product (dominant land-cover class), a pure composition over
    :func:`zonal_class_counts`: one window per zone picks the class with
    the highest pixel count, ties broken by the SMALLEST class code
    (deterministic, engine-portable).  Output: (zone_id, majority_class,
    n_px, n_zone_px, frac) with ``frac`` the single exact IEEE division
    n_px/n_zone_px.  Adds one zone-keyed window + groupBy over the
    (zone, class) table — ≤256 rows per zone, never pixel-sized."""
    from pyspark.sql import Window

    cc = zonal_class_counts(tiles, zones, tp, zoom, zone_id_col, **kwargs)
    w = Window.partitionBy(zone_id_col).orderBy(
        F.col("n_px").desc(), F.col("class").asc()
    )
    tot = Window.partitionBy(zone_id_col)
    return (
        cc.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_zone_px", F.sum("n_px").over(tot))
        .filter(F.col("_rn") == 1)
        .select(
            zone_id_col,
            F.col("class").alias("majority_class"),
            "n_px",
            "n_zone_px",
            (F.col("n_px").cast("double") / F.col("n_zone_px").cast("double"))
            .alias("frac"),
        )
    )


_FOCAL_CANVAS_SCHEMA = T.StructType(
    [
        T.StructField("row", T.LongType()),
        T.StructField("col", T.LongType()),
        T.StructField("tile_w", T.IntegerType()),
        T.StructField("tile_h", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
    ]
)

_FOCAL_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("row", T.LongType()),
        T.StructField("col", T.LongType()),
        T.StructField("py", T.IntegerType()),
        T.StructField("px", T.IntegerType()),
        T.StructField("n_nbr", T.LongType()),
        T.StructField("sum_nbr", T.LongType()),
        T.StructField("min_nbr", T.IntegerType()),
        T.StructField("max_nbr", T.IntegerType()),
        T.StructField("mean_nbr", T.LongType()),
    ]
)


def _halo_grouped(
    tiles: DataFrame, ts: int, r: int, band_i: int, mw: int, mh: int, op: str
) -> DataFrame:
    """Shared halo-exchange front half of the stencil operators: each tile
    emits its band plane plus 8 border strips of width ``r`` addressed to
    its grid neighbors (column wrap, row clamp — reference ``_tile.py:
    256-263``), then ONE groupBy(row, col) collects the <= 9 bounded parts
    per output tile.  ``focal_stats`` and ``focal_gradient`` share this
    exchange and differ only in the assemble kernel."""
    part_schema = T.StructType(
        [
            T.StructField("row", T.LongType()),
            T.StructField("col", T.LongType()),
            T.StructField("sy", T.IntegerType()),
            T.StructField("sx", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("b", T.BinaryType()),
        ]
    )

    def strips(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dirs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1) if dy or dx]
        for pdf in batches:
            if not len(pdf):
                continue
            o_row, o_col, o_sy, o_sx, o_h, o_w, o_b = [], [], [], [], [], [], []
            tw = pdf["tile_w"].to_numpy()
            th = pdf["tile_h"].to_numpy()
            rows = pdf["row"].to_numpy()
            cols = pdf["col"].to_numpy()
            for i in range(len(pdf)):
                buf = pdf["bytes"].iat[i]
                h, w = int(th[i]), int(tw[i])
                if h != ts or w != ts:
                    raise ValueError(
                        f"{op} expects uniform {ts}x{ts} tiles, got {h}x{w}"
                    )
                nb = len(buf) // (h * w)
                if nb * h * w != len(buf) or band_i >= nb:
                    raise ValueError(
                        f"canvas of {len(buf)} bytes is not {h}x{w}xB "
                        f"with band {band_i} present"
                    )
                a = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, nb)[
                    :, :, band_i
                ]
                tr, tc = int(rows[i]), int(cols[i])
                o_row.append(tr)
                o_col.append(tc)
                o_sy.append(0)
                o_sx.append(0)
                o_h.append(ts)
                o_w.append(ts)
                o_b.append(np.ascontiguousarray(a).tobytes())
                for dy, dx in dirs:
                    dr = tr + dy
                    if dr < 0 or dr >= mh:
                        continue
                    dc = (tc + dx) % mw
                    rs = slice(ts - r, ts) if dy == 1 else (
                        slice(0, r) if dy == -1 else slice(0, ts)
                    )
                    cs = slice(ts - r, ts) if dx == 1 else (
                        slice(0, r) if dx == -1 else slice(0, ts)
                    )
                    slab = np.ascontiguousarray(a[rs, cs])
                    o_row.append(dr)
                    o_col.append(dc)
                    o_sy.append(-dy)
                    o_sx.append(-dx)
                    o_h.append(slab.shape[0])
                    o_w.append(slab.shape[1])
                    o_b.append(slab.tobytes())
            yield pd.DataFrame(
                {
                    "row": np.asarray(o_row, dtype=np.int64),
                    "col": np.asarray(o_col, dtype=np.int64),
                    "sy": np.asarray(o_sy, dtype=np.int32),
                    "sx": np.asarray(o_sx, dtype=np.int32),
                    "h": np.asarray(o_h, dtype=np.int32),
                    "w": np.asarray(o_w, dtype=np.int32),
                    "b": o_b,
                }
            )

    parts = tiles.select("row", "col", "tile_w", "tile_h", "bytes").mapInPandas(
        strips, schema=part_schema
    )
    return parts.groupBy("row", "col").agg(
        F.collect_list(F.struct("sy", "sx", "h", "w", "b")).alias("_parts")
    )


def _halo_planes(pdf: pd.DataFrame, ts: int, r: int):
    """Yield (tile_row, tile_col, P, M) per assembled group: the (ts+2r)^2
    padded value plane and its availability mask.  Halo-only ghost groups
    (dest tile not materialized — no center part) are skipped."""
    n = ts + 2 * r
    for gi in range(len(pdf)):
        kids = pdf["_parts"].iat[gi]
        if not any(k["sy"] == 0 and k["sx"] == 0 for k in kids):
            continue
        P = np.zeros((n, n), dtype=np.uint8)
        M = np.zeros((n, n), dtype=np.uint8)
        for k in kids:
            h, w = int(k["h"]), int(k["w"])
            sy, sx = int(k["sy"]), int(k["sx"])
            y0 = 0 if sy == -1 else (r if sy == 0 else r + ts)
            x0 = 0 if sx == -1 else (r if sx == 0 else r + ts)
            slab = np.frombuffer(k["b"], dtype=np.uint8).reshape(h, w)
            P[y0 : y0 + h, x0 : x0 + w] = slab
            M[y0 : y0 + h, x0 : x0 + w] = 1
        yield int(pdf["row"].iat[gi]), int(pdf["col"].iat[gi]), P, M


def focal_stats(
    tiles: DataFrame,
    tp: PyramidConfig,
    zoom: int,
    radius: int = 1,
    band: int = 0,
    emit: str = "canvas",
    sample_mod: int = 1,
    sample_off: int = 0,
) -> DataFrame:
    """Focal (moving-window) statistics over a tiled raster with cross-tile
    HALO EXCHANGE — the distributed stencil primitive.  Each output pixel
    aggregates the ``(2*radius+1)**2`` neighborhood around it, and
    neighborhoods crossing tile boundaries see the true pixels of the
    adjacent tiles, not an edge clamp.  Neighbor addressing follows the
    reference's tile topology (``_tile.py:256-263``): columns wrap by one
    matrix width (antimeridian), rows clamp at the matrix edge.  Pixels
    whose window extends past the edge of the MATERIALIZED raster (grid
    edge, or a tile simply absent from ``tiles``) aggregate over the
    available pixels only — ``n_nbr`` carries the actual window population
    (GDAL focal-NODATA semantics), so partial-window stats stay exact.

    Input ``tiles``: (row, col, tile_w, tile_h, bytes) canvases, mt=1
    uniform dims (``compose_tiles`` / ``overview_level`` shape; band count
    inferred per row).  ``emit='canvas'`` returns one single-band canvas
    per input tile whose pixels are the TRUNCATED focal mean
    (``sum_nbr // n_nbr`` — exact integer division, fits uint8 by
    construction); ``emit='pixels'`` returns one row per sampled pixel
    (linear index ``py*ts+px % sample_mod == sample_off``) carrying
    n/sum/min/max/mean — the fully SQL-oracle-able surface the driver
    gate uses.

    Scale shape: tile canvases are NEVER shipped to neighbors — each tile
    ships only its ``radius``-wide border strips (8 messages of
    ``O(radius*ts)`` bytes; for radius=2, ts=256 the halo traffic is ~3%
    of the band bytes), so the single exchange this operator performs
    carries one band-extracted canvas + 8 thin strips per tile.  The
    assemble side is a BOUNDED ``collect_list`` (<= 9 structs, ~ts^2+
    4*radius*ts bytes) + ``mapInPandas`` — the overview-chain pattern,
    thousands of groups per Arrow batch, no per-group pandas frame tax.
    Window sums/counts are an O(ts^2) summed-area table (exact int64, no
    per-pixel Python); min/max ride numpy sliding windows over uint8.
    On a bucketed tile store (bucketBy(row, col)) the center canvas leg
    of the exchange co-locates and only the strips move.
    """
    if emit not in ("canvas", "pixels"):
        raise ValueError("emit must be 'canvas' or 'pixels'")
    ts = int(tp.tile_size) * int(tp.metatiling)
    r = int(radius)
    if not 0 < r < ts:
        raise ValueError(f"radius must be in [1, {ts - 1}]")
    mw = tp.matrix_width(zoom)
    mh = tp.matrix_height(zoom)
    band_i = int(band)
    mod = int(sample_mod)
    off = int(sample_off)
    if emit == "pixels" and not 0 <= off < mod:
        raise ValueError("sample_off must be in [0, sample_mod)")

    grouped = _halo_grouped(tiles, ts, r, band_i, mw, mh, "focal_stats")

    n = ts + 2 * r
    win = 2 * r + 1
    out_schema = _FOCAL_CANVAS_SCHEMA if emit == "canvas" else _FOCAL_PIXEL_SCHEMA

    def win_extreme(plane: np.ndarray, op) -> np.ndarray:
        # separable sliding min/max: reduce rows then columns — 2*(2r+1)
        # full-SIMD uint8 slice ops vs (2r+1)^2 strided reads per output
        # element for sliding_window_view.amin (measured ~2.8 ms/tile there,
        # the whole per-tile budget)
        rows = plane[0 : 0 + ts + 2 * r, :]  # (n, n)
        acc = plane[0:ts, :].copy()
        for dy in range(1, win):
            op(acc, rows[dy : dy + ts, :], out=acc)
        out = acc[:, 0:ts].copy()
        for dx in range(1, win):
            op(out, acc[:, dx : dx + ts], out=out)
        return out

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if emit == "pixels":
            lin = np.arange(off, ts * ts, mod, dtype=np.int64)
            pys = (lin // ts).astype(np.int32)
            pxs = (lin % ts).astype(np.int32)
        for pdf in batches:
            if not len(pdf):
                continue
            recs = []
            for trow, tcol, P, M in _halo_planes(pdf, ts, r):
                # summed-area tables: exact int64 window sums / counts
                V = (P.astype(np.int64) * M).cumsum(0).cumsum(1)
                C = M.astype(np.int64).cumsum(0).cumsum(1)
                Vp = np.zeros((n + 1, n + 1), dtype=np.int64)
                Cp = np.zeros((n + 1, n + 1), dtype=np.int64)
                Vp[1:, 1:] = V
                Cp[1:, 1:] = C

                def box(S):
                    return (
                        S[win:, win:]
                        - S[:-win, win:]
                        - S[win:, :-win]
                        + S[:-win, :-win]
                    )

                sums = box(Vp[: n + 1, : n + 1])
                cnts = box(Cp[: n + 1, : n + 1])
                Pmin = np.where(M, P, np.uint8(255))
                Pmax = np.where(M, P, np.uint8(0))
                mins = win_extreme(Pmin, np.minimum)
                maxs = win_extreme(Pmax, np.maximum)
                means = sums // cnts  # cnts >= 1: center pixel always present
                recs.append((trow, tcol, sums, cnts, mins, maxs, means))
            if not recs:
                continue
            if emit == "canvas":
                yield pd.DataFrame(
                    {
                        "row": [t[0] for t in recs],
                        "col": [t[1] for t in recs],
                        "tile_w": np.full(len(recs), ts, dtype=np.int32),
                        "tile_h": np.full(len(recs), ts, dtype=np.int32),
                        "bytes": [t[6].astype(np.uint8).tobytes() for t in recs],
                    }
                )
            else:
                frames = []
                for trow, tcol, sums, cnts, mins, maxs, means in recs:
                    frames.append(
                        pd.DataFrame(
                            {
                                "row": np.full(len(lin), trow, dtype=np.int64),
                                "col": np.full(len(lin), tcol, dtype=np.int64),
                                "py": pys,
                                "px": pxs,
                                "n_nbr": cnts.ravel()[lin],
                                "sum_nbr": sums.ravel()[lin],
                                "min_nbr": mins.ravel()[lin].astype(np.int32),
                                "max_nbr": maxs.ravel()[lin].astype(np.int32),
                                "mean_nbr": means.ravel()[lin],
                            }
                        )
                    )
                yield pd.concat(frames, ignore_index=True)

    return grouped.mapInPandas(assemble, schema=out_schema)

_DIFF_STATS_SCHEMA = T.StructType(
    [
        T.StructField("row", T.LongType()),
        T.StructField("col", T.LongType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("n_diff", T.LongType()),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("max_abs", T.IntegerType()),
    ]
)


def diff_tiles(
    tiles_a: DataFrame, tiles_b: DataFrame, band: int | None = 0
) -> DataFrame:
    """Temporal change detection between two epochs of a tiled raster:
    inner-join the epochs on the tile key and reduce each canvas pair to
    per-tile change statistics (pixel count, changed-pixel count, sum and
    max of |delta|) — the planning surface a re-survey / re-compose
    pipeline filters on before it moves any imagery.

    Scale shape: ONE equi-join on (row, col) is the only data movement —
    on a store bucketed by (row, col) both sides co-locate and no canvas
    byte shuffles at all; the delta kernel is a vectorized uint8->int16
    subtract per pair inside ``mapInPandas`` (no per-group pandas frame:
    whole Arrow batches of joined pairs reduce in one pass).  Mean |delta|
    = sum_abs / n_px downstream — kept as exact integers here so the
    output is engine-exact.

    ``band=None`` compares ENTIRE canvases (every band, n_px counts
    pixel-bands) — the shape the pyramid-consistency audit uses
    (``diff_tiles(parents, overview_level(children), band=None)``:
    n_diff == 0 exactly for parents that equal the box filter of their
    children)."""
    band_i = None if band is None else int(band)

    def extract(colname):
        def get(pdf, k):
            buf = pdf[colname].iat[k]
            h = int(pdf["tile_h"].iat[k])
            w = int(pdf["tile_w"].iat[k])
            nb = len(buf) // (h * w)
            if nb * h * w != len(buf) or (band_i is not None and band_i >= nb):
                raise ValueError(
                    f"canvas of {len(buf)} bytes is not {h}x{w}xB "
                    f"with band {band_i} present"
                )
            a = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, nb)
            return a if band_i is None else a[:, :, band_i]

        return get

    get_a = extract("_ba")
    get_b = extract("_bb")

    def delta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            n = len(pdf)
            n_px = np.empty(n, dtype=np.int64)
            n_diff = np.empty(n, dtype=np.int64)
            sum_abs = np.empty(n, dtype=np.int64)
            max_abs = np.empty(n, dtype=np.int32)
            for k in range(n):
                a = get_a(pdf, k).astype(np.int16)
                b = get_b(pdf, k).astype(np.int16)
                if a.shape != b.shape:
                    raise ValueError(
                        f"epoch canvases disagree on shape: {a.shape} vs "
                        f"{b.shape}"
                    )
                d = np.abs(a - b)
                n_px[k] = d.size
                n_diff[k] = int(np.count_nonzero(d))
                sum_abs[k] = int(d.sum(dtype=np.int64))
                max_abs[k] = int(d.max()) if d.size else 0
            yield pd.DataFrame(
                {
                    "row": pdf["row"].to_numpy(),
                    "col": pdf["col"].to_numpy(),
                    "n_px": n_px,
                    "n_diff": n_diff,
                    "sum_abs": sum_abs,
                    "max_abs": max_abs,
                }
            )

    a = tiles_a.select(
        "row", "col", "tile_w", "tile_h", F.col("bytes").alias("_ba")
    )
    b = tiles_b.select(
        F.col("row").alias("_rb"),
        F.col("col").alias("_cb"),
        F.col("bytes").alias("_bb"),
    )
    joined = a.join(
        b, (a["row"] == b["_rb"]) & (a["col"] == b["_cb"]), "inner"
    ).select("row", "col", "tile_w", "tile_h", "_ba", "_bb")
    return joined.mapInPandas(delta, schema=_DIFF_STATS_SCHEMA)


def global_histogram(tiles: DataFrame, band: int = 0) -> DataFrame:
    """Global 256-bin value histogram over one band of a tiled raster —
    pass 1 of the classic two-pass contrast stretch.  Map-side combine is
    explicit: every Arrow batch reduces ALL its tiles into one 256-long
    numpy bincount and emits at most 256 tiny rows, so the only shuffle
    this op performs moves O(256 x n_partitions) rows no matter how many
    petabytes of canvas bytes were scanned.  Returns (val, n_px) for the
    values present.  Band layout and uniformity checks mirror
    ``_halo_grouped`` (per-row inferred band count)."""
    band_i = int(band)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros(256, dtype=np.int64)
        seen = False
        for pdf in batches:
            for k in range(len(pdf)):
                buf = pdf["bytes"].iat[k]
                h = int(pdf["tile_h"].iat[k])
                w = int(pdf["tile_w"].iat[k])
                nb = len(buf) // (h * w)
                if nb * h * w != len(buf) or band_i >= nb:
                    raise ValueError(
                        f"canvas of {len(buf)} bytes is not {h}x{w}xB "
                        f"with band {band_i} present"
                    )
                a = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, nb)[
                    :, :, band_i
                ]
                acc += np.bincount(a.ravel(), minlength=256)
                seen = True
        if seen:
            vals = np.nonzero(acc)[0]
            yield pd.DataFrame(
                {"val": vals.astype(np.int32), "n": acc[vals]}
            )

    part = tiles.select("tile_w", "tile_h", "bytes").mapInPandas(
        partials, "val int, n long"
    )
    return part.groupBy("val").agg(F.sum("n").alias("n_px"))


def stretch_percentiles(
    tiles: DataFrame, band: int = 0, lo_pct: int = 2, hi_pct: int = 98
) -> tuple:
    """Integer-exact percentile cut points from the global histogram:
    ``p_q`` = the smallest value whose cumulative pixel count reaches
    ``ceil(q * total / 100)`` — pure integer arithmetic, so any engine
    derives the identical cut.  Collects the <= 256-row histogram to the
    driver (bounded, the documented driver-quantizer pattern)."""
    rows = sorted(
        (r["val"], r["n_px"]) for r in global_histogram(tiles, band).collect()
    )
    total = sum(n for _, n in rows)
    if total == 0:
        raise ValueError("stretch_percentiles: empty raster")
    out = []
    for q in (int(lo_pct), int(hi_pct)):
        need = -((-q * total) // 100)  # ceil(q*total/100), exact ints
        cum = 0
        pick = rows[-1][0]
        for v, n in rows:
            cum += n
            if cum >= need:
                pick = v
                break
        out.append(int(pick))
    return out[0], out[1]


_STRETCH_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("row", T.LongType()),
        T.StructField("col", T.LongType()),
        T.StructField("py", T.IntegerType()),
        T.StructField("px", T.IntegerType()),
        T.StructField("v_in", T.IntegerType()),
        T.StructField("v_out", T.IntegerType()),
    ]
)


def contrast_stretch(
    tiles: DataFrame,
    band: int = 0,
    lo_pct: int = 2,
    hi_pct: int = 98,
    emit: str = "canvas",
    sample_mod: int = 1,
    sample_off: int = 0,
) -> DataFrame:
    """Two-pass global percentile contrast stretch — the standard display /
    normalization op for satellite and microscopy rasters.  Pass 1
    aggregates the global histogram (one O(256)-row shuffle, see
    ``global_histogram``); the integer cut points ``p_lo``/``p_hi`` then
    ride into the pass-2 remap kernel as plain Python ints (two scalars
    broadcast in the task closure — canvas bytes are read twice but never
    shuffled at all).  Remap is integer-exact in any engine:

        v_out = clamp(((v - p_lo) * 255) // (p_hi - p_lo), 0, 255)

    (truncating floor division; degenerate ``p_hi == p_lo`` maps to 0/255
    by threshold).  ``emit='canvas'`` rewrites the band as a uint8 canvas
    per tile; ``emit='pixels'`` returns the sampled (v_in, v_out) integer
    surface the driver oracle re-derives — histogram, cut points, and
    remap all in exact integer SQL."""
    if emit not in ("canvas", "pixels"):
        raise ValueError("emit must be 'canvas' or 'pixels'")
    mod = int(sample_mod)
    off = int(sample_off)
    if emit == "pixels" and not 0 <= off < mod:
        raise ValueError("sample_off must be in [0, sample_mod)")
    band_i = int(band)
    p_lo, p_hi = stretch_percentiles(tiles, band_i, lo_pct, hi_pct)
    span = p_hi - p_lo
    lut = np.arange(256, dtype=np.int64)
    if span > 0:
        lut = np.clip((lut - p_lo) * 255 // span, 0, 255)
    else:
        lut = np.where(lut >= p_hi, 255, 0).astype(np.int64)
    lut8 = lut.astype(np.uint8)

    out_schema = _FOCAL_CANVAS_SCHEMA if emit == "canvas" else _STRETCH_PIXEL_SCHEMA

    def remap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if emit == "canvas":
                bufs = []
                for k in range(len(pdf)):
                    buf = pdf["bytes"].iat[k]
                    h = int(pdf["tile_h"].iat[k])
                    w = int(pdf["tile_w"].iat[k])
                    nb = len(buf) // (h * w)
                    a = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, nb)[
                        :, :, band_i
                    ]
                    bufs.append(lut8[a].tobytes())
                yield pd.DataFrame(
                    {
                        "row": pdf["row"].to_numpy(),
                        "col": pdf["col"].to_numpy(),
                        "tile_w": pdf["tile_w"].to_numpy().astype(np.int32),
                        "tile_h": pdf["tile_h"].to_numpy().astype(np.int32),
                        "bytes": bufs,
                    }
                )
            else:
                frames = []
                for k in range(len(pdf)):
                    buf = pdf["bytes"].iat[k]
                    h = int(pdf["tile_h"].iat[k])
                    w = int(pdf["tile_w"].iat[k])
                    nb = len(buf) // (h * w)
                    a = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, nb)[
                        :, :, band_i
                    ]
                    lin = np.arange(off, h * w, mod, dtype=np.int64)
                    vin = a.ravel()[lin]
                    frames.append(
                        pd.DataFrame(
                            {
                                "row": np.full(
                                    len(lin),
                                    int(pdf["row"].iat[k]),
                                    dtype=np.int64,
                                ),
                                "col": np.full(
                                    len(lin),
                                    int(pdf["col"].iat[k]),
                                    dtype=np.int64,
                                ),
                                "py": (lin // w).astype(np.int32),
                                "px": (lin % w).astype(np.int32),
                                "v_in": vin.astype(np.int32),
                                "v_out": lut[vin].astype(np.int32),
                            }
                        )
                    )
                if frames:
                    yield pd.concat(frames, ignore_index=True)

    return tiles.select("row", "col", "tile_w", "tile_h", "bytes").mapInPandas(
        remap, schema=out_schema
    )


_UPSAMPLE_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("row", T.LongType()),
        T.StructField("col", T.LongType()),
        T.StructField("py", T.IntegerType()),
        T.StructField("px", T.IntegerType()),
        T.StructField("num", T.LongType()),
        T.StructField("val", T.IntegerType()),
    ]
)


def upsample_children(
    tiles: DataFrame,
    tp: PyramidConfig,
    zoom: int,
    band: int = 0,
    emit: str = "canvas",
    sample_mod: int = 1,
    sample_off: int = 0,
) -> DataFrame:
    """Overzoom: serve zoom+1 tiles from a zoom-level raster by 2x bilinear
    upsampling — the inverse of ``overview_level`` and the op a tile server
    runs when a client asks for a zoom the pyramid doesn't materialize
    (reference tile topology: child (2*row+dy, 2*col+dx), ``_tile.py``
    get_children).  Each parent tile emits its FOUR children at zoom+1.

    Half-pixel-center bilinear at exactly 2x degenerates to fixed 1/4-3/4
    weights, so the whole kernel is integer: child pixel (i, j) reads the
    2x2 parent window around (i/2 - 0.25, j/2 - 0.25) with per-axis weights
    (1, 3) for even i and (3, 1) for odd i, ``num`` = the 16x numerator
    (<= 16*255, exact int), value = (num + 8) // 16 (round-half-up).  That
    integer form is what makes the DuckDB value oracle possible.

    Child pixels on a parent-tile border read one pixel of the adjacent
    parent tile, so this shares ``focal_stats``'s cross-tile HALO EXCHANGE
    (radius=1: band plane + 8 one-pixel strips per tile, column wrap / row
    clamp addressing).  Where the window crosses the edge of the
    MATERIALIZED raster the missing parent pixel is edge-REPLICATED, applied
    separably (rows clamp first, then columns) so it equals per-axis
    coordinate clamping in global pixel space — the rule the oracle mirrors.

    Scale shape: one exchange of O(ts) strip bytes per tile; the 4x row
    fan-out happens INSIDE the Arrow kernel (numpy separable upsample, two
    full-SIMD passes), never as a Spark-side explode of canvas bytes.  On a
    bucketed tile store only the strips move; serving z+k chains k of these
    with no intermediate pyramid storage.  ``emit='pixels'`` returns the
    sampled integer surface (child tile coords, py/px, num, val) for the
    driver gate; ``emit='canvas'`` returns the four uint8 child canvases.
    """
    if emit not in ("canvas", "pixels"):
        raise ValueError("emit must be 'canvas' or 'pixels'")
    ts = int(tp.tile_size) * int(tp.metatiling)
    mw = tp.matrix_width(zoom)
    mh = tp.matrix_height(zoom)
    mod = int(sample_mod)
    off = int(sample_off)
    if emit == "pixels" and not 0 <= off < mod:
        raise ValueError("sample_off must be in [0, sample_mod)")

    grouped = _halo_grouped(tiles, ts, 1, int(band), mw, mh, "upsample_children")
    out_schema = (
        _FOCAL_CANVAS_SCHEMA if emit == "canvas" else _UPSAMPLE_PIXEL_SCHEMA
    )

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if emit == "pixels":
            lin = np.arange(off, ts * ts, mod, dtype=np.int64)
            pys = (lin // ts).astype(np.int32)
            pxs = (lin % ts).astype(np.int32)
        n = ts + 2
        for pdf in batches:
            if not len(pdf):
                continue
            o_row, o_col, o_payload = [], [], []
            frames = []
            for trow, tcol, P, M in _halo_planes(pdf, ts, 1):
                # separable edge-replicate of missing halo pixels: rows
                # first (validity propagates from the pixel below/above),
                # then columns — equals per-axis clamp in global coords
                Q = P.astype(np.int32)
                MA = M.copy()
                topm = M[0] == 0
                Q[0] = np.where(topm, Q[1], Q[0])
                MA[0] = np.where(topm, M[1], 1)
                botm = M[-1] == 0
                Q[-1] = np.where(botm, Q[-2], Q[-1])
                MA[-1] = np.where(botm, M[-2], 1)
                Q[:, 0] = np.where(MA[:, 0] == 0, Q[:, 1], Q[:, 0])
                Q[:, -1] = np.where(MA[:, -1] == 0, Q[:, -2], Q[:, -1])
                # separable 2x bilinear: rows then columns, weights (1, 3)
                R = np.empty((2 * ts, n), dtype=np.int32)
                R[0::2] = Q[0:ts] + 3 * Q[1 : ts + 1]
                R[1::2] = 3 * Q[1 : ts + 1] + Q[2 : ts + 2]
                O = np.empty((2 * ts, 2 * ts), dtype=np.int32)
                O[:, 0::2] = R[:, 0:ts] + 3 * R[:, 1 : ts + 1]
                O[:, 1::2] = 3 * R[:, 1 : ts + 1] + R[:, 2 : ts + 2]
                V = ((O + 8) >> 4).astype(np.uint8)
                for dy in (0, 1):
                    for dx in (0, 1):
                        crow = 2 * trow + dy
                        ccol = 2 * tcol + dx
                        if emit == "canvas":
                            o_row.append(crow)
                            o_col.append(ccol)
                            o_payload.append(
                                np.ascontiguousarray(
                                    V[dy * ts : (dy + 1) * ts,
                                      dx * ts : (dx + 1) * ts]
                                ).tobytes()
                            )
                        else:
                            nums = np.ascontiguousarray(
                                O[dy * ts : (dy + 1) * ts,
                                  dx * ts : (dx + 1) * ts]
                            ).ravel()[lin]
                            frames.append(
                                pd.DataFrame(
                                    {
                                        "row": np.full(
                                            len(lin), crow, dtype=np.int64
                                        ),
                                        "col": np.full(
                                            len(lin), ccol, dtype=np.int64
                                        ),
                                        "py": pys,
                                        "px": pxs,
                                        "num": nums.astype(np.int64),
                                        "val": ((nums + 8) >> 4).astype(
                                            np.int32
                                        ),
                                    }
                                )
                            )
            if emit == "canvas" and o_row:
                yield pd.DataFrame(
                    {
                        "row": np.asarray(o_row, dtype=np.int64),
                        "col": np.asarray(o_col, dtype=np.int64),
                        "tile_w": np.full(len(o_row), ts, dtype=np.int32),
                        "tile_h": np.full(len(o_row), ts, dtype=np.int32),
                        "bytes": o_payload,
                    }
                )
            elif frames:
                yield pd.concat(frames, ignore_index=True)

    return grouped.mapInPandas(assemble, schema=out_schema)


_GRADIENT_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("row", T.LongType()),
        T.StructField("col", T.LongType()),
        T.StructField("py", T.IntegerType()),
        T.StructField("px", T.IntegerType()),
        T.StructField("gx_num", T.LongType()),
        T.StructField("gy_num", T.LongType()),
        T.StructField("mag2", T.LongType()),
    ]
)


def focal_gradient(
    tiles: DataFrame,
    tp: PyramidConfig,
    zoom: int,
    band: int = 0,
    emit: str = "canvas",
    sample_mod: int = 1,
    sample_off: int = 0,
) -> DataFrame:
    """Cross-tile Sobel gradient over a tiled raster — the edge-extraction /
    slope stencil, sharing ``focal_stats``'s halo exchange (one exchange of
    band plane + 1px border strips; bounded <= 9-struct assembly groups).
    Per pixel with a FULLY materialized 3x3 window:

        gx_num = (tr + 2r + br) - (tl + 2l + bl)   # Sobel Gx / Horn dz/dx numerator
        gy_num = (bl + 2b + br) - (tl + 2t + tr)   # Gy, image-down positive
        mag2   = gx_num^2 + gy_num^2

    All integer (|g| <= 1020) — exact in any engine, which is what makes
    the driver oracle possible; pixels whose window crosses the edge of
    the materialized raster are DROPPED (gradient needs all 9 samples;
    GDAL edge behavior).  ``emit='pixels'`` returns the sampled integer
    surface; ``emit='canvas'`` returns a uint8 edge-magnitude tile
    (``min((|gx|+2)//4 + (|gy|+2)//4, 255)`` — integer-only, deterministic),
    with window-incomplete border pixels set to 0.
    """
    if emit not in ("canvas", "pixels"):
        raise ValueError("emit must be 'canvas' or 'pixels'")
    ts = int(tp.tile_size) * int(tp.metatiling)
    mw = tp.matrix_width(zoom)
    mh = tp.matrix_height(zoom)
    mod = int(sample_mod)
    off = int(sample_off)
    if emit == "pixels" and not 0 <= off < mod:
        raise ValueError("sample_off must be in [0, sample_mod)")

    grouped = _halo_grouped(tiles, ts, 1, int(band), mw, mh, "focal_gradient")
    out_schema = (
        _FOCAL_CANVAS_SCHEMA if emit == "canvas" else _GRADIENT_PIXEL_SCHEMA
    )

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if emit == "pixels":
            lin = np.arange(off, ts * ts, mod, dtype=np.int64)
            pys = (lin // ts).astype(np.int32)
            pxs = (lin % ts).astype(np.int32)
        for pdf in batches:
            if not len(pdf):
                continue
            out_rows = []
            for trow, tcol, P, M in _halo_planes(pdf, ts, 1):
                A = P.astype(np.int64)
                gx = (
                    A[:-2, 2:] + 2 * A[1:-1, 2:] + A[2:, 2:]
                    - A[:-2, :-2] - 2 * A[1:-1, :-2] - A[2:, :-2]
                )
                gy = (
                    A[2:, :-2] + 2 * A[2:, 1:-1] + A[2:, 2:]
                    - A[:-2, :-2] - 2 * A[:-2, 1:-1] - A[:-2, 2:]
                )
                Mi = M.astype(np.int64)
                full = (
                    Mi[:-2, :-2] + Mi[:-2, 1:-1] + Mi[:-2, 2:]
                    + Mi[1:-1, :-2] + Mi[1:-1, 1:-1] + Mi[1:-1, 2:]
                    + Mi[2:, :-2] + Mi[2:, 1:-1] + Mi[2:, 2:]
                ) == 9
                out_rows.append((trow, tcol, gx, gy, full))
            if not out_rows:
                continue
            if emit == "canvas":
                bufs = []
                for trow, tcol, gx, gy, full in out_rows:
                    mag = (np.abs(gx) + 2) // 4 + (np.abs(gy) + 2) // 4
                    canvas = np.where(full, np.minimum(mag, 255), 0).astype(
                        np.uint8
                    )
                    bufs.append((trow, tcol, canvas.tobytes()))
                yield pd.DataFrame(
                    {
                        "row": [t[0] for t in bufs],
                        "col": [t[1] for t in bufs],
                        "tile_w": np.full(len(bufs), ts, dtype=np.int32),
                        "tile_h": np.full(len(bufs), ts, dtype=np.int32),
                        "bytes": [t[2] for t in bufs],
                    }
                )
            else:
                frames = []
                for trow, tcol, gx, gy, full in out_rows:
                    keep = full.ravel()[lin]
                    if not keep.any():
                        continue
                    sel = lin[keep]
                    gxs = gx.ravel()[sel]
                    gys = gy.ravel()[sel]
                    frames.append(
                        pd.DataFrame(
                            {
                                "row": np.full(len(sel), trow, dtype=np.int64),
                                "col": np.full(len(sel), tcol, dtype=np.int64),
                                "py": pys[keep],
                                "px": pxs[keep],
                                "gx_num": gxs,
                                "gy_num": gys,
                                "mag2": gxs * gxs + gys * gys,
                            }
                        )
                    )
                if frames:
                    yield pd.concat(frames, ignore_index=True)

    return grouped.mapInPandas(assemble, schema=out_schema)


_HILLSHADE_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("row", T.LongType()),
        T.StructField("col", T.LongType()),
        T.StructField("py", T.IntegerType()),
        T.StructField("px", T.IntegerType()),
        T.StructField("dot", T.LongType()),
        T.StructField("den2", T.LongType()),
        T.StructField("hs", T.DoubleType()),
    ]
)


def hillshade(
    tiles: DataFrame,
    tp: PyramidConfig,
    zoom: int,
    band: int = 0,
    light: tuple = (-5, -5, 7),
    nz: int = 512,
    emit: str = "canvas",
    sample_mod: int = 1,
    sample_off: int = 0,
) -> DataFrame:
    """Cross-tile Horn hillshade (Horn 1981; `gdaldem hillshade` semantics)
    sharing ``focal_stats``'s halo exchange (one exchange of band plane +
    1px border strips; bounded <= 9-struct assembly groups).  Per pixel
    with a fully materialized 3x3 window, the Sobel/Horn numerators gx/gy
    (exactly ``focal_gradient``'s) define the unnormalized surface normal
    n = (-gx, -gy, nz); shade is the cosine between n and the INTEGER
    light vector L = ``light``:

        dot  = -lx*gx - ly*gy + lz*nz                  (exact int64)
        den2 = (lx^2 + ly^2 + lz^2) * (gx^2 + gy^2 + nz^2)
        hs   = dot / sqrt(den2)                        in [-1, 1]

    dot and den2 are exact integers far below 2^53, so hs is ONE
    correctly-rounded sqrt + ONE correctly-rounded division — IEEE-identical
    in numpy, Spark, and DuckDB (the ``retrieval_recall`` quantization
    trick), which is what makes a bit-exact cross-engine value oracle
    possible for a trigonometry-flavored raster product.  The default
    L = (-5, -5, 7) lights from the northwest (image coords: +x right,
    +y down) at atan(7/sqrt(50)) ~ 44.7 deg altitude — GDAL's
    az=315/alt=45 default rationalized to integers; ``nz`` plays the role
    of Horn's 8*cellsize / z-exaggeration.

    ``emit='pixels'`` returns the sampled (dot, den2, hs) surface with
    window-incomplete pixels dropped (hillshade needs all 9 samples, as
    ``focal_gradient``); ``emit='canvas'`` returns a uint8 tile in GDAL's
    1..255 range — ``1 + floor(254 * max(hs, 0))`` — with 0 reserved for
    window-incomplete border pixels.
    """
    if emit not in ("canvas", "pixels"):
        raise ValueError("emit must be 'canvas' or 'pixels'")
    lx, ly, lz = (int(v) for v in light)
    l2 = lx * lx + ly * ly + lz * lz
    if l2 == 0:
        raise ValueError("light vector must be non-zero")
    nzi = int(nz)
    if nzi <= 0:
        raise ValueError("nz must be a positive integer")
    ts = int(tp.tile_size) * int(tp.metatiling)
    mw = tp.matrix_width(zoom)
    mh = tp.matrix_height(zoom)
    mod = int(sample_mod)
    off = int(sample_off)
    if emit == "pixels" and not 0 <= off < mod:
        raise ValueError("sample_off must be in [0, sample_mod)")

    grouped = _halo_grouped(tiles, ts, 1, int(band), mw, mh, "hillshade")
    out_schema = (
        _FOCAL_CANVAS_SCHEMA if emit == "canvas" else _HILLSHADE_PIXEL_SCHEMA
    )

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if emit == "pixels":
            lin = np.arange(off, ts * ts, mod, dtype=np.int64)
            pys = (lin // ts).astype(np.int32)
            pxs = (lin % ts).astype(np.int32)
        for pdf in batches:
            if not len(pdf):
                continue
            out_rows = []
            for trow, tcol, P, M in _halo_planes(pdf, ts, 1):
                A = P.astype(np.int64)
                gx = (
                    A[:-2, 2:] + 2 * A[1:-1, 2:] + A[2:, 2:]
                    - A[:-2, :-2] - 2 * A[1:-1, :-2] - A[2:, :-2]
                )
                gy = (
                    A[2:, :-2] + 2 * A[2:, 1:-1] + A[2:, 2:]
                    - A[:-2, :-2] - 2 * A[:-2, 1:-1] - A[:-2, 2:]
                )
                Mi = M.astype(np.int64)
                full = (
                    Mi[:-2, :-2] + Mi[:-2, 1:-1] + Mi[:-2, 2:]
                    + Mi[1:-1, :-2] + Mi[1:-1, 1:-1] + Mi[1:-1, 2:]
                    + Mi[2:, :-2] + Mi[2:, 1:-1] + Mi[2:, 2:]
                ) == 9
                dot = -lx * gx - ly * gy + lz * nzi
                den2 = l2 * (gx * gx + gy * gy + nzi * nzi)
                hs = dot / np.sqrt(den2.astype(np.float64))
                out_rows.append((trow, tcol, dot, den2, hs, full))
            if not out_rows:
                continue
            if emit == "canvas":
                bufs = []
                for trow, tcol, dot, den2, hs, full in out_rows:
                    shade = (254.0 * np.maximum(hs, 0.0)).astype(np.int64) + 1
                    canvas = np.where(full, shade, 0).astype(np.uint8)
                    bufs.append((trow, tcol, canvas.tobytes()))
                yield pd.DataFrame(
                    {
                        "row": [t[0] for t in bufs],
                        "col": [t[1] for t in bufs],
                        "tile_w": np.full(len(bufs), ts, dtype=np.int32),
                        "tile_h": np.full(len(bufs), ts, dtype=np.int32),
                        "bytes": [t[2] for t in bufs],
                    }
                )
            else:
                frames = []
                for trow, tcol, dot, den2, hs, full in out_rows:
                    keep = full.ravel()[lin]
                    if not keep.any():
                        continue
                    sel = lin[keep]
                    frames.append(
                        pd.DataFrame(
                            {
                                "row": np.full(len(sel), trow, dtype=np.int64),
                                "col": np.full(len(sel), tcol, dtype=np.int64),
                                "py": pys[keep],
                                "px": pxs[keep],
                                "dot": dot.ravel()[sel],
                                "den2": den2.ravel()[sel],
                                "hs": hs.ravel()[sel],
                            }
                        )
                    )
                if frames:
                    yield pd.concat(frames, ignore_index=True)

    return grouped.mapInPandas(assemble, schema=out_schema)


def _ccl4(mask: np.ndarray) -> "tuple[np.ndarray, int]":
    """4-connected two-pass labeling of a boolean plane, pure numpy: label
    horizontal runs (vectorized cumsum over run starts), union runs that
    touch vertically (union-find over the UNIQUE run-pair set — a solid
    h×w block contributes h-1 pairs, not h·w), then relabel to root runs.
    Returns (per-pixel root-run id, -1 background; number of runs)."""
    h, w = mask.shape
    if not mask.any():
        return np.full((h, w), -1, np.int64), 0
    starts = mask.copy()
    starts[:, 1:] &= ~mask[:, :-1]
    run_id = np.cumsum(starts.ravel()).reshape(h, w) - 1
    n_runs = int(starts.sum())
    parent = np.arange(n_runs, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    both = mask[1:, :] & mask[:-1, :]
    if both.any():
        a = run_id[1:, :][both]
        b = run_id[:-1, :][both]
        for pa, pb in np.unique(np.stack([a, b], 1), axis=0):
            ra, rb = find(int(pa)), find(int(pb))
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
    roots = np.array([find(i) for i in range(n_runs)], dtype=np.int64)
    lab = np.where(mask, roots[np.minimum(run_id, n_runs - 1)], -1)
    return lab, n_runs


def _driver_min_label(edges_pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Vectorized driver-side min-label resolution of an edge list:
    repeated edge relaxation (np.minimum.at both directions) + pointer
    jumping until fixpoint — O(E·log diameter) numpy passes, no python
    loop over edges.  Node ids are sorted ascending so index order ==
    gid order and the fixpoint label IS the min member gid."""
    a = edges_pdf["gid_a"].to_numpy(np.int64)
    b = edges_pdf["gid_b"].to_numpy(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a):]
    lbl = np.arange(len(nodes), dtype=np.int64)
    while True:
        prev = lbl.copy()
        np.minimum.at(lbl, ia, lbl[ib])
        np.minimum.at(lbl, ib, lbl[ia])
        lbl = np.minimum(lbl, lbl[lbl])
        if np.array_equal(lbl, prev):
            break
    return pd.DataFrame({"gid": nodes, "component": nodes[lbl]})


def label_components(
    tiles: DataFrame,
    band: int = 0,
    threshold: int = 128,
    max_iters: int = 25,
    merge: str = "auto",
    driver_merge_max: int = 4_000_000,
) -> DataFrame:
    """Cross-tile connected-component labeling over a tiled raster — the
    raster→vector "patch extraction" operator (contiguous burned area,
    water bodies, built-up blobs): pixels of band ``band`` with value
    ``>= threshold`` are foreground; components are 4-connected regions in
    GLOBAL pixel space, crossing tile boundaries.

    Output: one row per component — ``(component, comp_gy, comp_gx, area,
    min_gy, min_gx, max_gy, max_gx, n_tiles, perimeter)`` where
    ``component`` is the row-major-minimal member pixel encoded
    ``gy·2³² + gx`` (engine-portable identity: any labeling that agrees on
    membership agrees on it), ``comp_gy/comp_gx`` its decoded coordinates,
    ``area`` the pixel count, the bbox in global pixel coordinates, and
    ``perimeter`` the exposed-edge count ``4·area − 2·adjacent_pairs``
    (within-tile pairs counted in the kernel; cross-tile pairs are exactly
    the border-strip join matches).  All columns exact integers.

    Scale shape — the halo-free stencil: each canvas is labeled LOCALLY in
    one Arrow kernel pass (vectorized run labeling + union-find over the
    unique run-pair set), which emits per-local-label 7-int summaries plus
    one row per FOREGROUND BOUNDARY PIXEL (≤ 2·(tw+th) per tile — border
    strips, never canvas bytes, exactly the focal-stats discipline).
    Cross-tile equivalences are two equi-joins of opposing border strips
    on (tile key, offset); the global merge runs on the LABEL graph — one
    node per local patch, not per pixel — via the same frontier-delta +
    pointer-doubling label propagation the dedup endgame uses
    (functions/dedup.connected_components, O(log diameter) rounds), so a
    component snaking across thousands of tiles converges in ~log₂ rounds
    of label-table-sized joins.  Final stats are one groupBy on the
    resolved component id over per-label partials.  Canvas bytes are read
    exactly once and never shuffled.

    ``merge``: "auto" (default) resolves the label graph DRIVER-SIDE in
    one vectorized numpy pass when it has ≤ ``driver_merge_max`` edges —
    the graph is one node per local patch, so even a 600M-pixel corpus
    yields only ~10⁴–10⁵ edges, and collecting it removes the distributed
    loop's serial per-round job latency — falling back to the distributed
    propagation above the threshold; "driver"/"distributed" force a path.
    Both paths produce identical output (min-gid labeling, pytest-pinned)."""
    from .functions.dedup import connected_components

    band_i = int(band)
    thr = int(threshold)
    out_schema = T.StructType(
        [
            T.StructField("kind", T.IntegerType()),
            T.StructField("row", T.LongType()),
            T.StructField("col", T.LongType()),
            T.StructField("gid", T.LongType()),
            T.StructField("area", T.LongType()),
            T.StructField("min_gy", T.LongType()),
            T.StructField("min_gx", T.LongType()),
            T.StructField("max_gy", T.LongType()),
            T.StructField("max_gx", T.LongType()),
            T.StructField("adj", T.LongType()),
            T.StructField("side", T.IntegerType()),
            T.StructField("off", T.LongType()),
        ]
    )

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for i in range(len(pdf)):
                r = int(pdf["row"].iat[i])
                c = int(pdf["col"].iat[i])
                tw = int(pdf["tile_w"].iat[i])
                th = int(pdf["tile_h"].iat[i])
                buf = pdf["bytes"].iat[i]
                nb = len(buf) // (th * tw)
                if nb * th * tw != len(buf) or band_i >= nb:
                    raise ValueError(
                        f"canvas of {len(buf)} bytes is not {th}x{tw}xB "
                        f"with band {band_i} present"
                    )
                plane = np.frombuffer(buf, dtype=np.uint8).reshape(th, tw, nb)[
                    :, :, band_i
                ]
                mask = plane >= thr
                lab, _ = _ccl4(mask)
                if not mask.any():
                    continue
                ys, xs = np.nonzero(mask)
                lv = lab[ys, xs]
                gy = r * th + ys.astype(np.int64)
                gx = c * tw + xs.astype(np.int64)
                code = (gy << np.int64(32)) | gx
                u, inv = np.unique(lv, return_inverse=True)
                k = len(u)
                gid = np.full(k, np.iinfo(np.int64).max, np.int64)
                np.minimum.at(gid, inv, code)
                area = np.bincount(inv, minlength=k).astype(np.int64)
                mny = np.full(k, np.iinfo(np.int64).max, np.int64)
                mnx = mny.copy()
                mxy = np.full(k, np.iinfo(np.int64).min, np.int64)
                mxx = mxy.copy()
                np.minimum.at(mny, inv, gy)
                np.minimum.at(mnx, inv, gx)
                np.maximum.at(mxy, inv, gy)
                np.maximum.at(mxx, inv, gx)
                # within-tile 4-adjacencies per label (horizontal pairs are
                # run-internal, vertical pairs were unioned -> both endpoints
                # always share the label)
                adj = np.zeros(k, np.int64)
                hp = mask[:, 1:] & mask[:, :-1]
                if hp.any():
                    np.add.at(adj, np.searchsorted(u, lab[:, :-1][hp]), 1)
                vp = mask[1:, :] & mask[:-1, :]
                if vp.any():
                    np.add.at(adj, np.searchsorted(u, lab[:-1, :][vp]), 1)
                frames.append(
                    pd.DataFrame(
                        {
                            "kind": np.zeros(k, np.int32),
                            "row": np.full(k, r, np.int64),
                            "col": np.full(k, c, np.int64),
                            "gid": gid,
                            "area": area,
                            "min_gy": mny,
                            "min_gx": mnx,
                            "max_gy": mxy,
                            "max_gx": mxx,
                            "adj": adj,
                            "side": np.zeros(k, np.int32),
                            "off": np.zeros(k, np.int64),
                        }
                    )
                )
                # boundary strips: (side, offset, gid of the local label)
                gid_of = {int(u[j]): int(gid[j]) for j in range(k)}
                sides = (
                    (0, lab[0, :]),          # T: offset = x
                    (1, lab[th - 1, :]),     # B
                    (2, lab[:, 0]),          # L: offset = y
                    (3, lab[:, tw - 1]),     # R
                )
                for s, line in sides:
                    offs = np.nonzero(line >= 0)[0]
                    if not len(offs):
                        continue
                    frames.append(
                        pd.DataFrame(
                            {
                                "kind": np.ones(len(offs), np.int32),
                                "row": np.full(len(offs), r, np.int64),
                                "col": np.full(len(offs), c, np.int64),
                                "gid": np.array(
                                    [gid_of[int(v)] for v in line[offs]],
                                    np.int64,
                                ),
                                "area": np.zeros(len(offs), np.int64),
                                "min_gy": np.zeros(len(offs), np.int64),
                                "min_gx": np.zeros(len(offs), np.int64),
                                "max_gy": np.zeros(len(offs), np.int64),
                                "max_gx": np.zeros(len(offs), np.int64),
                                "adj": np.zeros(len(offs), np.int64),
                                "side": np.full(len(offs), s, np.int32),
                                "off": offs.astype(np.int64),
                            }
                        )
                    )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    out = (
        tiles.select("row", "col", "tile_w", "tile_h", "bytes")
        .mapInPandas(emit, schema=out_schema)
        .localCheckpoint(eager=False)  # feeds stats AND two boundary joins
    )
    stats = out.filter(F.col("kind") == 0).select(
        "row", "col", "gid", "area", "min_gy", "min_gx", "max_gy", "max_gx",
        "adj",
    )
    bnd = out.filter(F.col("kind") == 1).select("row", "col", "gid", "side", "off")
    rgt = bnd.filter(F.col("side") == 3).select(
        "row", (F.col("col") + 1).alias("col"), "off", F.col("gid").alias("gid_a")
    )
    lft = bnd.filter(F.col("side") == 2).select(
        "row", "col", "off", F.col("gid").alias("gid_b")
    )
    bot = bnd.filter(F.col("side") == 1).select(
        (F.col("row") + 1).alias("row"), "col", "off", F.col("gid").alias("gid_a")
    )
    top = bnd.filter(F.col("side") == 0).select(
        "row", "col", "off", F.col("gid").alias("gid_b")
    )
    # matched border pairs carry MULTIPLICITY (one row per cross-tile pixel
    # adjacency — the perimeter needs the count, the merge needs the set)
    matched = (
        rgt.join(lft, ["row", "col", "off"])
        .select("gid_a", "gid_b")
        .unionByName(bot.join(top, ["row", "col", "off"]).select("gid_a", "gid_b"))
        .localCheckpoint(eager=False)
    )
    edges = matched.distinct()
    # Merge strategy: the label graph has one node per LOCAL PATCH — orders
    # of magnitude smaller than the pixel data — so up to
    # ``driver_merge_max`` edges it collects to the driver and resolves in
    # one vectorized numpy pass (edge relaxation + pointer jumping), which
    # removes the distributed loop's serial per-round job latency (measured:
    # the O(log diameter) eager rounds, not the kernels, floored the 2304-
    # tile wall at ~10s).  Above the threshold — true planet-scale patch
    # graphs — ``merge="auto"`` falls back to the frontier-delta +
    # pointer-doubling propagation (functions/dedup.connected_components).
    if merge not in ("auto", "driver", "distributed"):
        raise ValueError("merge must be auto|driver|distributed")
    use_driver = merge == "driver" or (
        merge == "auto" and edges.limit(driver_merge_max + 1).count() <= driver_merge_max
    )
    if use_driver:
        comp = tiles.sparkSession.createDataFrame(
            _driver_min_label(edges.toPandas()),
            "gid long, component long",
        )
    else:
        comp = connected_components(edges, "gid_a", "gid_b", max_iters).select(
            F.col("doc_id").alias("gid"), "component"
        )
    cross = (
        matched.join(comp.withColumnRenamed("gid", "gid_a"), "gid_a")
        .groupBy("component")
        .agg(F.count("*").alias("_cross"))
        .withColumnRenamed("component", "_comp")
    )
    labeled = stats.join(comp, "gid", "left").withColumn(
        "_comp", F.coalesce("component", "gid")
    )
    agg = labeled.groupBy("_comp").agg(
        F.sum("area").alias("area"),
        F.min("min_gy").alias("min_gy"),
        F.min("min_gx").alias("min_gx"),
        F.max("max_gy").alias("max_gy"),
        F.max("max_gx").alias("max_gx"),
        F.count_distinct(F.struct("row", "col")).alias("n_tiles"),
        F.sum("adj").alias("_adj"),
    )
    return agg.join(cross, "_comp", "left").select(
        F.col("_comp").alias("component"),
        F.shiftright("_comp", 32).alias("comp_gy"),
        F.col("_comp").bitwiseAND(F.lit((1 << 32) - 1)).alias("comp_gx"),
        "area",
        "min_gy",
        "min_gx",
        "max_gy",
        "max_gx",
        "n_tiles",
        (
            F.lit(4) * F.col("area")
            - F.lit(2)
            * (F.col("_adj") + F.coalesce("_cross", F.lit(0).cast("long")))
        ).alias("perimeter"),
    )
