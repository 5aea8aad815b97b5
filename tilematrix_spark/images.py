"""Deterministic synthetic ``images`` table — the engine's primary input per
``BASELINE.json:input_hint``: (image_id, bytes, w, h, fmt, caption, phash)
plus derived geo columns for the spatial operators.

Everything is a pure function of the row index (seed 42, golden-ratio
scatter) — no wall clock, no external data — so correctness checks can
REGENERATE the expected pixels from ``image_id`` alone and compare
(decoded-pixel allclose / PSNR ≥ 40 dB for the lossy format + caption
equality), which is the per-row invariant the driver grades.

Formats:
* ``raw``: uncompressed row-major uint8 RGB (h, w, 3) — exact equality.
* ``q8``: lossy uniform quantization to step 8 (32 levels), decoded to bin
  midpoints → PSNR ≈ 40.9 dB ≥ the 40 dB gate.

Generation runs distributed: ``spark.range`` → ``mapInPandas`` (Arrow
batches, counter-based splitmix64 pixels vectorized per shape group) —
scales linearly with executors, and any single (row, pixel) is computable
independently for verification.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEED = 42
# R2 low-discrepancy constants (1/g, 1/g^2 for the plastic number g):
# genuinely independent mod 1 — NOTE 1/phi + 1/phi^2 = 1 makes the golden
# ratio pair collinear (points land on one diagonal), so don't use it in 2D
PHI1 = 0.7548776662466927
PHI2 = 0.5698402909980532

HOT_BOUNDS = (9.0, 47.0, 12.1, 49.1)  # injected dense cluster (skew driver)

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("fp_left", T.DoubleType(), False),
        T.StructField("fp_bottom", T.DoubleType(), False),
        T.StructField("fp_right", T.DoubleType(), False),
        T.StructField("fp_top", T.DoubleType(), False),
    ]
)


def row_lonlat(idx: int) -> Tuple[float, float]:
    """Deterministic scatter; 10% of rows snap into the hot cluster and a
    small slice lands exactly on grid lines to exercise on-edge ties."""
    lon = -180.0 + ((idx * PHI1) % 1.0) * 360.0
    lat = -90.0 + ((idx * PHI2) % 1.0) * 180.0
    if idx % 10 == 3:  # hot cluster (skew)
        l, b, r, t = HOT_BOUNDS
        lon = l + ((idx * PHI1) % 1.0) * (r - l)
        lat = b + ((idx * PHI2) % 1.0) * (t - b)
    elif idx % 97 == 0:  # exact grid-line hits (on_edge_use ties)
        lon = float([-180.0, -90.0, 0.0, 45.0, 90.0][(idx // 97) % 5])
        lat = float([0.0, 45.0, -45.0, 22.5, 67.5][(idx // 97) % 5])
    return lon, lat


def row_dims(idx: int) -> Tuple[int, int]:
    return 16 + (idx % 4) * 16, 16 + ((idx // 4) % 4) * 16


def row_fmt(idx: int) -> str:
    return "raw" if idx % 5 else "q8"


def row_caption(idx: int, lon: float, lat: float) -> str:
    return f"synthetic scene {idx} at ({lon:.6f},{lat:.6f})"


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mix constants),
    computed in place on the input buffer; uint64 wrap-around is numpy's
    native unsigned overflow semantics."""
    tmp = np.empty_like(x)
    x += np.uint64(0x9E3779B97F4A7C15)
    np.right_shift(x, np.uint64(30), out=tmp)
    x ^= tmp
    x *= np.uint64(0xBF58476D1CE4E5B9)
    np.right_shift(x, np.uint64(27), out=tmp)
    x ^= tmp
    x *= np.uint64(0x94D049BB133111EB)
    np.right_shift(x, np.uint64(31), out=tmp)
    x ^= tmp
    return x


def gen_pixels_batch(idxs: np.ndarray, w: int, h: int) -> np.ndarray:
    """Deterministic pixels for a SAME-SHAPE image stack: every mixed word
    splitmix64(row_key ^ word_counter) yields EIGHT pixel bytes
    (little-endian byte view) — a counter-based generator, so any
    (row, pixel) value is computable independently (no sequential RNG
    state, the property that makes both distributed generation and per-row
    re-verification embarrassingly parallel).  Returns (n, h, w, 3) uint8."""
    n = len(idxs)
    npx = h * w * 3
    nwords = (npx + 7) // 8  # 8 pixel bytes per mixed word
    keys = _splitmix64(np.asarray(idxs, dtype=np.uint64) ^ np.uint64(SEED))
    lin = np.arange(nwords, dtype=np.uint64)
    out = np.empty((n, nwords * 8), dtype=np.uint8)
    # ~131k-element (1 MB) uint64 chunks: smaller chunks drown in per-op
    # numpy dispatch (7k imgs/s), bigger ones spill L2 -> DRAM (23k);
    # the sweet spot measures 105k imgs/s at 48x48
    step = max(1, 131072 // nwords)
    for s in range(0, n, step):
        e = min(s + step, n)
        buf = keys[s:e, None] ^ lin[None, :]
        # little-endian byte view: all 8 bytes of each mixed word are pixels
        out[s:e] = _splitmix64(buf).astype("<u8", copy=False).view(np.uint8).reshape(e - s, -1)
    return out[:, :npx].reshape(n, h, w, 3)


def gen_pixels(idx: int, w: int, h: int) -> np.ndarray:
    return gen_pixels_batch(np.asarray([idx]), w, h)[0]


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "q8":
        return (pixels // 8).astype(np.uint8).tobytes()
    raise NotImplementedError(f"unsupported fmt: {fmt}")


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    arr = np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "raw":
        return arr
    if fmt == "q8":
        return (arr.astype(np.uint16) * 8 + 4).clip(0, 255).astype(np.uint8)
    raise NotImplementedError(f"unsupported fmt: {fmt}")


def average_hash_batch(stack: np.ndarray) -> np.ndarray:
    """64-bit average hashes for a SAME-SHAPE image stack (n, h, w, 3) —
    one vectorized pass (gray → per-image 8×8 block means → bits), packed
    to int64.  Bit-identical to :func:`average_hash` per row (same element
    groupings and reduction order; pinned by tests)."""
    n, h, w, _ = stack.shape
    if h % 8 or w % 8:
        return np.asarray([average_hash(stack[i]) for i in range(n)], dtype=np.int64)
    gray = stack.mean(axis=3)
    blocks = gray.reshape(n, 8, h // 8, 8, w // 8).mean(axis=(2, 4))
    bits = blocks > blocks.mean(axis=(1, 2))[:, None, None]
    packed = np.packbits(bits.reshape(n, 64), axis=1)
    vals = np.ascontiguousarray(packed).view(">u8").ravel().astype(np.uint64)
    return vals.astype(np.int64)  # two's-complement wrap == signed int64


def average_hash(pixels: np.ndarray) -> int:
    """64-bit average hash: gray → 8×8 block means → >global-mean bits."""
    gray = pixels.mean(axis=2)
    h, w = gray.shape
    if h % 8 == 0 and w % 8 == 0:
        # equal blocks: single reshape-mean (same values as slice means)
        blocks = gray.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    else:
        ys = (np.arange(9) * h) // 8
        xs = (np.arange(9) * w) // 8
        blocks = np.empty((8, 8))
        for i in range(8):
            for j in range(8):
                blocks[i, j] = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    bits = (blocks > blocks.mean()).flatten()
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    # interpret as signed int64
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def row_footprint(idx: int, lon: float, lat: float, w: int, h: int):
    """Footprint bbox: centroid ± (w,h)·pixel_size at a per-row zoom
    (4 + idx % 8 on the geodetic 256px grid); ~1% straddle the antimeridian."""
    zoom = 4 + idx % 8
    px = 360.0 / (2 * 2**zoom * 256)
    half_w = w * px / 2
    half_h = h * px / 2
    left, right = lon - half_w, lon + half_w
    bottom = max(lat - half_h, -90.0)
    top = min(lat + half_h, 90.0)
    if idx % 101 == 7:  # antimeridian straddler
        left, right = 180.0 - half_w, 180.0 + half_w
    return left, bottom, right, top


def make_row(idx: int) -> dict:
    w, h = row_dims(idx)
    fmt = row_fmt(idx)
    lon, lat = row_lonlat(idx)
    pixels = gen_pixels(idx, w, h)
    data = encode(pixels, fmt)
    ph = average_hash(decode(data, w, h, fmt))
    fp = row_footprint(idx, lon, lat, w, h)
    return {
        "image_id": f"img{idx:012d}",
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": row_caption(idx, lon, lat),
        "phash": ph,
        "lon": lon,
        "lat": lat,
        "fp_left": fp[0],
        "fp_bottom": fp[1],
        "fp_right": fp[2],
        "fp_top": fp[3],
    }


def _lonlat_batch(ids: np.ndarray):
    """Vectorized row_lonlat (same float expressions per branch)."""
    lon = -180.0 + (ids * PHI1) % 1.0 * 360.0
    lat = -90.0 + (ids * PHI2) % 1.0 * 180.0
    hot = ids % 10 == 3
    l, b, r, t = HOT_BOUNDS
    lon = np.where(hot, l + (ids * PHI1) % 1.0 * (r - l), lon)
    lat = np.where(hot, b + (ids * PHI2) % 1.0 * (t - b), lat)
    edge = (~hot) & (ids % 97 == 0)
    sel = (ids // 97) % 5
    lon = np.where(edge, np.asarray([-180.0, -90.0, 0.0, 45.0, 90.0])[sel], lon)
    lat = np.where(edge, np.asarray([0.0, 45.0, -45.0, 22.5, 67.5])[sel], lat)
    return lon, lat


def captions_batch(ids: np.ndarray, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Vectorized :func:`row_caption` (C ``%.6f`` formatting is the same
    correctly-rounded conversion as Python's ``f'{x:.6f}'``; pinned by the
    make_rows_batch == make_row parity test)."""
    return np.char.add(
        np.char.add(
            np.char.mod("synthetic scene %d at (", ids), np.char.mod("%.6f", lon)
        ),
        np.char.add(np.char.mod(",%.6f", lat), ")"),
    )


def make_rows_batch(ids: np.ndarray) -> pd.DataFrame:
    """Vectorized ``make_row`` for an id batch: lon/lat/footprints are one
    numpy pass; pixels + phash are computed per (w, h, fmt) shape group (the
    per-row python is only caption formatting and tobytes).  Row-for-row
    identical to make_row — pinned by tests."""
    n = len(ids)
    ids = np.asarray(ids, dtype=np.int64)
    w_arr = (16 + (ids % 4) * 16).astype(np.int32)
    h_arr = (16 + ((ids // 4) % 4) * 16).astype(np.int32)
    lon, lat = _lonlat_batch(ids)
    zoom = 4 + ids % 8
    px_sz = 360.0 / (2 * np.power(2.0, zoom) * 256)
    half_w = w_arr * px_sz / 2
    half_h = h_arr * px_sz / 2
    fp_l, fp_r = lon - half_w, lon + half_w
    fp_b = np.maximum(lat - half_h, -90.0)
    fp_t = np.minimum(lat + half_h, 90.0)
    am = ids % 101 == 7
    fp_l = np.where(am, 180.0 - half_w, fp_l)
    fp_r = np.where(am, 180.0 + half_w, fp_r)
    captions = captions_batch(ids, lon, lat)
    image_ids = np.char.mod("img%012d", ids)
    data: list = [None] * n
    phash = np.empty(n, dtype=np.int64)
    fmts = np.where(ids % 5 == 0, "q8", "raw")
    pos = np.arange(n)
    key = pd.MultiIndex.from_arrays([w_arr, h_arr, ids % 5 == 0])
    for (w, h, is_q8), grp in pd.Series(pos).groupby(key, sort=False):
        ii = grp.to_numpy()
        w, h = int(w), int(h)
        px = gen_pixels_batch(ids[ii], w, h)
        if is_q8:
            stored = px // 8
            decoded = (stored.astype(np.uint16) * 8 + 4).clip(0, 255).astype(np.uint8)
        else:
            stored = px
            decoded = px
        phash[ii] = average_hash_batch(decoded)
        for j, i in enumerate(ii):
            data[i] = stored[j].tobytes()
    return pd.DataFrame(
        {
            "image_id": image_ids,
            "bytes": data,
            "w": w_arr,
            "h": h_arr,
            "fmt": fmts,
            "caption": captions,
            "phash": phash,
            "lon": lon,
            "lat": lat,
            "fp_left": fp_l,
            "fp_bottom": fp_b,
            "fp_right": fp_r,
            "fp_top": fp_t,
        }
    )


def images_df(spark: SparkSession, n: int, partitions: int = 32) -> DataFrame:
    """Distributed deterministic generation of the images table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield make_rows_batch(pdf["id"].to_numpy())

    return (
        spark.range(0, n, numPartitions=partitions)
        .mapInPandas(gen, schema=IMAGES_SCHEMA)
    )


def image_idx(image_id_series: pd.Series) -> np.ndarray:
    return image_id_series.str.slice(3).astype(np.int64).to_numpy()
