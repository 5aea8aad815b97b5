"""Multimodal column operators: decode / feature-extract / resize /
frame-sample over opaque ``binary`` payload columns with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, UDF signatures,
partition behavior) is real and tested end-to-end.  Codec dispatch goes
through per-modality registries: numpy-backed formats (raw/q8 images,
pcm16 audio, rawv video) always decode; library-backed formats (jpeg/png/
webp via PIL, compressed audio/video) auto-register when the library
imports or via ``register_decoder``/``register_video_decoder`` — a real
cluster lights them up with zero plumbing changes, and this container
raises a clear ``NotImplementedError`` for them.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import images as imglib

#: formats the sandbox can really decode (numpy-only codecs)
REAL_FORMATS = {"raw", "q8"}
#: formats requiring external libs — auto-registered when the lib imports
STUB_FORMATS = {"jpeg", "png", "webp"}

# ---------------------------------------------------------------------------
# codec registry (one dispatch point for every decode path)
#
# Decoder: (data, w, h) -> uint8 ndarray (h, w, 3).  The registry is
# populated at import time — numpy codecs always, PIL-backed jpeg/png/webp
# iff PIL imports (a real cluster lights them up with zero code changes;
# this container lacks it, so those formats raise NotImplementedError).
#
# Every Arrow kernel snapshots the registry into its closure at
# DataFrame-construction time (``decoders = dict(_DECODERS)``), so a
# decoder registered at runtime on the driver is cloudpickled to executors
# with the kernel — registration works on a real multi-JVM cluster, not
# just in local mode where the module state happens to be shared.
# ---------------------------------------------------------------------------

ImageDecoder = Callable[[bytes, int, int], np.ndarray]

_DECODERS: Dict[str, ImageDecoder] = {}


def register_decoder(fmt: str, fn: ImageDecoder) -> None:
    """Register/replace the decoder for ``fmt``.  Call before building the
    DataFrame plan — kernels snapshot the registry into their closures."""
    _DECODERS[fmt] = fn


def unregister_decoder(fmt: str) -> None:
    _DECODERS.pop(fmt, None)


def registered_formats() -> set:
    return set(_DECODERS)


def snapshot_decoders() -> Dict[str, ImageDecoder]:
    """Copy of the registry for closure capture at plan-build time (ships to
    executors via cloudpickle with the Arrow kernel)."""
    return dict(_DECODERS)


def _pil_decoder() -> Optional[ImageDecoder]:
    """Import-guarded PIL decoder for jpeg/png/webp — None when PIL absent."""
    try:
        from PIL import Image  # noqa: F401
    except Exception:
        return None

    def decode(data: bytes, w: int, h: int) -> np.ndarray:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), dtype=np.uint8)

    return decode


def _install_default_decoders() -> None:
    for f in REAL_FORMATS:
        _DECODERS.setdefault(f, lambda data, w, h, _f=f: imglib.decode(data, w, h, _f))
    pil = _pil_decoder()
    if pil is not None:
        for f in STUB_FORMATS:
            _DECODERS.setdefault(f, pil)


_install_default_decoders()


def decode_image(
    data: bytes, w: int, h: int, fmt: str,
    decoders: Optional[Dict[str, ImageDecoder]] = None,
) -> np.ndarray:
    d = _DECODERS if decoders is None else decoders
    fn = d.get(fmt)
    if fn is not None:
        return fn(data, w, h)
    if fmt in STUB_FORMATS:
        # no codec library present and none registered; a real deployment
        # gets these via the import-guarded PIL path or register_decoder()
        raise NotImplementedError(
            f"decoder for '{fmt}' requires an image codec library "
            "(install PIL or register_decoder())"
        )
    raise ValueError(f"unknown image format: {fmt}")


_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("std_gray", T.DoubleType()),
        T.StructField("phash", T.LongType()),
    ]
)


def _shape_groups(pdf: pd.DataFrame):
    """Yield (w, h, fmt, positions) same-shape groups of an Arrow batch —
    the shared vectorization pattern (raster.verify_images uses it too):
    per-image decode is unavoidable, but all statistics run once per group
    over an (n, h, w, 3) stack instead of per row."""
    pos = np.arange(len(pdf))
    key = pd.MultiIndex.from_arrays([pdf["w"].values, pdf["h"].values, pdf["fmt"].values])
    for (w, h, fmt), grp in pd.Series(pos).groupby(key, sort=False):
        yield int(w), int(h), str(fmt), grp.to_numpy()


def extract_image_features(df: DataFrame) -> DataFrame:
    """Per-image channel means, gray stddev, and average-hash — Arrow-batched
    and vectorized per (w, h, fmt) shape group: one stacked mean/std/hash
    pass per group, no per-row Python statistics."""
    decoders = snapshot_decoders()  # ships to executors in the closure

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            mean_rgb = np.empty((m, 3), dtype=np.float64)
            std_gray = np.empty(m, dtype=np.float64)
            phash = np.empty(m, dtype=np.int64)
            for w, h, fmt, ii in _shape_groups(pdf):
                stack = np.stack(
                    [decode_image(pdf["bytes"].iat[i], w, h, fmt, decoders) for i in ii]
                ).astype(np.float64)
                mean_rgb[ii] = stack.mean(axis=(1, 2))
                std_gray[ii] = stack.mean(axis=3).std(axis=(1, 2))
                phash[ii] = imglib.average_hash_batch(stack.astype(np.uint8))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].values,
                    "mean_r": mean_rgb[:, 0],
                    "mean_g": mean_rgb[:, 1],
                    "mean_b": mean_rgb[:, 2],
                    "std_gray": std_gray,
                    "phash": phash,
                }
            )

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(run, _FEATURES_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h); output fmt is ``raw``."""
    decoders = snapshot_decoders()  # ships to executors in the closure

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            data: list = [None] * m
            for w, h, fmt, ii in _shape_groups(pdf):
                # index maps are shared by the whole shape group: one fancy
                # index over the (n, h, w, 3) stack resizes every image
                stack = np.stack(
                    [decode_image(pdf["bytes"].iat[i], w, h, fmt, decoders) for i in ii]
                )
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                resized = np.ascontiguousarray(stack[:, ys][:, :, xs])
                flat = resized.reshape(len(ii), -1)
                for j, i in enumerate(ii):
                    data[i] = flat[j].tobytes()
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].values,
                    "bytes": data,
                    "w": np.full(m, out_w, dtype=np.int32),
                    "h": np.full(m, out_h, dtype=np.int32),
                    "fmt": ["raw"] * m,
                }
            )

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(run, _RESIZE_SCHEMA)


def pack_sign_bits(vec_col, bits: int = 63):
    """Pack the sign bits of the first ``bits`` dims of an ``array<float>``
    embedding into a non-negative int64 perceptual-hash (bit i set iff
    ``v[i+1] > 0``) — the ``phash:int64`` column of the input_hint schema,
    derived from content instead of a stored column.  63 bits keeps the hash
    non-negative so ``>>``/``&`` band extraction is portable across engines
    (DuckDB raises on ``1::BIGINT << 63``).  Pure native expressions:
    transform-with-index + aggregate(bitwiseOR), whole-stage codegen."""
    # 2^i via double pow: powers of two are exact doubles through 2^62, and
    # shiftleft() only accepts a literal shift amount (not the lambda index).
    signs = F.transform(
        F.slice(vec_col, 1, bits),
        lambda x, i: F.when(
            x > F.lit(0.0), F.pow(F.lit(2.0), i).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(signs, F.lit(0).cast("long"), lambda a, x: a.bitwiseOR(x))


def phash_hamming(a, b):
    """Hamming distance between two packed-64-bit perceptual hashes (native)."""
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)) if isinstance(a, str) else a.bitwiseXOR(b))


def _phash_band_structs(phash_col, n_bands: int):
    """Split a packed 64-bit hash into ``n_bands`` contiguous bit bands,
    as (band_index, band_value) structs for explode-based blocking.

    Pigeonhole: two hashes at Hamming distance ≤ n_bands - 1 agree on at
    least one band, so joining on any-band-equal keeps recall exact for
    that radius.  shiftright sign-extends on int64; the mask clears the
    extended bits, so band values are correct unsigned ints for any band
    position including the one holding bit 63.  n_bands=1 (w=64, whose
    mask would overflow LongType) degenerates to the unmasked hash — the
    band IS the full word, so no mask is needed."""
    base, rem = divmod(64, n_bands)
    out, off = [], 0
    for b in range(n_bands):
        w = base + (1 if b < rem else 0)
        bv = (
            phash_col
            if w == 64
            else F.shiftright(phash_col, off).bitwiseAND(F.lit((1 << w) - 1))
        )
        out.append(F.struct(F.lit(b).alias("bi"), bv.alias("bv")))
        off += w
    return out


def _banded(df: DataFrame, phash_col: str, n_bands: int) -> DataFrame:
    """Explode each row into its n_bands (``_bi``, ``_bv``) blocking keys."""
    return df.select(
        "*", F.explode(F.array(*_phash_band_structs(F.col(phash_col), n_bands))).alias("_b")
    ).select(*df.columns, F.col("_b.bi").alias("_bi"), F.col("_b.bv").alias("_bv"))


def phash_dup_pairs(
    df: DataFrame,
    max_distance: int = 2,
    id_col: str = "image_id",
    max_ids_per_band: Optional[int] = 100_000,
) -> DataFrame:
    """Perceptual-hash near-dup image pairs via banded blocking: split the
    64-bit hash into 4 16-bit bands; pairs matching on any band get an exact
    Hamming check (pigeonhole: distance ≤ 3 guarantees ≥1 equal band;
    distance ≤ max_distance ≤ 3 keeps recall exact).

    Scale guard (``max_ids_per_band``): a degenerate band value shared by a
    large corpus fraction — 0x0000/0xFFFF bands from flat or dark images —
    makes one blocking bucket quadratic at corpus scale.  Band keys held by
    more than ``max_ids_per_band`` ids are dropped via a broadcast anti-join
    before the self-join (same discipline as ``winnow_near_pairs``'s
    ``max_docs_per_fp``).  Any pair sharing at least one NON-degenerate band
    is still found exactly; only pairs whose every equal band is degenerate
    are skipped — a bounded, documented recall trade on pathological
    corpora, exact otherwise.  ``None`` disables the cap."""
    h = df.select(F.col(id_col), F.col("phash"))
    banded = _banded(h, "phash", 4)
    if max_ids_per_band:
        hot = (
            banded.groupBy("_bi", "_bv")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_ids_per_band)
            .select("_bi", "_bv")
        )
        banded = banded.join(F.broadcast(hot), ["_bi", "_bv"], "left_anti")
    left = banded.select(
        F.col(id_col).alias("id_a"), F.col("phash").alias("ph_a"), "_bi", "_bv"
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col("phash").alias("ph_b"), "_bi", "_bv"
    )
    cands = (
        left.join(right, ["_bi", "_bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    dist = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return cands.withColumn("hamming", dist).filter(F.col("hamming") <= max_distance).select(
        "id_a", "id_b", "hamming"
    )


def spatial_phash_pairs(
    df: DataFrame,
    tp,
    zoom,
    max_hamming: int = 6,
    id_col: str = "image_id",
    phash_col: str = "phash",
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_tile_contributors: Optional[int] = 20_000,
) -> DataFrame:
    """Geo-blocked perceptual near-dup pairs: candidate pairs are limited to
    images whose centroids fall in the SAME or an 8-neighboring tile at
    ``zoom`` (Chebyshev distance ≤ 1, antimeridian wrap on global grids),
    then exact ``bit_count(xor)`` Hamming ≤ ``max_hamming``.

    The burst-photo dedup shape for planet-scale image corpora: near-dups
    of the same scene are near in SPACE, so spatial blocking bounds the
    quadratic hash comparison to ~ (local density)² per tile instead of a
    corpus self-join — and unlike banded pigeonhole blocking it stays exact
    at ANY Hamming radius within the spatial block.  Pick ``zoom`` so tile
    extent ≳ GPS error + scene size; recall is exact for pairs within one
    tile step (guaranteed once tile extent ≥ max co-location distance).

    Plan shape: one tile assignment projection (native), a 9-way ring
    explode on the probe side (``hierarchy.k_ring`` — wrap/clamp/dedup per
    reference neighbor rules), an equi-join on the tile key, native
    bit_count refine.  Each unordered pair surfaces exactly once: the ring
    tile set is distinct, ``id_a < id_b`` picks one orientation, so a pair
    is generated only under join key = tile(id_b).

    Hot-tile guard (``max_tile_contributors``): the per-tile self-join is
    (local density)² per join key — one dense-city tile at corpus scale
    (10⁶ co-located images → 10¹² candidates) is a single runaway task no
    salt can split, because the candidate SET itself is quadratic.  Tiles
    whose contributor count exceeds the cap are re-blocked WITHIN the tile
    by phash band: the hash is split into ``max_hamming + 1`` bands and the
    hot-side join key becomes (tile, band_idx, band_value).  Pigeonhole
    makes this refine EXACT at radius ``max_hamming`` (≤ max_hamming
    differing bits across max_hamming+1 bands leaves ≥ 1 band equal), so
    the output is IDENTICAL with the guard on or off — it only bounds the
    candidate blow-up per bucket to (density / 2^band_bits)² per band.
    Cold tiles keep the plain one-join path (no explode overhead).
    ``None`` disables the split.  Returns (id_a, id_b, hamming).
    """
    from ..operators import assign, hierarchy

    slim = df.select(
        F.col(id_col), F.col(phash_col).alias("_ph"), F.col(lon_col), F.col(lat_col)
    )
    tiled = assign.with_tile(slim, tp, zoom, lon_col, lat_col, out_tile_id=None)
    probe = hierarchy.k_ring(tiled, tp, 1, zoom=zoom, include_center=True).select(
        F.col(id_col).alias("id_a"),
        F.col("_ph").alias("ph_a"),
        F.col("ring_row").alias("row"),
        F.col("ring_col").alias("col"),
    )
    base = tiled.select(
        F.col(id_col).alias("id_b"), F.col("_ph").alias("ph_b"), "row", "col"
    )
    if max_tile_contributors:
        hot_tiles = F.broadcast(
            base.groupBy("row", "col")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_tile_contributors)
            .select("row", "col")
        )
        cands = (
            probe.join(base.join(hot_tiles, ["row", "col"], "left_anti"), ["row", "col"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "ph_a", "id_b", "ph_b")
        )
        nb = max_hamming + 1
        probe_hot = _banded(
            probe.join(hot_tiles, ["row", "col"], "left_semi"), "ph_a", nb
        )
        base_hot = _banded(
            base.join(hot_tiles, ["row", "col"], "left_semi"), "ph_b", nb
        )
        hot_pairs = (
            probe_hot.join(base_hot, ["row", "col", "_bi", "_bv"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
            .select("id_a", "ph_a", "id_b", "ph_b")
        )
        cands = cands.unionByName(hot_pairs)
    else:
        cands = (
            probe.join(base, ["row", "col"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "ph_a", "id_b", "ph_b")
        )
    dist = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (
        cands.withColumn("hamming", dist)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def crossmodal_dup_pairs(
    df: DataFrame,
    max_hamming: int = 2,
    min_jaccard: float = 0.5,
    ngram: int = 3,
    id_col: str = "image_id",
    caption_col: str = "caption",
    max_ids_per_band: Optional[int] = 100_000,
) -> DataFrame:
    """Cross-modal near-duplicate pairs over an image+caption corpus (the
    input_hint table shape): a pair is a duplicate only when BOTH the image
    near-matches (phash Hamming ≤ ``max_hamming``) AND the caption
    near-matches (word-``ngram`` Jaccard ≥ ``min_jaccard``) — the standard
    web-corpus filter where a near-identical image with unrelated alt-text
    (stock photo reused under a new caption) is NOT a duplicate, and an
    identical caption on a different image isn't either.

    Plan shape: the cheap exact image gate runs FIRST and produces the
    candidate set (``phash_dup_pairs``: banded pigeonhole blocking with the
    hot-band cap — the reference's filter-refine discipline,
    _tilepyramid.py:256-269, on the hash domain); the caption verify then
    touches ONLY candidate ids.  Caption shingle sets are bounded (captions
    are short), so they ride as array columns through two equi-joins and
    are intersected natively (``array_intersect`` — single flat expression,
    no nested higher-order lambdas, no Python).  Cost is Θ(|corpus|) for
    hashing/shingling + Θ(|candidates|) for the verify, never |corpus|².

    Returns (id_a, id_b, hamming, jaccard), id_a < id_b.  Pairs where
    either caption yields zero ``ngram``-shingles are dropped (no text
    evidence — same inner-join semantics as the relational Jaccard).
    """
    from . import dedup as dedupfns

    cands = phash_dup_pairs(
        df.select(F.col(id_col), "phash"),
        max_distance=max_hamming,
        id_col=id_col,
        max_ids_per_band=max_ids_per_band,
    ).localCheckpoint(eager=False)  # feeds the id set AND the final join
    # tokenize/shingle ONLY candidate rows: the caption pass is the dominant
    # string cost at corpus scale and |candidate ids| << |corpus| (bounded
    # by the banded blocking + hot-band cap); AQE turns the semi-join into
    # a broadcast at runtime when the id set is small
    cand_ids = (
        cands.select(F.col("id_a").alias(id_col))
        .unionByName(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    slim = df.select(F.col(id_col), F.col(caption_col)).join(
        cand_ids, id_col, "left_semi"
    )
    sh = dedupfns._shingle_table(slim, id_col, caption_col, ngram)
    sets_df = sh.groupBy("_id").agg(F.collect_set("shingle").alias("_sh"))
    a = sets_df.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha"))
    b = sets_df.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb"))
    inter = F.size(F.array_intersect(F.col("_sha"), F.col("_shb")))
    union = F.size(F.col("_sha")) + F.size(F.col("_shb")) - inter
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "hamming", "jaccard")
    )


# ---------------------------------------------------------------------------
# audio / video plumbing (deterministic fake + stubs)
# ---------------------------------------------------------------------------

_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
    ]
)


#: AudioDecoder: (data) -> float64 sample array.  pcm16 is built in (and
#: bypasses per-clip decode via the concatenated-reduceat fast path);
#: compressed codecs plug in via register_audio_decoder.
AudioDecoder = Callable[[bytes], np.ndarray]

_AUDIO_DECODERS: Dict[str, AudioDecoder] = {}


def register_audio_decoder(fmt: str, fn: AudioDecoder) -> None:
    """Register/replace the audio decoder for ``fmt`` (call before building
    the DataFrame plan — kernels snapshot the registry into their closures)."""
    _AUDIO_DECODERS[fmt] = fn


def audio_features(df: DataFrame, clip_id: str = "clip_id", payload: str = "bytes", fmt: str = "fmt") -> DataFrame:
    """Audio feature extraction (n_samples, rms, peak).  fmt='pcm16' (raw
    int16 mono) runs the vectorized fast path; other formats decode through
    the registry (``register_audio_decoder``), raising a clear error when
    no decoder is present."""
    decoders = dict(_AUDIO_DECODERS)  # snapshot: ships to executors

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            fmts = pdf[fmt].to_numpy()
            if (fmts != "pcm16").any():
                # registry path: per-clip decode to a sample array, then the
                # same concatenated-reduceat statistics as pcm16
                raw = pdf[payload]
                decoded = []
                for i in range(m):
                    f = fmts[i]
                    if f == "pcm16":
                        decoded.append(np.frombuffer(raw.iat[i], dtype=np.int16))
                        continue
                    fn = decoders.get(f)
                    if fn is None:
                        raise NotImplementedError(
                            f"audio codec '{f}' requires an audio library "
                            "(register_audio_decoder())"
                        )
                    decoded.append(np.asarray(fn(raw.iat[i]), dtype=np.float64))
                lens = np.fromiter((len(s) for s in decoded), dtype=np.int64, count=m)
                rms = np.zeros(m, dtype=np.float64)
                peak = np.zeros(m, dtype=np.float64)
                nz = np.flatnonzero(lens > 0)
                for i in nz:
                    s = decoded[i].astype(np.float64)
                    rms[i] = np.sqrt((s * s).mean())
                    peak[i] = np.abs(s).max()
                yield pd.DataFrame(
                    {
                        "clip_id": pdf[clip_id].values,
                        "n_samples": lens.astype(np.int32),
                        "rms": rms,
                        "peak": peak,
                    }
                )
                continue
            # vectorized over the whole batch: one concatenated sample
            # buffer, segment sums/maxima via ufunc.reduceat (no per-clip
            # numpy dispatch).  rms accumulates sequentially (reduceat) —
            # same value as a per-row mean up to summation-order rounding.
            bufs = pdf[payload].tolist()
            odd = [len(b) for b in bufs if len(b) % 2]
            if odd:
                # a mis-framed payload would silently shift every LATER
                # clip's samples by one byte in the concatenated buffer
                raise ValueError(
                    f"pcm16 payload has odd byte length {odd[0]} (not a whole number of int16 samples)"
                )
            lens = np.fromiter((len(b) // 2 for b in bufs), dtype=np.int64, count=m)
            starts = np.zeros(m, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            cat = np.frombuffer(b"".join(bufs), dtype=np.int16).astype(np.float64)
            rms = np.zeros(m, dtype=np.float64)
            peak = np.zeros(m, dtype=np.float64)
            nz = np.flatnonzero(lens > 0)
            if len(nz):
                # reduceat over the nonzero segments only: their starts are
                # strictly increasing and each runs to the next nonzero start
                rms[nz] = np.sqrt(np.add.reduceat(cat * cat, starts[nz]) / lens[nz])
                peak[nz] = np.maximum.reduceat(np.abs(cat), starts[nz])
            yield pd.DataFrame(
                {
                    "clip_id": pdf[clip_id].values,
                    "n_samples": lens.astype(np.int32),
                    "rms": rms,
                    "peak": peak,
                }
            )

    return df.select(clip_id, payload, fmt).mapInPandas(run, _AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# video frame sampling (decoder registry, same seam as images)
#
# VideoDecoder: (data, w, h) -> uint8 ndarray (n_frames, h, w, 3).
# 'rawv' (concatenated raw RGB frames) is always registered — the
# deterministic in-sandbox format; compressed codecs (h264/vp9/...) light
# up when a real deployment registers an ffmpeg/PyAV-backed decoder.
# ---------------------------------------------------------------------------

VideoDecoder = Callable[[bytes, int, int], np.ndarray]

_VIDEO_DECODERS: Dict[str, VideoDecoder] = {}


def register_video_decoder(fmt: str, fn: VideoDecoder) -> None:
    """Register/replace the video decoder for ``fmt`` (call before building
    the DataFrame plan — kernels snapshot the registry into their closures)."""
    _VIDEO_DECODERS[fmt] = fn


def _rawv_decode(data: bytes, w: int, h: int) -> np.ndarray:
    frame = h * w * 3
    if len(data) % frame:
        raise ValueError(
            f"rawv payload length {len(data)} is not a whole number of {h}x{w} RGB frames"
        )
    return np.frombuffer(data, dtype=np.uint8).reshape(-1, h, w, 3)


_VIDEO_DECODERS["rawv"] = _rawv_decode


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def video_frame_sample(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Explode each video row into frame rows (video_id, frame_no, bytes raw
    RGB, w, h, fmt='raw'), keeping every ``every_n``-th frame — the
    frame-sampling stage of a video training-data pipeline.  Arrow-batched
    ``mapInPandas``; downstream image operators (features / resize / phash)
    consume the output directly.  Output rows ≈ input bytes / every_n, so
    the explode SHRINKS data ~every_n-fold — safe at any scale; partition
    count follows the input scan."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    decoders = dict(_VIDEO_DECODERS)  # snapshot: ships to executors

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, data, ws, hs = [], [], [], [], []
            for rec in pdf.itertuples(index=False):
                fn = decoders.get(rec.fmt)
                if fn is None:
                    raise NotImplementedError(
                        f"video codec '{rec.fmt}' requires a video library "
                        "(register_video_decoder())"
                    )
                frames = fn(rec.bytes, int(rec.w), int(rec.h))
                for i in range(0, frames.shape[0], every_n):
                    ids.append(rec.video_id)
                    fnos.append(i)
                    data.append(frames[i].tobytes())
                    ws.append(int(rec.w))
                    hs.append(int(rec.h))
            yield pd.DataFrame(
                {
                    "video_id": ids,
                    "frame_no": np.asarray(fnos, dtype=np.int32),
                    "bytes": data,
                    "w": np.asarray(ws, dtype=np.int32),
                    "h": np.asarray(hs, dtype=np.int32),
                    "fmt": ["raw"] * len(ids),
                }
            )

    return df.select("video_id", "bytes", "w", "h", "fmt").mapInPandas(run, _FRAME_SCHEMA)
