"""Deterministic sampling operators for training-data mixes.

A 100 TB corpus pipeline needs *reproducible* sampling: the same mix must
come out regardless of cluster size, partitioning, or retry — which rules
out ``rand()``.  Both operators below key every decision off md5 of the row
id, so any row's fate is computable independently (verifiable per-row, and
portable to a SQL oracle byte-for-byte: lowercase-hex string comparison is
order-isomorphic to the numeric hash value).

* ``hash_sample``: Bernoulli sampling by hash-prefix threshold.
* ``quota_per_key``: cap rows per key (per-source / per-domain quotas) —
  the selection order is the hash itself (a deterministic uniform shuffle),
  computed hot-key-safe as a two-stage top-k.
"""

from __future__ import annotations

from typing import List, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_hash(id_col: Union[str, Column], salt: str = "s0") -> Column:
    """The 8-hex-char (32-bit) sampling hash of a row id — lowercase hex
    string; compare lexicographically."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(F.concat(c.cast("string"), F.lit("#" + salt))), 1, 8)


def hash_threshold(rate: float) -> str:
    """Hex threshold h such that P[hash < h] == rate (to 2^-32).  rate=1.0
    returns a sentinel above every hex string ('g' > 'f' lexicographically)
    so keep-all strata really keep ALL rows — clamping to 'ffffffff' would
    drop the 2^-32 of rows whose prefix is exactly that."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    if rate >= 1.0:
        return "g"
    return format(int(rate * 16**8), "08x")


def hash_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id", salt: str = "s0"
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff its sampling hash is
    below the rate threshold.  Content-stable (same ids survive every run at
    every parallelism), composable (different salts give independent
    samples), and a pure pushdown-friendly filter — no shuffle, no RNG
    state."""
    return df.filter(sample_hash(id_col, salt) < F.lit(hash_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    key: str,
    rates: dict,
    id_col: str = "doc_id",
    salt: str = "s0",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli rates (rebalancing a mix, e.g. downsample the
    dominant language): keep a row iff its sampling hash is below its
    stratum's threshold.  Same determinism/composability as ``hash_sample``;
    the per-key threshold is a literal when-chain (broadcast-free, codegen),
    strata absent from ``rates`` get ``default_rate``."""
    thr = F.lit(hash_threshold(default_rate))
    for k, r in sorted(rates.items()):
        thr = F.when(F.col(key) == F.lit(k), F.lit(hash_threshold(r))).otherwise(thr)
    return df.filter(sample_hash(id_col, salt) < thr)


def quota_per_key(
    df: DataFrame,
    keys: Union[str, List[str]],
    quota: int,
    id_col: str = "doc_id",
    salt: str = "q0",
    buckets: int = 16,
) -> DataFrame:
    """Keep at most ``quota`` rows per key group — the per-source/per-domain
    cap of web-scale mixes — selecting the ``quota`` smallest sampling
    hashes (a deterministic uniform choice; ties broken by id).

    Hot-key-safe two-stage top-k: a single ``row_number() OVER (PARTITION BY
    key)`` would drag an entire hot key through one task, so stage 1 ranks
    within (key, hash-bucket) and keeps ``quota`` per bucket — bounding
    stage 2's input to ``buckets * quota`` rows per key.  Provably exact:
    the global quota-smallest hashes of a key are contained in the union of
    its per-bucket quota-smallest.  Two shuffles total.
    """
    key_cols = [keys] if isinstance(keys, str) else list(keys)
    clash = {"_qh", "_rn"} & set(df.columns)
    if clash:
        # silently clobbering (then dropping) a user column named _qh/_rn
        # would corrupt the output — refuse loudly instead
        raise ValueError(f"input columns collide with reserved temp names: {sorted(clash)}")
    h = sample_hash(id_col, salt)
    df = df.withColumn("_qh", h)
    bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(buckets))
    w1 = Window.partitionBy(*key_cols, bucket).orderBy(F.col("_qh"), F.col(id_col))
    stage1 = df.withColumn("_rn", F.row_number().over(w1)).filter(
        F.col("_rn") <= quota
    ).drop("_rn")
    w2 = Window.partitionBy(*key_cols).orderBy(F.col("_qh"), F.col(id_col))
    return (
        stage1.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= quota)
        .drop("_rn", "_qh")
    )


def spatial_split(
    df: DataFrame,
    tp,
    zoom,
    block: int = 4,
    fractions=None,
    lon_col: str = "lon",
    lat_col: str = "lat",
    salt: str = "s0",
    out_col: str = "fold",
) -> DataFrame:
    """Leakage-safe geographic train/val/test split: every row is assigned
    a fold by hashing its tile SUPER-BLOCK (``block``×``block`` tiles at
    ``zoom``), so spatially co-located rows — burst shots, adjacent scenes,
    overlapping footprints — always land in the SAME fold.  A per-row hash
    split leaks: near-duplicate neighbors straddle train/test and inflate
    eval.  Block-hashing trades exact fraction sizes (realized fractions
    converge at the block count, not the row count) for zero spatial
    leakage within a block and at most block-boundary adjacency between
    folds; raise ``block`` or lower ``zoom`` until block extent ≥ the
    spatial correlation length.

    Same determinism contract as ``hash_sample``: md5 of the block key —
    reproducible at any cluster size/partitioning/retry, no RNG state,
    pure projection (no shuffle); portable to a SQL oracle byte-for-byte.

    ``fractions``: ordered {fold_name: fraction}, summing to ≤ 1 (a
    remainder falls into the LAST fold, mirroring the usual train-gets-
    the-rest convention when fractions sum to 1 within float error).
    """
    from ..operators import assign

    if fractions is None:
        fractions = {"train": 0.8, "val": 0.1, "test": 0.1}
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError("fractions must sum to <= 1")
    tiled = assign.with_tile(df, tp, zoom, lon_col, lat_col, out_row="_sb_row", out_col="_sb_col", out_tile_id=None)
    key = F.concat_ws(
        "_",
        (F.col("_sb_row") / block).cast("long"),
        (F.col("_sb_col") / block).cast("long"),
    )
    h = sample_hash(key, salt)
    names = list(fractions)
    bounds = []
    run = 0.0
    for name in names:
        run += fractions[name]
        bounds.append((name, run))
    # first matching cumulative bound wins: h<b1 -> fold1, elif h<b2 -> ...,
    # else the last fold (which also absorbs any <1.0 remainder)
    expr = F.lit(names[-1])
    for name, bound in reversed(bounds[:-1]):
        expr = F.when(h < F.lit(hash_threshold(bound)), F.lit(name)).otherwise(expr)
    return tiled.withColumn(out_col, expr).drop("_sb_row", "_sb_col")
