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
