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


def _ngram_buckets(tk: Column, n_buckets: int, portable: bool = True) -> Column:
    """Hashed feature-bucket array of a materialized token-array column:
    every unigram and bigram maps to ``int(md5(gram)[:8], 16) % n_buckets``
    — all native (md5/conv/pmod, whole-stage codegen) and exactly
    mirrorable in DuckDB via hex-nibble decoding.  ``portable=False``
    swaps md5 for native ``xxhash64`` (no string hex round-trip) for
    production runs that don't need the cross-engine oracle.  Pass a
    BOUND column: Catalyst inlines expression arguments into each
    ``element_at`` in the bigram transform (the quadratic-inlining
    trap)."""
    B = int(n_buckets)

    def bucket(g: Column) -> Column:
        if not portable:
            return F.pmod(F.xxhash64(g), F.lit(B))
        return F.pmod(
            F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
            F.lit(B),
        )

    uni = F.transform(tk, lambda t: bucket(t))
    idx = F.sequence(F.lit(0), F.size(tk) - 2)
    bi = F.transform(
        idx,
        lambda i: bucket(
            F.concat(
                F.element_at(tk, (i + 1).cast("int")),
                F.lit(" "),
                F.element_at(tk, (i + 2).cast("int")),
            )
        ),
    )
    return F.concat(
        uni,
        F.when(F.size(tk) >= 2, bi).otherwise(
            F.array().cast("array<bigint>")
        ),
    )


def _ngram_feature_table(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int,
    portable: bool = True,
) -> DataFrame:
    from . import text as textfns

    toks = df.select(
        F.col(id_col).alias("_id"),
        textfns.tokens(textfns.normalize(text_col)).alias("_toks"),
    )
    return toks.select(
        "_id",
        F.explode(
            _ngram_buckets(F.col("_toks"), n_buckets, portable)
        ).alias("bucket"),
    )


def importance_scores(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    smoothing: float = 1.0,
    portable: bool = True,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every RAW doc by how
    much its hashed n-gram (unigram+bigram) distribution looks like the
    TARGET corpus's rather than the raw corpus's.  Two scores per doc:

    - ``log_weight`` — the paper's importance log-weight
      Σ_g [log p̂_target(b(g)) − log p̂_raw(b(g))] with Laplace smoothing
      ``smoothing``; float sums are summation-order-dependent, so this
      column is for ranking/resampling, NOT for bit-exact oracles.
    - ``mass_score`` — an integer-exact proxy: Σ target bucket counts over
      the doc's grams divided by Σ raw bucket counts (two int64 sums ≤ 2^53
      — exact in any order — and ONE correctly-rounded IEEE division), so
      it carries a full cross-engine value oracle.

    Select by sorting on either score (ties → id) or by Gumbel-top-k on
    ``log_weight`` for the paper's sampled variant.

    Scale shape: both distributions reduce to ≤ ``n_buckets`` rows
    (algebraic counts, partial-agg map-side) and BROADCAST — the raw
    corpus is scanned once for features and never shuffled on a text key;
    the only corpus-sized exchange is the per-doc groupBy, and each doc's
    exploded grams are partition-local so map-side combine collapses them
    to one row per doc before the shuffle.  The feature table feeds both
    the raw distribution and the per-doc join — localCheckpoint barriers
    it so tokenize+md5 runs once."""
    B = int(n_buckets)
    s = float(smoothing)
    fr = _ngram_feature_table(
        raw, id_col, text_col, B, portable
    ).localCheckpoint(eager=False)
    ft = _ngram_feature_table(target, id_col, text_col, B, portable)
    tc = ft.groupBy("bucket").agg(F.count("*").alias("t_cnt"))
    rc = fr.groupBy("bucket").agg(F.count("*").alias("r_cnt"))
    dists = (
        tc.join(rc, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0).cast("long")).alias("t_cnt"),
            F.coalesce("r_cnt", F.lit(0).cast("long")).alias("r_cnt"),
        )
        .crossJoin(F.broadcast(tc.agg(F.sum("t_cnt").alias("t_tot"))))
        .crossJoin(F.broadcast(rc.agg(F.sum("r_cnt").alias("r_tot"))))
    )
    lw = F.log(
        (F.col("t_cnt") + F.lit(s)) / (F.col("t_tot") + F.lit(s * B))
    ) - F.log((F.col("r_cnt") + F.lit(s)) / (F.col("r_tot") + F.lit(s * B)))
    per_doc = (
        fr.join(F.broadcast(dists), "bucket")
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("t_cnt").alias("target_mass"),
            F.sum("r_cnt").alias("raw_mass"),
            F.sum(lw).alias("log_weight"),
        )
    )
    base = raw.select(F.col(id_col))
    j = base.join(per_doc.withColumnRenamed("_id", id_col), id_col, "left")
    rm = F.coalesce("raw_mass", F.lit(0).cast("long"))
    tm = F.coalesce("target_mass", F.lit(0).cast("long"))
    return j.select(
        id_col,
        F.coalesce("n_feats", F.lit(0).cast("long")).alias("n_feats"),
        tm.alias("target_mass"),
        rm.alias("raw_mass"),
        F.when(rm > 0, tm.cast("double") / rm.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("mass_score"),
        F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
    )
