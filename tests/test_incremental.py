"""Incremental pyramid maintenance: deltas merged into the committed
pyramid must equal a full rebuild byte-for-byte at every zoom (integer-mean
composition and the 2x2 box filter are deterministic, so incremental ==
batch EXACTLY)."""

import pytest
from pyspark.sql import functions as F

from tilematrix_spark import images, incremental, raster

N_OLD, N_UPD = 120, 30
BASE_Z, MIN_Z = 4, 2


def _split(spark):
    total = images.images_df(spark, N_OLD + N_UPD, partitions=8)
    split_id = f"img{N_OLD:012d}"
    return (
        total,
        total.filter(F.col("image_id") < split_id),
        total.filter(F.col("image_id") >= split_id),
    )


def _canvases(df):
    return {
        (r["row"], r["col"]): (r["tile_w"], r["tile_h"], bytes(r["bytes"]))
        for r in df.select("row", "col", "tile_w", "tile_h", "bytes").collect()
    }


@pytest.fixture(scope="module")
def pyramids(spark, geodetic):
    total, old, upd = _split(spark)
    old_levels = {
        z: df.persist()
        for z, df in raster.build_overviews(
            raster.compose_tiles(old, geodetic, BASE_Z), BASE_Z, MIN_Z
        ).items()
    }
    full_levels = {
        z: df.persist()
        for z, df in raster.build_overviews(
            raster.compose_tiles(total, geodetic, BASE_Z), BASE_Z, MIN_Z
        ).items()
    }
    # materialize=persist: the z-1 delta reads the z delta twice (merge +
    # dirty keys); unpersisted, that recursion recomputes the whole chain
    # per action (the job materializes by committing levels to parquet)
    deltas = incremental.incremental_update(
        lambda z: old_levels[z],
        old,
        upd,
        geodetic,
        BASE_Z,
        MIN_Z,
        materialize=lambda df, _z: df.persist(),
    )
    yield old_levels, full_levels, deltas, upd
    for dfs in (old_levels, full_levels, deltas):
        for df in dfs.values():
            df.unpersist()


def test_incremental_equals_full_rebuild(pyramids, spark, geodetic):
    old_levels, full_levels, deltas, _ = pyramids
    for z in range(BASE_Z, MIN_Z - 1, -1):
        merged = _canvases(incremental.merged_level(old_levels[z], deltas[z]))
        full = _canvases(full_levels[z])
        assert set(merged) == set(full), f"tile sets differ at z{z}"
        diff = [k for k in full if merged[k] != full[k]]
        assert not diff, f"{len(diff)} canvases differ at z{z}: {diff[:5]}"


def test_delta_is_small(pyramids, geodetic):
    """The whole point: the delta touches only the dirty cover, which is a
    |updates|-sized set, strictly smaller than the level."""
    old_levels, _, deltas, upd = pyramids
    dirty = incremental.dirty_tiles(upd, geodetic, BASE_Z)
    n_dirty = dirty.count()
    assert deltas[BASE_Z].count() == n_dirty
    assert n_dirty < old_levels[BASE_Z].count()
    # propagation shrinks (<=4 children per parent ensures monotone non-growth)
    sizes = [deltas[z].count() for z in range(BASE_Z, MIN_Z - 1, -1)]
    assert all(b <= a for a, b in zip(sizes, sizes[1:]))


def test_dirty_tile_stats_match_windows(pyramids, spark, geodetic):
    """n_new/n_total agree with a direct windows aggregation over the
    corpus, and stats rows are exactly the dirty keys."""
    _, _, _, upd = pyramids
    total, old, upd2 = _split(spark)
    stats = incremental.dirty_tile_stats(old, upd2, geodetic, BASE_Z)
    got = {
        (r["row"], r["col"]): (r["n_new"], r["n_total"]) for r in stats.collect()
    }
    win = raster.raster_tile_windows(total, geodetic, BASE_Z).filter(
        (F.col("win_width") > 0) & (F.col("win_height") > 0)
    )
    split_id = f"img{N_OLD:012d}"
    want_rows = (
        win.groupBy("row", "col")
        .agg(
            F.sum((F.col("image_id") >= split_id).cast("long")).alias("n_new"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .filter(F.col("n_new") > 0)
        .collect()
    )
    want = {(r["row"], r["col"]): (r["n_new"], r["n_total"]) for r in want_rows}
    assert got == want
