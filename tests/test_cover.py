"""Cover-enumeration goldens — reference ``test_geometries.py:76-199``,
``test_tilepyramid.py:184-196``."""

from pyspark.sql import functions as F

from tilematrix_spark import exprs
from tilematrix_spark.grid import PyramidConfig
from tilematrix_spark.operators import cover, hierarchy

from .conftest import GRID_PROJ


def _cover_ids(spark, tp, bounds, zoom, **kw):
    df = spark.createDataFrame([bounds], "left double, bottom double, right double, top double")
    out = cover.tiles_from_bounds(df, tp, zoom, **kw)
    return {(zoom, r["row"], r["col"]) for r in out.select("row", "col").collect()}


def test_cover_single_tile(spark, geodetic):
    # exact tile bounds -> that tile only
    assert _cover_ids(spark, geodetic, (-163.125, 67.5, -157.5, 73.125), 5) == {(5, 3, 3)}


def test_cover_antimeridian_west(spark, geodetic):
    got = _cover_ids(spark, geodetic, (-183.125, 67.5, -177.5, 73.125), 5)
    assert got == {(5, 3, 0), (5, 3, 63)}


def test_cover_antimeridian_east(spark, geodetic):
    got = _cover_ids(spark, geodetic, (177.5, 67.5, 183.125, 73.125), 5)
    assert got == {(5, 3, 0), (5, 3, 63)}


def test_cover_antimeridian_both(spark, geodetic):
    got = _cover_ids(spark, geodetic, (-183.0, 67.5, 183.125, 73.125), 3)
    assert got == {(3, 0, c) for c in range(16)}


def test_cover_bbox_54_tiles(spark, geodetic):
    # reference test_geometries.py:124-199
    got = _cover_ids(spark, geodetic, (5.625, 28.125, 56.25, 61.875), 5)
    golden = {(5, r, c) for r in range(5, 11) for c in range(33, 42)}
    assert got == golden


def test_cover_equals_children(spark, geodetic):
    # reference test_tilepyramid.py:184-196: cover of a tile's bounds at z+1
    # == its children
    for tp, tile in [
        (geodetic, (8, 5, 5)),
        (PyramidConfig.create(GRID_PROJ), (8, 0, 0)),
    ]:
        z, r, c = tile
        tdf = spark.createDataFrame([tile], "zoom int, row long, col long")
        bounds = tdf.select(exprs.tile_bounds(tp, "zoom", "row", "col").alias("b")).collect()[0]["b"]
        got = _cover_ids(spark, tp, (bounds["left"], bounds["bottom"], bounds["right"], bounds["top"]), z + 1)
        kids = hierarchy.children(tdf, tp)
        expected = {
            (row["child_zoom"], row["child_row"], row["child_col"])
            for row in kids.select("child_zoom", "child_row", "child_col").collect()
        }
        assert got == expected


def test_cover_counts_match_reference_generator_semantics(spark, geodetic):
    # reference test_tilepyramid.py:199-260: bounds (0,0,90,90) z8
    got = _cover_ids(spark, geodetic, (0.0, 0.0, 90.0, 90.0), 8)
    # corner math: rows 0..127 (y in 0..90 upper hemisphere), cols 256..383
    assert len(got) == 128 * 128
    rows = {r for _, r, _ in got}
    cols = {c for _, _, c in got}
    assert rows == set(range(0, 128))
    assert cols == set(range(256, 384))


def test_cover_antimeridian_batch_counts(spark, geodetic):
    # reference test_tilepyramid.py:263-292: bounds (0, 0, 185, 95) z8 —
    # crossing east; count parity with flat enumeration semantics
    got = _cover_ids(spark, geodetic, (0.0, 0.0, 185.0, 95.0), 8)
    assert {r for _, r, _ in got} == set(range(0, 128))
    # union parts: D=[0,180] -> cols 255..511 (col 255 touches x=0; shapely
    # `intersects` counts boundary touch, _funcs.py:205) and wrapped
    # C=[-180,-175] -> cols 0..7
    cols = {c for _, _, c in got}
    assert cols == set(range(255, 512)) | set(range(0, 8))


def test_cover_oversize_guard(spark, geodetic):
    df = spark.createDataFrame(
        [(0.0, 0.0, 90.0, 90.0), (0.0, 0.0, 0.5, 0.5)],
        "left double, bottom double, right double, top double",
    )
    out = cover.tiles_from_bounds(df, geodetic, 8, max_cover_tiles=100, oversize="drop")
    # the 128x128 cover is dropped; the small one stays
    assert out.count() == 1


def test_cover_oversize_split_complete(spark, geodetic):
    """oversize='split' (the default) row-bands covers above the cap BEFORE
    the explode: results must equal the uncapped cover exactly, and every
    band's candidate block must stay within the cap."""
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 90.0, 90.0), (2, 0.0, 0.0, 0.5, 0.5), (3, 170.0, -10.0, 190.0, 10.0)],
        "id int, left double, bottom double, right double, top double",
    )
    plain = {
        (r["id"], r["row"], r["col"])
        for r in cover.tiles_from_bounds(df, geodetic, 8).collect()
    }
    split = {
        (r["id"], r["row"], r["col"])
        for r in cover.tiles_from_bounds(df, geodetic, 8, max_cover_tiles=100).collect()
    }
    assert split == plain
    # the 128x128 cover (16384 tiles) was emitted complete despite cap=100
    assert sum(1 for t in split if t[0] == 1) == 128 * 128
    # band width: floor(100/128 cols) -> 1 row per band => per-band explode
    # of 128 <= ~cap tiles; verify via the plan that a band explode exists
    plan = cover.tiles_from_bounds(
        df, geodetic, 8, max_cover_tiles=100
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Generate") >= 3  # band + row + col explodes


def test_cover_multiple_rows_independent(spark, geodetic):
    df = spark.createDataFrame(
        [
            (1, -163.125, 67.5, -157.5, 73.125),
            (2, -183.125, 67.5, -177.5, 73.125),
        ],
        "id int, left double, bottom double, right double, top double",
    )
    out = cover.tiles_from_bounds(df, geodetic, 5)
    got = {(r["id"], r["row"], r["col"]) for r in out.collect()}
    assert got == {(1, 3, 3), (2, 3, 0), (2, 3, 63)}


def test_snap_bounds_equals_cover_union(spark, geodetic):
    # reference test_tilepyramid.py:348-366
    bounds = (0.0, 1.0, 2.0, 3.0)
    df = spark.createDataFrame([bounds], "left double, bottom double, right double, top double")
    for pb in (0, 10):
        snapped = df.select(
            exprs.snap_bounds(geodetic, "left", "bottom", "right", "top", 8, pb).alias("s")
        ).collect()[0]["s"]
        tiles = cover.tiles_from_bounds(df, geodetic, 8)
        b = tiles.select(exprs.tile_bounds(geodetic, F.lit(8), "row", "col", pb).alias("b")).agg(
            F.min("b.left").alias("l"), F.min("b.bottom").alias("b"),
            F.max("b.right").alias("r"), F.max("b.top").alias("t"),
        ).collect()[0]
        assert (snapped["left"], snapped["bottom"], snapped["right"], snapped["top"]) == (
            b["l"], b["b"], b["r"], b["t"],
        )


def test_batch_row_major_ordering(spark, geodetic):
    # physical batch_by='row' parity: within each partition rows are
    # monotone and columns monotone within a row (test_tilepyramid.py:199-260)
    df = spark.createDataFrame(
        [(0.0, 0.0, 90.0, 90.0)], "left double, bottom double, right double, top double"
    )
    tiles = cover.tiles_from_bounds(df, geodetic, 6)
    batched = cover.batch_row_major(tiles, num_partitions=4)

    def check_partition(it):
        prev = None
        for r in it:
            cur = (r["row"], r["col"])
            if prev is not None:
                assert cur > prev
            prev = cur
            yield r

    total = batched.rdd.mapPartitions(lambda it: check_partition(it)).count()
    assert total == tiles.count()


def test_cover_mercator_antimeridian_crossing(spark):
    """Mercator cover in map units: a box crossing the +x edge wraps to the
    west columns, exactly like the geodetic antimeridian path."""
    from tilematrix_spark.grid import PyramidConfig

    tp = PyramidConfig.create("mercator")
    r = tp.right
    df = spark.createDataFrame(
        [(1, r - 2.0e6, -1.0e6, r + 2.0e6, 1.0e6)],
        "id int, left double, bottom double, right double, top double",
    )
    got = {(x["row"], x["col"]) for x in cover.tiles_from_bounds(df, tp, 4).collect()}
    cols = {c for _, c in got}
    mw = tp.matrix_width(4)
    assert max(cols) == mw - 1 and 0 in cols  # both edges of the matrix
    assert all(0 <= rr < tp.matrix_height(4) for rr, _ in got)


def test_cover_custom_grid_clips_no_wrap(spark):
    """Non-global custom grid: a box overflowing the left/bottom bounds is
    clipped at the matrix range and never wraps."""
    from tilematrix_spark.grid import GridConfig, PyramidConfig

    grid = GridConfig.create(
        grid="custom", shape=(2, 4), bounds=(0.0, 0.0, 400.0, 200.0),
        srs={"epsg": 31259}, is_global=False,
    )
    tp = PyramidConfig.create(grid, tile_size=256, metatiling=1)
    df = spark.createDataFrame(
        [(1, -150.0, -50.0, 150.0, 120.0)],
        "id int, left double, bottom double, right double, top double",
    )
    got = {(x["row"], x["col"]) for x in cover.tiles_from_bounds(df, tp, 1).collect()}
    # z1: 4 rows x 8 cols of 50-unit tiles; box covers cols 0-2, rows 1-3
    assert got == {(r, c) for r in (1, 2, 3) for c in (0, 1, 2)}
