"""Hierarchy/navigation goldens — reference ``test_tile.py:35-149``,
``test_tilepyramid.py:41-75``, ``test_grids.py:54-59``."""

from pyspark.sql import functions as F

from tilematrix_spark.grid import PyramidConfig
from tilematrix_spark.operators import hierarchy

from .conftest import GRID_IRREGULAR  # noqa


def _df(spark, ids):
    return spark.createDataFrame(
        [(int(z), int(r), int(c)) for z, r, c in ids], "zoom int, row long, col long"
    )


def _collect(df, prefix):
    return {
        (r[prefix + "zoom"], r[prefix + "row"], r[prefix + "col"]) for r in df.collect()
    }


def test_parent(spark, geodetic):
    df = _df(spark, [(8, 100, 100), (0, 0, 0)])
    rows = df.select("zoom", hierarchy.parent("zoom", "row", "col").alias("p")).collect()
    got = {r["zoom"]: (None if r["p"] is None else (r["p"]["zoom"], r["p"]["row"], r["p"]["col"])) for r in rows}
    assert got[8] == (7, 50, 50)
    assert got[0] is None


def test_children(spark, geodetic):
    got = _collect(hierarchy.children(_df(spark, [(8, 100, 100)]), geodetic), "child_")
    assert got == {(9, 200, 200), (9, 201, 200), (9, 200, 201), (9, 201, 201)}

    tp2 = PyramidConfig.create("geodetic", metatiling=2)
    got = _collect(hierarchy.children(_df(spark, [(0, 0, 0)]), tp2), "child_")
    assert got == {(1, 0, 0), (1, 0, 1)}

    tp4 = PyramidConfig.create("geodetic", metatiling=4)
    got = _collect(hierarchy.children(_df(spark, [(0, 0, 0)]), tp4), "child_")
    assert got == {(1, 0, 0)}


def test_neighbors(spark, geodetic):
    got = _collect(hierarchy.neighbors(_df(spark, [(8, 100, 100)]), geodetic), "neighbor_")
    assert got == {
        (8, 101, 100), (8, 100, 101), (8, 99, 100), (8, 100, 99),
        (8, 99, 101), (8, 101, 101), (8, 101, 99), (8, 99, 99),
    }
    got4 = _collect(
        hierarchy.neighbors(_df(spark, [(8, 100, 100)]), geodetic, connectedness=4),
        "neighbor_",
    )
    assert got4 == {(8, 101, 100), (8, 100, 101), (8, 99, 100), (8, 100, 99)}


def test_neighbors_antimeridian_wrap(spark, geodetic):
    got = _collect(hierarchy.neighbors(_df(spark, [(3, 1, 0)]), geodetic), "neighbor_")
    assert got == {
        (3, 0, 0), (3, 1, 1), (3, 2, 0), (3, 1, 15),
        (3, 0, 1), (3, 2, 1), (3, 2, 15), (3, 0, 15),
    }


def test_neighbors_degenerate(spark, geodetic):
    # zoom 0 (0,0,0): both wraps collapse to the single other tile
    got = _collect(hierarchy.neighbors(_df(spark, [(0, 0, 0)]), geodetic), "neighbor_")
    assert got == {(0, 0, 1)}
    # metatiling 2 zoom 0: alone at zoom level -> no neighbors
    tp2 = PyramidConfig.create("geodetic", metatiling=2)
    assert hierarchy.neighbors(_df(spark, [(0, 0, 0)]), tp2).count() == 0


def test_neighbors_non_global_edge(spark):
    # non-global: no wrap -> corner-adjacent tile at max col has 5 neighbors
    tp = PyramidConfig.create(
        {
            "shape": (1, 1),
            "bounds": (-4000000.0, -4000000.0, 4000000.0, 4000000.0),
            "is_global": False,
            "srs": {"epsg": 32632},
        }
    )
    max_col = tp.matrix_width(5) - 1
    df = _df(spark, [(5, 3, max_col)])
    assert hierarchy.neighbors(df, tp).count() == 5


def test_neighbors_non_global_corner(spark):
    # reference test_grids.py:54-59: EPSG grid (1,0,0) at z1 (2x2 matrix)
    from .conftest import GRID_EPSG

    tp = PyramidConfig.create(GRID_EPSG)
    got = _collect(hierarchy.neighbors(_df(spark, [(1, 0, 0)]), tp), "neighbor_")
    assert got == {(1, 1, 0), (1, 0, 1), (1, 1, 1)}


def test_k_ring(spark, geodetic):
    got = _collect(hierarchy.k_ring(_df(spark, [(8, 100, 100)]), geodetic, k=1), "ring_")
    assert len(got) == 9  # disc includes center
    got2 = _collect(
        hierarchy.k_ring(_df(spark, [(8, 100, 100)]), geodetic, k=2, include_center=False),
        "ring_",
    )
    assert len(got2) == 24


def test_intersecting(spark):
    tp1 = PyramidConfig.create("geodetic")
    tp2 = PyramidConfig.create("geodetic", metatiling=2)
    # same metatiling: identity
    got = _collect(hierarchy.intersecting(_df(spark, [(5, 1, 1)]), tp1, tp1), "target_")
    assert got == {(5, 1, 1)}
    # bigger -> smaller: explode 4 subtiles
    got = _collect(hierarchy.intersecting(_df(spark, [(5, 1, 1)]), tp2, tp1), "target_")
    assert got == {(5, 2, 2), (5, 2, 3), (5, 3, 3), (5, 3, 2)}
    got = _collect(hierarchy.intersecting(_df(spark, [(5, 2, 2)]), tp2, tp1), "target_")
    assert got == {(5, 4, 4), (5, 5, 4), (5, 4, 5), (5, 5, 5)}
    # smaller -> bigger: projection
    got = _collect(hierarchy.intersecting(_df(spark, [(5, 1, 1)]), tp1, tp2), "target_")
    assert got == {(5, 0, 0)}
    got = _collect(hierarchy.intersecting(_df(spark, [(4, 12, 31)]), tp1, tp2), "target_")
    assert got == {(4, 6, 15)}
    # grid mismatch raises
    import pytest

    with pytest.raises(ValueError):
        hierarchy.intersecting(_df(spark, [(5, 1, 1)]), tp1, PyramidConfig.create("mercator"))


def test_intersecting_metatile_edge_clipping(spark):
    # mt=2 (0,0,0) -> mt=1 at z0: candidate subtiles (0,0),(0,1),(1,0),(1,1)
    # but z0 mt1 geodetic matrix is 1 row x 2 cols -> rows 1 dropped
    tp2 = PyramidConfig.create("geodetic", metatiling=2)
    tp1 = PyramidConfig.create("geodetic")
    got = _collect(hierarchy.intersecting(_df(spark, [(0, 0, 0)]), tp2, tp1), "target_")
    assert got == {(0, 0, 0), (0, 0, 1)}


def test_parent_rollup_aggregation(spark, geodetic):
    # zoom-up rollup: groupBy parent — the engine-side aggregation pattern
    df = _df(spark, [(9, 200, 200), (9, 201, 201), (9, 200, 201), (9, 10, 10)])
    rolled = (
        df.select(hierarchy.parent("zoom", "row", "col").alias("p"))
        .groupBy("p.zoom", "p.row", "p.col")
        .agg(F.count("*").alias("n"))
    )
    got = {(r["zoom"], r["row"], r["col"]): r["n"] for r in rolled.collect()}
    assert got == {(8, 100, 100): 3, (8, 5, 5): 1}
