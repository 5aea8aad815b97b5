"""Config-layer tests: mirrors of reference ``test_grids.py``,
``test_matrix_shapes.py``, ``test_dump_load.py`` and validation cases."""

import pytest

from tilematrix_spark.grid import GridConfig, PyramidConfig, validate_zoom

from .conftest import GRID_EPSG, GRID_IRREGULAR, GRID_PROJ


def test_init_builtin():
    for name in ("geodetic", "mercator"):
        assert PyramidConfig.create(name)
    with pytest.raises(ValueError):
        PyramidConfig.create("invalid")
    with pytest.raises(ValueError):
        PyramidConfig.create()


def test_metatiling_validation():
    for metatiling in (1, 2, 4, 8, 16):
        assert PyramidConfig.create("geodetic", metatiling=metatiling)
    with pytest.raises(ValueError):
        PyramidConfig.create("geodetic", metatiling=5)


def test_zoom_validation():
    with pytest.raises(TypeError):
        validate_zoom(5.0)
    with pytest.raises(ValueError):
        validate_zoom(-3)


def test_shape_bounds_mismatch():
    # reference test_grids.py:45-51
    with pytest.raises(ValueError):
        GridConfig.create(shape=(1, 1), bounds=(0, 0, 100, 200), srs={"epsg": 3857})
    with pytest.raises(TypeError):
        GridConfig.create(shape=(1,), bounds=(0, 0, 100, 100), srs={"epsg": 3857})
    with pytest.raises(TypeError):
        GridConfig.create(shape=(1, 1), bounds=(0, 100, 100), srs={"epsg": 3857})


def test_custom_grid_canonicalization():
    # a custom grid equal to a builtin is re-typed — reference _grid.py:39-42
    g = GridConfig.create(
        shape=(1, 2), bounds=(-180.0, -90.0, 180.0, 90.0), is_global=True,
        srs={"epsg": 4326},
    )
    assert g.type == "geodetic"


# matrix shape goldens — reference test_matrix_shapes.py:7-150
GEODETIC_MATRIX = {
    1: {0: (2, 1), 1: (4, 2), 2: (8, 4), 3: (16, 8), 4: (32, 16), 5: (64, 32), 6: (128, 64)},
    2: {0: (1, 1), 1: (2, 1), 2: (4, 2), 3: (8, 4), 4: (16, 8), 5: (32, 16), 6: (64, 32)},
    4: {0: (1, 1), 1: (1, 1), 2: (2, 1), 3: (4, 2), 4: (8, 4), 5: (16, 8), 6: (32, 16)},
    8: {0: (1, 1), 1: (1, 1), 2: (1, 1), 3: (2, 1), 4: (4, 2), 5: (8, 4), 6: (16, 8)},
    16: {0: (1, 1), 1: (1, 1), 2: (1, 1), 3: (1, 1), 4: (2, 1), 5: (4, 2), 6: (8, 4)},
}

MERCATOR_MATRIX = {
    1: {z: (2**z, 2**z) for z in range(7)},
    2: {0: (1, 1), 1: (1, 1), 2: (2, 2), 3: (4, 4), 4: (8, 8), 5: (16, 16), 6: (32, 32)},
    4: {0: (1, 1), 1: (1, 1), 2: (1, 1), 3: (2, 2), 4: (4, 4), 5: (8, 8), 6: (16, 16)},
    8: {0: (1, 1), 1: (1, 1), 2: (1, 1), 3: (1, 1), 4: (2, 2), 5: (4, 4), 6: (8, 8)},
    16: {0: (1, 1), 1: (1, 1), 2: (1, 1), 3: (1, 1), 4: (1, 1), 5: (2, 2), 6: (4, 4)},
}


@pytest.mark.parametrize("grid,golden", [("geodetic", GEODETIC_MATRIX), ("mercator", MERCATOR_MATRIX)])
def test_matrix_shapes_python(grid, golden):
    for mt, shapes in golden.items():
        tp = PyramidConfig.create(grid, metatiling=mt)
        for zoom, (w, h) in shapes.items():
            assert (tp.matrix_width(zoom), tp.matrix_height(zoom)) == (w, h)


def test_irregular_matrix_shapes():
    # reference test_grids.py:62-97: ceil(161/mt) x ceil(315/mt), square 10.0 px
    import math

    for mt in (1, 2, 4, 8):
        tp = PyramidConfig.create(GRID_IRREGULAR, metatiling=mt)
        assert tp.matrix_height(0) == math.ceil(161 / mt)
        assert tp.matrix_width(0) == math.ceil(315 / mt)
        assert tp.pixel_x_size(0) == 10.0
        assert tp.pixel_y_size(0) == 10.0


def test_pyramid_zoom0_bounds_equal_grid_bounds():
    # reference test_grids.py:33-42
    for grid in (GRID_PROJ, GRID_EPSG):
        tp = PyramidConfig.create(grid)
        b = tp.bounds
        # single zoom-0 tile spans the full grid
        assert tp.tile_x_size(0) == pytest.approx(b[2] - b[0])
        assert tp.tile_y_size(0) == pytest.approx(b[3] - b[1])


def test_dump_load_roundtrip():
    # reference test_dump_load.py:4-26
    for cfg in (
        PyramidConfig.create("geodetic", metatiling=2),
        PyramidConfig.create("mercator", metatiling=4),
        PyramidConfig.create(GRID_PROJ, metatiling=8),
        PyramidConfig.create(GRID_EPSG, tile_size=512),
        PyramidConfig.create(GRID_IRREGULAR),
    ):
        assert PyramidConfig.from_dict(cfg.to_dict()) == cfg
        assert PyramidConfig.from_json(cfg.to_json()) == cfg


def test_compare():
    # reference test_tilepyramid.py:78-127
    assert PyramidConfig.create("geodetic") == PyramidConfig.create("geodetic")
    assert PyramidConfig.create("geodetic") != PyramidConfig.create("geodetic", metatiling=2)
    assert PyramidConfig.create("geodetic") != PyramidConfig.create("geodetic", tile_size=512)
    assert PyramidConfig.create(GRID_PROJ).grid == PyramidConfig.create(GRID_PROJ, metatiling=2).grid
    altered = dict(GRID_PROJ, bounds=(-5000000.0, -5000000.0, 5000000.0, 5000000.0))
    assert PyramidConfig.create(GRID_PROJ).grid != PyramidConfig.create(altered).grid


def test_deprecated_scalar_surface():
    # reference test_tilepyramid.py:369-377
    tp = PyramidConfig.create("geodetic")
    assert tp.tile_x_size(0) == 180.0
    assert tp.tile_y_size(0) == 180.0
    assert tp.tile_height(0) == 256
    assert tp.tile_width(0) == 256
