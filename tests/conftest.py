"""Shared fixtures: one local SparkSession + pyramid configs transcribed from
the reference test suite (``/root/reference/test/conftest.py``)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from tilematrix_spark.grid import GridConfig, PyramidConfig


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("tilematrix_spark_tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def geodetic() -> PyramidConfig:
    return PyramidConfig.create("geodetic")


@pytest.fixture(scope="session")
def mercator() -> PyramidConfig:
    return PyramidConfig.create("mercator")


# custom grid via proj string — reference ``test/conftest.py:17-25``
GRID_PROJ = {
    "shape": (1, 1),
    "bounds": (-4000000.0, -4000000.0, 4000000.0, 4000000.0),
    "is_global": False,
    "srs": {"proj": "+proj=ortho +lat_0=-90 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +units=m +no_defs"},
}

# custom grid via EPSG — reference ``test/conftest.py:28-36``
GRID_EPSG = {
    "shape": (1, 1),
    "bounds": (2426378.0132, 1528101.2618, 6293974.6215, 5395697.8701),
    "is_global": False,
    "srs": {"epsg": 3035},
}

# irregular grid, square 10.0-unit pixels — reference ``test/conftest.py:86-92``
GRID_IRREGULAR = {
    "shape": (161, 315),
    "bounds": (141920.0, 89840.0, 948320.0, 502000.0),
    "is_global": False,
    "srs": {"epsg": 31259},
}


@pytest.fixture(scope="session")
def grid_proj() -> GridConfig:
    return GridConfig.create(GRID_PROJ)


@pytest.fixture(scope="session")
def grid_epsg() -> GridConfig:
    return GridConfig.create(GRID_EPSG)


@pytest.fixture(scope="session")
def grid_irregular() -> GridConfig:
    return GridConfig.create(GRID_IRREGULAR)


# geometry fixtures (GeoJSON-style dicts) — reference ``test/conftest.py:122-299``
TILE_BOUNDS_POLYGON = {
    "type": "Polygon",
    "coordinates": [
        [(0, 0), (0, 45), (22.5, 45), (22.5, 22.5), (45, 22.5), (45, 0), (0, 0)]
    ],
}

POLYGON = {
    "type": "Polygon",
    "coordinates": [
        [
            (8.219788038779399, 48.04680919045518),
            (8.553359409223447, 47.98081838641845),
            (9.41408206547689, 48.13835399026023),
            (10.71989383306024, 48.64871043557477),
            (11.683555942439085, 48.794127916044104),
            (12.032991977596737, 49.02749868427421),
            (8.219788038779399, 48.04680919045518),
        ]
    ],
}

LINESTRING = {
    "type": "LineString",
    "coordinates": [
        (8.219788038779399, 48.04680919045518),
        (8.553359409223447, 47.98081838641845),
        (9.41408206547689, 48.13835399026023),
        (10.71989383306024, 48.64871043557477),
        (11.683555942439085, 48.794127916044104),
        (12.032991977596737, 49.02749868427421),
    ],
}

MULTILINESTRING = {
    "type": "MultiLineString",
    "coordinates": [
        LINESTRING["coordinates"],
        [
            (33.206893344868945, 0.261534735511418),
            (33.18725630059802, 0.428191229652711),
            (32.8931140479927, 1.31144481038541),
            (32.80150465264725, 1.366544806316611),
            (32.62475833510098, 1.471712805584616),
            (32.51003665541302, 1.536754055177965),
            (32.36248752211165, 1.606878973798047),
        ],
    ],
}

MULTIPOLYGON = {
    "type": "MultiPolygon",
    "coordinates": [
        [list(POLYGON["coordinates"][0][:-1])],
        [list(MULTILINESTRING["coordinates"][1])],
    ],
}

MULTIPOINT = {
    "type": "MultiPoint",
    "coordinates": [
        (14.464033917048539, 50.08528287347832),
        (16.364693096743736, 48.20196113681686),
    ],
}
