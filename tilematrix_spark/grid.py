"""Driver-side grid / pyramid configuration.

Mirrors the reference's ``GridDefinition`` (``_grid.py:8-107``) and
``TilePyramid`` (``_tilepyramid.py:22-326``) value objects as frozen
dataclasses.  These live on the driver only; their scalars are captured into
native Column expressions (see :mod:`tilematrix_spark.exprs`), so executors
never see these objects — only folded double/int literals.

CRS handling: the reference treats CRS purely as a label + equality component
(``_grid.py:73-80``) — it never reprojects.  We store the srs dict verbatim.

All float arithmetic deliberately reproduces the reference's order of
operations (``_tilepyramid.py:142-166``, ``_funcs.py:240-251``) so doubles
match bit-for-bit.  The reference's ``ROUND = 20`` decimal rounding
(``_conf.py:4``) is a no-op for float64 (< 17 significant digits) and is
therefore omitted.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

#: aspect-ratio tolerance, reference ``_conf.py:7``
DELTA = 1e-6

#: built-in grids, reference ``_conf.py:10-28``
BUILTIN_GRIDS: Dict[str, Dict[str, Any]] = {
    "geodetic": {
        "shape": (1, 2),  # (height, width) at zoom 0
        "bounds": (-180.0, -90.0, 180.0, 90.0),
        "is_global": True,
        "srs": {"epsg": 4326},
    },
    "mercator": {
        "shape": (1, 1),
        "bounds": (
            -20037508.3427892,
            -20037508.3427892,
            20037508.3427892,
            20037508.3427892,
        ),
        "is_global": True,
        "srs": {"epsg": 3857},
    },
}

VALID_ON_EDGE_USE = ("lb", "rb", "rt", "lt")


def validate_zoom(zoom: int) -> None:
    """Reference ``_funcs.py:15-19``."""
    if isinstance(zoom, bool) or not isinstance(zoom, int):
        raise TypeError("zoom must be an integer")
    if zoom < 0:
        raise ValueError("zoom must be greater or equal 0")


def _verify_shape_bounds(shape: Tuple[int, int], bounds: Tuple[float, ...]) -> None:
    """Aspect-ratio check guaranteeing square pixels — reference ``_funcs.py:86-116``."""
    if not isinstance(shape, (tuple, list)) or len(shape) != 2:
        raise TypeError(f"shape must be a tuple or list with two elements: {shape}")
    if not isinstance(bounds, (tuple, list)) or len(bounds) != 4:
        raise TypeError(f"bounds must be a tuple or list with four elements: {bounds}")
    height, width = shape
    left, bottom, right, top = bounds
    shape_ratio = width / height
    bounds_ratio = (right - left) / (top - bottom)
    if abs(shape_ratio - bounds_ratio) > DELTA:
        min_length = min((right - left) / width, (top - bottom) / height)
        proposed = (left, bottom, left + width * min_length, bottom + height * min_length)
        raise ValueError(
            f"shape ratio ({shape_ratio}) must equal bounds ratio ({bounds_ratio}); "
            f"try {proposed}"
        )


def _normalize_srs(srs: Any) -> Dict[str, Any]:
    """CRS is metadata only (no reprojection anywhere in the reference —
    ``_funcs.py:119-129`` merely parses it).  Keep the dict; canonicalize key."""
    if not isinstance(srs, dict):
        raise TypeError("'srs' must be a dictionary")
    for key in ("wkt", "epsg", "proj"):
        if key in srs:
            return {key: srs[key]}
    raise TypeError("provide either 'wkt', 'epsg' or 'proj' definition")


@dataclass(frozen=True)
class GridConfig:
    """Zoom-0 grid definition — reference ``GridDefinition`` (``_grid.py:8-107``).

    ``shape`` is (height, width), height-first per reference ``_types.py:4``.
    """

    type: str
    shape: Tuple[int, int]
    bounds: Tuple[float, float, float, float]
    is_global: bool
    srs: Dict[str, Any] = field(default_factory=dict)

    # -- constructors -----------------------------------------------------
    @staticmethod
    def create(
        grid: Any = None,
        shape: Optional[Tuple[int, int]] = None,
        bounds: Optional[Tuple[float, float, float, float]] = None,
        srs: Optional[Dict[str, Any]] = None,
        is_global: bool = False,
        **kwargs: Any,
    ) -> "GridConfig":
        """Polymorphic constructor mirroring ``GridDefinition.__init__``
        (``_grid.py:11-54``) incl. canonicalization of a custom grid equal to
        a builtin (``_grid.py:39-42``) and deprecated ``proj=``/``epsg=``
        kwargs (``_grid.py:22-30``)."""
        if isinstance(grid, GridConfig):
            return grid
        if isinstance(grid, str) and grid in BUILTIN_GRIDS:
            p = BUILTIN_GRIDS[grid]
            return GridConfig(
                type=grid,
                shape=tuple(p["shape"]),
                bounds=tuple(float(v) for v in p["bounds"]),
                is_global=p["is_global"],
                srs=dict(p["srs"]),
            )
        if isinstance(grid, dict):
            g = dict(grid)
            if "type" in g and "grid" not in g:
                g["grid"] = g.pop("type")
            return GridConfig.create(**g)
        if grid is None or grid == "custom":
            for key in ("proj", "epsg"):
                if key in kwargs and srs is None:
                    srs = {key: kwargs[key]}
            if shape is None or bounds is None:
                raise ValueError("custom grid requires shape and bounds")
            _verify_shape_bounds(tuple(shape), tuple(bounds))
            out = GridConfig(
                type="custom",
                shape=tuple(int(v) for v in shape),
                bounds=tuple(float(v) for v in bounds),
                is_global=bool(is_global),
                srs=_normalize_srs(srs) if srs is not None else {},
            )
            # canonicalize: a custom grid identical to a builtin is re-typed
            for name in BUILTIN_GRIDS:
                builtin = GridConfig.create(name)
                if (
                    out.shape == builtin.shape
                    and out.bounds == builtin.bounds
                    and out.is_global == builtin.is_global
                    and out.srs == builtin.srs
                ):
                    out = GridConfig(
                        type=name,
                        shape=out.shape,
                        bounds=out.bounds,
                        is_global=out.is_global,
                        srs=out.srs,
                    )
            return out
        raise ValueError(f"invalid grid definition: {grid}")

    # -- accessors --------------------------------------------------------
    @property
    def left(self) -> float:
        return self.bounds[0]

    @property
    def bottom(self) -> float:
        return self.bounds[1]

    @property
    def right(self) -> float:
        return self.bounds[2]

    @property
    def top(self) -> float:
        return self.bounds[3]

    @property
    def height(self) -> int:
        return self.shape[0]

    @property
    def width(self) -> int:
        return self.shape[1]

    # -- serialization: reference ``_grid.py:61-71`` ----------------------
    def to_dict(self) -> Dict[str, Any]:
        return {
            "bounds": list(self.bounds),
            "is_global": self.is_global,
            "shape": list(self.shape),
            "srs": dict(self.srs),
            "grid": self.type,
        }

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "GridConfig":
        return GridConfig.create(**d)


GEODETIC = GridConfig.create("geodetic")
MERCATOR = GridConfig.create("mercator")

_METATILING_OPTS = tuple(2**x for x in range(10))


@dataclass(frozen=True)
class PyramidConfig:
    """Tile pyramid = grid + tile_size(px) + metatiling — reference
    ``TilePyramid`` (``_tilepyramid.py:37-56``).

    Driver-side only.  The per-zoom scalar methods below are pure-Python
    mirrors of the reference formulas; :mod:`tilematrix_spark.exprs` builds
    the identical arithmetic as Spark Columns for batched execution.
    """

    grid: GridConfig
    tile_size: int = 256
    metatiling: int = 1

    def __post_init__(self) -> None:
        if self.metatiling not in _METATILING_OPTS:
            raise ValueError(f"metatling must be one of {list(_METATILING_OPTS)}")

    @staticmethod
    def create(grid: Any = None, tile_size: int = 256, metatiling: int = 1) -> "PyramidConfig":
        if grid is None:
            raise ValueError("grid definition required")
        return PyramidConfig(GridConfig.create(grid), tile_size, metatiling)

    # -- geometry scalars -------------------------------------------------
    @property
    def bounds(self) -> Tuple[float, float, float, float]:
        return self.grid.bounds

    @property
    def left(self) -> float:
        return self.grid.left

    @property
    def bottom(self) -> float:
        return self.grid.bottom

    @property
    def right(self) -> float:
        return self.grid.right

    @property
    def top(self) -> float:
        return self.grid.top

    @property
    def is_global(self) -> bool:
        return self.grid.is_global

    @property
    def metatile_size(self) -> int:
        return self.tile_size * self.metatiling

    @property
    def x_size(self) -> float:
        """Map-unit width — ``_tilepyramid.py:55``."""
        return float(self.right - self.left)

    @property
    def y_size(self) -> float:
        """Map-unit height — ``_tilepyramid.py:56``."""
        return float(self.top - self.bottom)

    # -- per-zoom scalars (pure mirrors of ``_tilepyramid.py:78-166``) ----
    def matrix_width(self, zoom: int) -> int:
        validate_zoom(zoom)
        width = int(math.ceil(self.grid.width * 2**zoom / self.metatiling))
        return max(1, width)

    def matrix_height(self, zoom: int) -> int:
        validate_zoom(zoom)
        height = int(math.ceil(self.grid.height * 2**zoom / self.metatiling))
        return max(1, height)

    def pixel_x_size(self, zoom: int) -> float:
        validate_zoom(zoom)
        return (self.grid.right - self.grid.left) / (
            self.grid.width * 2**zoom * self.tile_size
        )

    def pixel_y_size(self, zoom: int) -> float:
        validate_zoom(zoom)
        return (self.grid.top - self.grid.bottom) / (
            self.grid.height * 2**zoom * self.tile_size
        )

    def tile_x_size(self, zoom: int) -> float:
        """Map-unit metatile width — the column quantum of ``_tile_from_xy``
        (``_funcs.py:248``): ``pixel_x_size * tile_size * metatiling``."""
        return self.pixel_x_size(zoom) * self.tile_size * self.metatiling

    def tile_y_size(self, zoom: int) -> float:
        """Map-unit metatile height — ``_funcs.py:242``."""
        return self.pixel_y_size(zoom) * self.tile_size * self.metatiling

    def tile_width(self, zoom: int) -> int:
        """Pixel width — ``_tilepyramid.py:118-128``."""
        validate_zoom(zoom)
        matrix_pixel = 2**zoom * self.tile_size * self.grid.width
        tile_pixel = self.tile_size * self.metatiling
        return matrix_pixel if tile_pixel > matrix_pixel else tile_pixel

    def tile_height(self, zoom: int) -> int:
        """Pixel height — ``_tilepyramid.py:130-140``."""
        validate_zoom(zoom)
        matrix_pixel = 2**zoom * self.tile_size * self.grid.height
        tile_pixel = self.tile_size * self.metatiling
        return matrix_pixel if tile_pixel > matrix_pixel else tile_pixel

    # -- serialization: reference ``_tilepyramid.py:291-305`` -------------
    def to_dict(self) -> Dict[str, Any]:
        return {
            "grid": self.grid.to_dict(),
            "metatiling": self.metatiling,
            "tile_size": self.tile_size,
        }

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "PyramidConfig":
        return PyramidConfig.create(**d)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "PyramidConfig":
        return PyramidConfig.from_dict(json.loads(s))
