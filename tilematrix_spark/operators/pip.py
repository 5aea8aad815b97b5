"""Point-in-polygon join: assign point rows (image centroids) to the polygon
regions containing them, using the tile pyramid as the spatial index.

This is the engine's general spatial equi-join pattern (north_star:
"point-in-polygon assignment … via per-partition prepared-geometry PIP"):

1. polygons → their covering tiles at ``zoom`` (filter-refine cover,
   operators/geometry.py) → a (tile → poly) index, broadcast when small;
2. points → their tile (native O18 projection);
3. equi-join on (row, col) — co-located, no theta-join;
4. exact refine per (point, polygon) pair: vectorized even-odd ray-cast,
   geometry parsed once per polygon per batch (the prepared-geometry
   amortization), executed in Arrow batches.

Index zoom trades candidate precision against index size: cells ≈
polygon_area / tile_area; pick zoom so the average polygon covers 4-64
tiles.  Skew (a polygon covering a hot tile with millions of points) is
bounded by the tile granularity itself; AQE skew-split is the backstop.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import geomkernels
from ..grid import PyramidConfig
from . import assign
from .geometry import tiles_from_geom


def _points_in_polygon(geom: dict, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Even-odd ray-cast of many points against one (multi)polygon.
    Interior semantics; boundary points follow ray-cast parity (documented)."""
    inside = np.zeros(len(xs), dtype=bool)
    for kind, coords in geomkernels._iter_parts(geom):
        if kind != "polygon":
            continue
        part_inside = np.zeros(len(xs), dtype=bool)
        for ring in coords:
            arr = geomkernels._close_ring(ring)
            rx, ry = arr[:, 0], arr[:, 1]
            for j in range(len(arr) - 1):
                cond = (ry[j] > ys) != (ry[j + 1] > ys)
                if not np.any(cond):
                    continue
                xint = rx[j] + (ys - ry[j]) * (rx[j + 1] - rx[j]) / (ry[j + 1] - ry[j])
                part_inside ^= cond & (xs < xint)
        inside |= part_inside
    return inside


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    tp: PyramidConfig,
    zoom: int,
    point_id: str = "point_id",
    poly_id: str = "poly_id",
    x: str = "lon",
    y: str = "lat",
    geom: str = "geometry",
    broadcast_index: bool = True,
    max_cover_tiles: Optional[int] = None,
) -> DataFrame:
    """(point_id, poly_id) pairs where the point falls inside the polygon."""
    # 1. polygon -> covering tiles (filter-refine; exact candidate superset)
    idx = tiles_from_geom(
        polygons.select(poly_id, geom), tp, zoom, geom=geom,
        max_cover_tiles=max_cover_tiles,
    ).select(poly_id, geom, "row", "col")
    if broadcast_index:
        idx = F.broadcast(idx)

    # 2. point -> tile
    pts = assign.with_tile(
        points.select(point_id, x, y), tp, zoom, x, y, out_tile_id=None
    )

    # 3. co-located equi-join on the tile key
    cand = pts.join(idx, ["row", "col"], "inner").select(point_id, poly_id, x, y, geom)

    # 4. exact PIP refine, geometry parsed once per batch
    schema = cand.schema

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            xs = pdf[x].to_numpy(dtype=np.float64)
            ys = pdf[y].to_numpy(dtype=np.float64)
            for g_str, idx_pos in pd.Series(range(len(pdf))).groupby(
                pdf[geom].values, sort=False
            ):
                g = cache.get(g_str)
                if g is None:
                    g = geomkernels.parse_geometry(g_str)
                    if len(cache) > 64:
                        cache.clear()
                    cache[g_str] = g
                ii = idx_pos.to_numpy()
                keep[ii] = _points_in_polygon(g, xs[ii], ys[ii])
            yield pdf[keep]

    return cand.mapInPandas(refine, schema=schema).select(point_id, poly_id)
