"""Point-in-polygon join vs an independent brute-force oracle."""

import json

import numpy as np

from tilematrix_spark.operators import pip


def _polygons():
    # a triangle, a concave polygon, and a multipolygon
    tri = {"type": "Polygon", "coordinates": [[(0, 0), (30, 0), (15, 30), (0, 0)]]}
    concave = {
        "type": "Polygon",
        "coordinates": [[(-60, -30), (-20, -30), (-20, 10), (-40, -10), (-60, 10), (-60, -30)]],
    }
    multi = {
        "type": "MultiPolygon",
        "coordinates": [
            [[(100, 40), (120, 40), (120, 60), (100, 60), (100, 40)]],
            [[(130, -20), (150, -20), (150, 0), (130, 0), (130, -20)]],
        ],
    }
    return [(1, tri), (2, concave), (3, multi)]


def _brute_force_inside(poly, x, y):
    """Independent matplotlib-free PIP: winding via angle sum is slow; use a
    differently-structured crossing test (horizontal ray to the RIGHT,
    strict/non-strict flipped) to avoid sharing code with the engine."""
    def ring_crossings(ring, x, y):
        n = 0
        for (x0, y0), (x1, y1) in zip(ring[:-1], ring[1:]):
            if (y0 <= y < y1) or (y1 <= y < y0):
                t = (y - y0) / (y1 - y0)
                if x0 + t * (x1 - x0) > x:
                    n += 1
        return n

    total = 0
    coords = poly["coordinates"] if poly["type"] == "Polygon" else None
    parts = [poly["coordinates"]] if poly["type"] == "Polygon" else poly["coordinates"]
    inside = False
    for part in parts:
        c = 0
        for ring in part:
            r = list(ring)
            if r[0] != tuple(r[-1]) and list(r[0]) != list(r[-1]):
                r = r + [r[0]]
            c += ring_crossings(r, x, y)
        inside = inside or (c % 2 == 1)
    _ = (total, coords)
    return inside


def test_pip_join_matches_brute_force(spark, geodetic):
    rng = np.random.Generator(np.random.PCG64(5))
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        zip(rng.uniform(-179, 179, 400), rng.uniform(-89, 89, 400)))]
    points = spark.createDataFrame(pts, "point_id long, lon double, lat double")
    polys = spark.createDataFrame(
        [(pid, json.dumps(g)) for pid, g in _polygons()], "poly_id long, geometry string"
    )
    got = {
        (r["point_id"], r["poly_id"])
        for r in pip.pip_join(points, polys, geodetic, zoom=4).collect()
    }
    expected = set()
    for pid, g in _polygons():
        for i, x, y in pts:
            if _brute_force_inside(g, x, y):
                expected.add((i, pid))
    assert got == expected
    assert len(expected) > 10  # sanity: the polygons actually catch points


def test_pip_join_zoom_invariance(spark, geodetic):
    rng = np.random.Generator(np.random.PCG64(6))
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        zip(rng.uniform(-80, 150, 150), rng.uniform(-40, 70, 150)))]
    points = spark.createDataFrame(pts, "point_id long, lon double, lat double")
    polys = spark.createDataFrame(
        [(pid, json.dumps(g)) for pid, g in _polygons()], "poly_id long, geometry string"
    )
    results = [
        {(r["point_id"], r["poly_id"]) for r in pip.pip_join(points, polys, geodetic, zoom=z).collect()}
        for z in (2, 5, 7)
    ]
    assert results[0] == results[1] == results[2]


def test_pip_join_fused_matches_default(spark, geodetic):
    """The fused map-side-join path (broadcast tile->poly index + single
    Arrow pass) must produce exactly the default join-then-refine pairs."""
    rng = np.random.Generator(np.random.PCG64(7))
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        zip(rng.uniform(-179, 179, 300), rng.uniform(-89, 89, 300)))]
    # boundary / grid-line coords: tile-index edge semantics must agree
    # between the JVM path and the fused kernel's numpy mirror
    pts += [(1000 + j, x, y) for j, (x, y) in enumerate(
        [(180.0, 10.0), (-180.0, 10.0), (10.0, 90.0), (10.0, -90.0),
         (0.0, 0.0), (101.25, 33.75), (179.99999, -89.99999)])]
    points = spark.createDataFrame(pts, "point_id long, lon double, lat double")
    polys = spark.createDataFrame(
        [(pid, json.dumps(g)) for pid, g in _polygons()], "poly_id long, geometry string"
    )
    default = {(r["point_id"], r["poly_id"])
               for r in pip.pip_join(points, polys, geodetic, zoom=4).collect()}
    fused = {(r["point_id"], r["poly_id"])
             for r in pip.pip_join(points, polys, geodetic, zoom=4, fused=True).collect()}
    assert fused == default
    assert len(default) > 5


def test_local_cover_mirror_matches_spark_cover(spark, geodetic):
    """The fused path's driver-side cover mirror must equal the Spark
    tiles_from_geom operator tile-for-tile, incl. antimeridian crossers
    and the Point fast path."""
    from tilematrix_spark import geomkernels
    from tilematrix_spark.operators.geometry import tiles_from_geom

    geoms = [g for _, g in _polygons()]
    geoms.append({"type": "Polygon", "coordinates": [[
        (170.0, -10.0), (190.0, -10.0), (190.0, 20.0), (170.0, 20.0), (170.0, -10.0)]]})
    geoms.append({"type": "Polygon", "coordinates": [[
        (-195.0, 30.0), (-175.0, 30.0), (-175.0, 44.0), (-195.0, 44.0), (-195.0, 30.0)]]})
    geoms.append({"type": "Point", "coordinates": (12.3, 45.6)})
    df = spark.createDataFrame(
        [(i, json.dumps(g)) for i, g in enumerate(geoms)], "gid long, geometry string"
    )
    for zoom in (2, 4, 6):
        got_spark = {}
        for r in tiles_from_geom(df, geodetic, zoom).collect():
            got_spark.setdefault(r["gid"], set()).add((r["row"], r["col"]))
        for i, g in enumerate(geoms):
            parsed = geomkernels.parse_geometry(json.dumps(g))
            local = set(pip._local_cover_tiles(geodetic, zoom, parsed, None))
            assert local == got_spark.get(i, set()), (i, zoom)


def test_grid_prepared_parity_fuzz():
    """Grid-accelerated ray-cast must be BIT-identical to the full scan:
    random wobbly polygons (holes, multiparts), points including exact
    vertices and band-boundary y-values."""
    import math

    import numpy as np

    rng = np.random.default_rng(7)
    for trial in range(25):
        nv = int(rng.integers(5, 250))
        cx, cy = rng.uniform(-150, 150), rng.uniform(-60, 60)
        ang = np.linspace(0, 2 * math.pi, nv, endpoint=False)
        r = rng.uniform(1, 20) * (0.5 + rng.random(nv))
        ring = [
            [float(cx + r[i] * math.cos(ang[i])), float(cy + r[i] * math.sin(ang[i]))]
            for i in range(nv)
        ]
        ring.append(ring[0])
        coords = [ring]
        if trial % 3 == 0:  # hole
            hole = [[cx + (p[0] - cx) * 0.3, cy + (p[1] - cy) * 0.3] for p in ring]
            coords.append(hole)
        geom = {"type": "Polygon", "coordinates": coords}
        if trial % 5 == 0:
            geom = {"type": "MultiPolygon", "coordinates": [coords, [[
                [cx + 30, cy], [cx + 33, cy + 1], [cx + 31, cy + 4], [cx + 30, cy]]]]}
        n = 3000
        xs = rng.uniform(cx - 25, cx + 25, n)
        ys = rng.uniform(cy - 25, cy + 25, n)
        xs[:nv] = [p[0] for p in ring[:-1]]
        ys[:nv] = [p[1] for p in ring[:-1]]
        # exact band-boundary y values (the 1-ulp nudge path)
        prep_g = pip._prepare_parts_grid(geom)
        if prep_g:
            gx0, gx1, gy0, gy1 = prep_g[0]["bbox"]
            g, dy, _ = prep_g[0]["levels"][0]
            m = min(g, 50)
            ys[nv:nv + m] = [gy1 - j * dy for j in range(m)]
        a = pip._points_in_prepared(pip._prepare_parts(geom), xs, ys)
        b = pip._points_in_prepared_grid(prep_g, xs, ys)
        assert np.array_equal(a, b), trial
