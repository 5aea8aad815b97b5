"""Point-assignment, salted aggregation, and kNN join vs brute-force oracle."""

from pyspark.sql import functions as F

from tilematrix_spark.operators import assign, hierarchy, knn


def _points_df(spark, n, seed_tag="p"):
    # deterministic low-discrepancy scatter (golden-ratio lattice)
    # R2 low-discrepancy pair (golden-ratio pair is collinear mod 1)
    phi1, phi2 = 0.7548776662466927, 0.5698402909980532
    # start at 1: i=0 lands exactly on (-180,-90) where on_edge_use="rb"
    # yields an invalid tile (the reference raises there as well)
    rows = [
        (i, -180.0 + ((i * phi1) % 1.0) * 360.0, -90.0 + ((i * phi2) % 1.0) * 180.0)
        for i in range(1, n + 1)
    ]
    return spark.createDataFrame(rows, f"{seed_tag}id long, lon double, lat double")


def test_with_tile_basic(spark, geodetic):
    df = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, -300.0, 0.0)], "id int, lon double, lat double"
    )
    out = assign.with_tile(df, geodetic, 5)
    got = {(r["id"], r["row"], r["col"]) for r in out.collect()}
    assert got == {(1, 15, 32)}  # out-of-grid row dropped
    kept = assign.with_tile(df, geodetic, 5, keep_invalid=True)
    assert kept.count() == 2


def test_salted_agg_matches_plain(spark, geodetic):
    df = _points_df(spark, 2000)
    tiled = assign.with_tile(df, geodetic, 2, "lon", "lat")
    plain = {
        (r["row"], r["col"]): r["n"]
        for r in tiled.groupBy("row", "col").agg(F.count("*").alias("n")).collect()
    }
    salted = {
        (r["row"], r["col"]): r["n"]
        for r in assign.salted_agg(tiled, ["row", "col"], {"n": "count:*"}, 8).collect()
    }
    assert salted == plain
    # sum/min/max decomposition
    plain2 = tiled.groupBy("row", "col").agg(
        F.sum("lon").alias("s"), F.min("lat").alias("mn"), F.max("lat").alias("mx")
    )
    salted2 = assign.salted_agg(
        tiled, ["row", "col"], {"s": "sum:lon", "mn": "min:lat", "mx": "max:lat"}, 8
    )
    p = {(r["row"], r["col"]): (r["mn"], r["mx"]) for r in plain2.collect()}
    s = {(r["row"], r["col"]): (r["mn"], r["mx"]) for r in salted2.collect()}
    assert p == s


def test_tile_histogram_total(spark, geodetic):
    df = _points_df(spark, 500)
    hist = assign.tile_histogram(df, geodetic, 3, salt_buckets=4)
    assert hist.agg(F.sum("n")).collect()[0][0] == 500


def test_zoom_rollup(spark, geodetic):
    df = _points_df(spark, 500)
    tiled = assign.with_tile(df, geodetic, 6)
    counts = tiled.groupBy("row", "col").agg(F.count("*").alias("n"))
    rolled = assign.zoom_rollup(counts, 6, 0)
    per_zoom = {
        r["zoom"]: r["total"]
        for r in rolled.groupBy("zoom").agg(F.sum("n").alias("total")).collect()
    }
    assert per_zoom == {z: 500 for z in range(0, 7)}
    # zoom 0 rows equal the number of distinct zoom-0 tiles touched (<=2)
    assert rolled.filter("zoom = 0").count() <= 2


def test_disc_tiles_matches_k_ring(spark, geodetic):
    df = spark.createDataFrame([(8, 100, 100), (3, 1, 0)], "zoom int, row long, col long")
    for radius in (1, 2):
        a = {
            (r["zoom"], r["row"], r["col"], r["ring_row"], r["ring_col"])
            for r in hierarchy.disc_tiles(df, geodetic, radius).collect()
        }
        b = {
            (r["zoom"], r["row"], r["col"], r["ring_row"], r["ring_col"])
            for r in hierarchy.k_ring(df, geodetic, k=radius, include_center=True).select(
                "zoom", "row", "col", "ring_row", "ring_col"
            ).collect()
        }
        assert a == b


def test_knn_matches_brute_force(spark, geodetic):
    queries = _points_df(spark, 23, "q").withColumnRenamed("qid", "qid")
    points = _points_df(spark, 400, "p").withColumnRenamed("pid", "pid")
    got = knn.knn_join(queries, points, geodetic, zoom=4, k=3, query_id="qid", point_id="pid")
    oracle = knn.knn_brute_force(queries, points, geodetic, k=3, query_id="qid", point_id="pid")
    g = {(r["qid"], r["rank"]): r["pid"] for r in got.collect()}
    o = {(r["qid"], r["rank"]): r["pid"] for r in oracle.collect()}
    assert g == o


def test_knn_sparse_points(spark, geodetic):
    # fewer points than k and far away: expansion must terminate and return all
    queries = _points_df(spark, 3, "q")
    points = spark.createDataFrame(
        [(0, 10.0, 10.0), (1, -120.0, 45.0)], "pid long, lon double, lat double"
    )
    got = knn.knn_join(queries, points, geodetic, zoom=5, k=5, query_id="qid", point_id="pid")
    oracle = knn.knn_brute_force(queries, points, geodetic, k=5, query_id="qid", point_id="pid")
    g = {(r["qid"], r["rank"]): r["pid"] for r in got.collect()}
    o = {(r["qid"], r["rank"]): r["pid"] for r in oracle.collect()}
    assert g == o
