"""spark-submit entry: checkpointed, resumable per-zoom tile-histogram
pyramid build over a point table (north_rule execution shape).

    tools/package.sh
    spark-submit --py-files dist/tilematrix_spark.zip \
        jobs/assign_pyramid_job.py \
        --input /root/testdata/sf0.01/events.parquet \
        --output /tmp/pyramid_out --zooms 0-6 [--grid geodetic]

Derives lon/lat deterministically when absent (events table), assigns tiles
per zoom, writes per-zoom parquet with atomic lineage commits; rerunning
resumes mid-pyramid (already-committed zooms are skipped).  Prints one JSON
line of per-zoom metrics.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tilematrix_spark.grid import PyramidConfig
from tilematrix_spark.io import PyramidJob
from tilematrix_spark.operators import assign

PHI1 = 0.7548776662466927
PHI2 = 0.5698402909980532


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--zooms", default="0-6")
    p.add_argument("--grid", default="geodetic")
    p.add_argument("--x", default="lon")
    p.add_argument("--y", default="lat")
    p.add_argument(
        "--bands", type=int, default=1,
        help="per-zoom checkpoint bands (mid-zoom resume granularity)",
    )
    p.add_argument(
        "--z-order", action="store_true",
        help="cluster each zoom's output on the Morton curve before writing "
             "(spatially adjacent tiles share files -> bbox min-max pruning)",
    )
    args = p.parse_args()
    lo, _, hi = args.zooms.partition("-")
    zooms = list(range(int(lo), int(hi or lo) + 1))

    spark = SparkSession.builder.appName("tilematrix_pyramid_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    tp = PyramidConfig.create(args.grid)

    src = spark.read.parquet(args.input)
    if args.x not in src.columns:
        key = src.columns[0]
        src = src.withColumn(
            args.x, F.lit(-180.0) + (F.col(key) * F.lit(PHI1)) % F.lit(1.0) * F.lit(360.0)
        ).withColumn(
            args.y, F.lit(-90.0) + (F.col(key) * F.lit(PHI2)) % F.lit(1.0) * F.lit(180.0)
        )
    src = src.persist()

    def build(s, zoom):
        df = assign.tile_histogram(src, tp, zoom, args.x, args.y)
        if args.z_order:
            from tilematrix_spark.operators import cover

            df = cover.batch_z_order(df)
        return df

    job = PyramidJob(
        spark, tp, args.output, build,
        bands=args.bands, band_col="row" if args.bands > 1 else None,
    )
    executed = job.run(zooms)
    print(json.dumps({"executed_zooms": executed, "lineage": job.metrics()}, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
