"""spark-submit entry: checkpointed, resumable raster-pyramid overview
build — compose the images table onto base-zoom tiles, then downsample
level-by-level to min zoom (north_rule: "resume idempotently mid-pyramid
at any zoom level", here for the raster pyramid itself).

    tools/package.sh
    spark-submit --py-files dist/tilematrix_spark.zip \
        jobs/overview_job.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/overviews_out --base-zoom 5 --min-zoom 2 \
        [--n-images 2000] [--grid geodetic]

Each zoom commits atomically with lineage (rows counted during the write);
zoom z < base reads zoom z+1's COMMITTED output, so a crashed run resumes
at the first unbuilt level without recomputing finished ones.  Prints one
JSON line of per-zoom metrics.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from tilematrix_spark import images, raster
from tilematrix_spark.grid import PyramidConfig
from tilematrix_spark.io import PyramidJob


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="unused placeholder for parity with other jobs", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--base-zoom", type=int, default=5)
    p.add_argument("--min-zoom", type=int, default=2)
    p.add_argument("--n-images", type=int, default=2000)
    p.add_argument("--grid", default="geodetic")
    args = p.parse_args()
    if args.min_zoom >= args.base_zoom:
        raise SystemExit("--min-zoom must be below --base-zoom")

    spark = SparkSession.builder.appName("tilematrix_overview_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    tp = PyramidConfig.create(args.grid)

    job_holder = {}

    def build(s, zoom):
        if zoom == args.base_zoom:
            src = images.images_df(s, args.n_images, partitions=32)
            return raster.compose_tiles(src, tp, zoom)
        return raster.overview_level(job_holder["job"].read_zoom(zoom + 1))

    job = PyramidJob(spark, tp, args.output, build)
    job_holder["job"] = job
    zooms = list(range(args.base_zoom, args.min_zoom - 1, -1))
    executed = job.run(zooms)
    print(json.dumps({"executed_zooms": executed, "lineage": job.metrics()}, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
