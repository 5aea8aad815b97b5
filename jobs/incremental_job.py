"""spark-submit entry: incremental pyramid maintenance — apply an update
batch to a COMMITTED overview pyramid (the output of ``overview_job.py``)
by recomposing only the dirty tiles and propagating them up the chain.

    tools/package.sh
    spark-submit --py-files dist/tilematrix_spark.zip jobs/overview_job.py \
        --output /tmp/pyr --base-zoom 5 --min-zoom 2 --n-images 2000
    spark-submit --py-files dist/tilematrix_spark.zip jobs/incremental_job.py \
        --pyramid /tmp/pyr --output /tmp/pyr_delta \
        --base-zoom 5 --min-zoom 2 --n-images 2000 --n-updates 200

The update batch is the next ``--n-updates`` ids of the deterministic
images table (an append batch: corpus grows from n to n+u).  Each zoom's
DELTA (only the dirty keys' new canvases) commits atomically with lineage
on its own ``PyramidJob``; zoom z reads zoom z+1's COMMITTED delta plus
the base pyramid's committed level, so a crashed run resumes at the first
unbuilt level.  Prints one JSON line with per-zoom dirty counts and the
dirty fraction — the number that shows maintenance cost ∝ |updates|.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tilematrix_spark import images, incremental, raster
from tilematrix_spark.grid import PyramidConfig
from tilematrix_spark.io import PyramidJob


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pyramid", required=True, help="committed overview_job output")
    p.add_argument("--output", required=True, help="delta pyramid output")
    p.add_argument("--base-zoom", type=int, default=5)
    p.add_argument("--min-zoom", type=int, default=2)
    p.add_argument("--n-images", type=int, default=2000, help="old corpus size")
    p.add_argument("--n-updates", type=int, default=200)
    p.add_argument("--grid", default="geodetic")
    args = p.parse_args()
    if args.min_zoom >= args.base_zoom:
        raise SystemExit("--min-zoom must be below --base-zoom")

    spark = SparkSession.builder.appName("tilematrix_incremental_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    tp = PyramidConfig.create(args.grid)

    total = images.images_df(spark, args.n_images + args.n_updates, partitions=32)
    split_id = f"img{args.n_images:012d}"
    old = total.filter(F.col("image_id") < split_id)
    updates = total.filter(F.col("image_id") >= split_id)

    base = PyramidJob(spark, tp, args.pyramid, lambda s, z: None)  # read-only view
    holder = {}

    def build(s: SparkSession, zoom: int):
        if zoom == args.base_zoom:
            return incremental.incremental_compose(old, updates, tp, zoom)
        # committed base level + committed child DELTA -> current view
        current = incremental.merged_level(
            base.read_zoom(zoom + 1), holder["job"].read_zoom(zoom + 1)
        )
        dirty = holder["job"].read_zoom(zoom + 1).select("row", "col")
        return incremental.propagate_level(current, dirty)

    job = PyramidJob(spark, tp, args.output, build)
    holder["job"] = job
    zooms = list(range(args.base_zoom, args.min_zoom - 1, -1))
    executed = job.run(zooms)

    stats = {}
    for z in zooms:
        delta_keys = job.read_zoom(z).select("row", "col")
        base_keys = base.read_zoom(z).select("row", "col")
        n_dirty = delta_keys.count()
        n_committed = base_keys.count()
        # an append batch can CREATE tiles absent from the old pyramid —
        # count them apart and divide by the merged (committed ∪ delta)
        # level size, or dirty_fraction could exceed 1 on sparse pyramids
        n_new = delta_keys.join(base_keys, ["row", "col"], "left_anti").count()
        n_merged = n_committed + n_new
        stats[z] = {
            "dirty_tiles": n_dirty,
            "new_tiles": n_new,
            "committed_tiles": n_committed,
            "merged_tiles": n_merged,
            "dirty_fraction": round(n_dirty / max(n_merged, 1), 4),
        }
    print(
        json.dumps(
            {
                "executed_zooms": executed,
                "n_updates": args.n_updates,
                "levels": stats,
                "lineage": job.metrics(),
            },
            default=str,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
