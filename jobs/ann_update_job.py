"""spark-submit entry: INCREMENTAL maintenance of a committed IVF-PQ index —
encode only the new vector batch against the FROZEN quantizers and append it
as an independently committed delta partition; probes read base ∪ committed
deltas.

    tools/package.sh
    spark-submit --py-files dist/tilematrix_spark.zip \
        jobs/ann_update_job.py \
        --index /tmp/ann_index \
        --updates /data/new_vectors.parquet --batch-id 7

Maintenance verbs on the same lineage: ``--compact`` folds committed
deltas into one cell-partitioned generation (LSM bound on the union fan),
``--gc [--grace-s N]`` physically deletes units the lineage proves
unreadable (absorbed deltas / superseded generations older than the grace
window; markers stay as replay tokens).  Each append also records a
quantizer-drift metric (batch mean assigned-centroid similarity vs the
first batch's baseline) in its lineage config — the documented rebuild
trigger when the ratio decays.

Semantics, layout, and the exactly-once replay discipline live in
``tilematrix_spark.annstore`` (shared with the streaming sink
``streaming.incremental_ann_sink``); this is the batch CLI over it.
Prints one JSON line of batch metrics (rows, wall seconds, visible rows).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from tilematrix_spark import annstore


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True, help="output dir of ann_index_job")
    p.add_argument("--updates", help="parquet of new vectors (append mode)")
    p.add_argument("--batch-id", type=int, help="append mode batch id")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--namespace", default="batch")
    p.add_argument("--compact", action="store_true",
                   help="fold committed deltas into a new generation")
    p.add_argument("--gc", action="store_true",
                   help="delete lineage-proven-unreadable units")
    p.add_argument("--grace-s", type=float, default=3600.0,
                   help="gc: newest compaction must be at least this old")
    args = p.parse_args()
    if not (args.compact or args.gc) and (args.updates is None or args.batch_id is None):
        p.error("append mode requires --updates and --batch-id")

    spark = SparkSession.builder.appName("tmx_ann_update_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if args.compact:
        metrics = annstore.compact(spark, args.index)
    elif args.gc:
        metrics = annstore.gc(spark, args.index, grace_s=args.grace_s)
    else:
        updates = spark.read.parquet(args.updates)
        metrics = annstore.append_batch(
            spark, args.index, updates, args.batch_id,
            id_col=args.id_col, vec_col=args.vec_col, namespace=args.namespace,
        )
        metrics["index_rows_visible"] = annstore.read_index(spark, args.index).count()
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
