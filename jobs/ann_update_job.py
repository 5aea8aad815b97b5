"""spark-submit entry: INCREMENTAL maintenance of a committed IVF-PQ index —
encode only the new vector batch against the FROZEN quantizers and append it
as an independently committed delta partition; probes read base ∪ committed
deltas.

    tools/package.sh
    spark-submit --py-files dist/tilematrix_spark.zip \
        jobs/ann_update_job.py \
        --index /tmp/ann_index \
        --updates /data/new_vectors.parquet --batch-id 7

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
    p.add_argument("--updates", required=True, help="parquet of new vectors")
    p.add_argument("--batch-id", type=int, required=True)
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--namespace", default="batch")
    args = p.parse_args()

    spark = SparkSession.builder.appName("tmx_ann_update_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
