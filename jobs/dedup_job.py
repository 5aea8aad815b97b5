"""spark-submit entry: checkpointed, resumable near-dup dedup pipeline over
a documents table — the training-data chain pairs → clusters → survivors.

    tools/package.sh
    spark-submit --py-files dist/tilematrix_spark.zip \
        jobs/dedup_job.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/dedup_out [--threshold 0.5]

Stages (each committed atomically with row-count/latency lineage; rerunning
resumes at the first uncommitted stage):
  1. pairs      — MinHash-LSH blocking + exact Jaccard verification
  2. clusters   — connected components of the pair graph (frontier delta
                  label propagation + pointer jumping)
  3. survivors  — one keeper per cluster anti-joined back onto the corpus

Prints one JSON line of per-stage metrics.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from tilematrix_spark.functions import dedup
from tilematrix_spark.io import StageJob


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--num-hashes", type=int, default=16)
    p.add_argument("--bands", type=int, default=8)
    args = p.parse_args()

    spark = SparkSession.builder.appName("tmx_dedup_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(args.input)

    def build_pairs(s, read_stage):
        return dedup.minhash_verified_pairs(
            docs, id_col=args.id_col, text_col=args.text_col,
            num_hashes=args.num_hashes, bands=args.bands,
            threshold=args.threshold,
        )

    def build_clusters(s, read_stage):
        return dedup.connected_components(read_stage("pairs"))

    def build_survivors(s, read_stage):
        return dedup.dedup_cluster_survivors(
            docs, read_stage("clusters"), id_col=args.id_col
        )

    job = StageJob(
        spark,
        args.output,
        [
            ("pairs", build_pairs),
            ("clusters", build_clusters),
            ("survivors", build_survivors),
        ],
        config={
            "threshold": args.threshold,
            "num_hashes": args.num_hashes,
            "bands": args.bands,
        },
    )
    executed = job.run()
    print(json.dumps({"executed": executed, "metrics": job.metrics()}, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
