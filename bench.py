"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall time of the headline suite; per-query seconds in
"queries".  Also reports rows/s throughput of the flagship tile-assignment
op and (with --scaling) the two-parallelism scaling-efficiency proxy
(local[8] vs local[32]) required by BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

HEADLINE = [
    "point_tile_counts",
    "parent_rollup",
    "cover_bbox",
    "neighbors",
    "knn",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash",
    "token_stats",
    "cosine_topk",
]


def make_spark(cpus: str) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"tilematrix_spark_bench_{cpus}")
        .config("spark.sql.shuffle.partitions", cpus if cpus != "*" else "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .getOrCreate()
    )


def run_suite(spark: SparkSession, sf_dir: str) -> dict:
    qs = entrymod.queries()
    timings = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        _ = n
    return timings


def flagship_throughput(spark: SparkSession, sf_dir: str) -> tuple[float, int]:
    """rows/s of the flagship point->tile assignment + salted count."""
    t0 = time.time()
    df = entrymod.q_point_tile_counts(spark, sf_dir)
    total = df.agg(F.sum("n")).collect()[0][0] or 0
    dt = time.time() - t0
    return total / dt if dt > 0 else 0.0, int(total)


def scaling_job(spark: SparkSession, sf_dir: str, multiplier: int = 50) -> tuple[float, int]:
    """The scaling-efficiency workload: events replicated ``multiplier``×
    with jittered coordinates -> z8 tile assignment -> salted per-tile
    counts.  Pure native ops; big enough to amortize job overhead so the
    local[8] vs local[32] ratio measures operator parallelism, not startup.
    """
    import __spark_entry__ as em
    from tilematrix_spark.operators import assign

    pts = em._events(spark, sf_dir)
    rep = pts.withColumn("_k", F.explode(F.sequence(F.lit(0), F.lit(multiplier - 1))))
    jitter = (F.col("_k") * F.lit(0.0001))
    rep = rep.withColumn("lon", F.col("lon") + jitter).withColumn("lat", F.greatest(F.col("lat") - jitter, F.lit(-90.0)))
    t0 = time.time()
    tiled = assign.with_tile(rep, em.GEODETIC, 8, "lon", "lat", out_tile_id=None)
    counts = assign.salted_agg(tiled, ["row", "col"], {"n": "count:*"}, salt_buckets=32)
    total = counts.agg(F.sum("n")).collect()[0][0] or 0
    dt = time.time() - t0
    return total / dt if dt > 0 else 0.0, int(total)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    do_scaling = "--scaling" in sys.argv

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    t_start = time.time()
    timings = run_suite(spark, sf_dir)
    rows_per_s, n_rows = flagship_throughput(spark, sf_dir)
    total = round(time.time() - t_start, 3)

    result = {
        "metric": "headline-suite wall time (tile assignment, covers, kNN, dedup, similarity)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "flagship_rows_per_sec": round(rows_per_s),
        "flagship_rows": n_rows,
        "cpus": cpus,
    }

    if do_scaling:
        spark.stop()
        effs = {}
        for c in ("8", "32"):
            s = make_spark(c)
            s.sparkContext.setLogLevel("ERROR")
            # warm-up then measure
            scaling_job(s, sf_dir, multiplier=5)
            rps, _ = scaling_job(s, sf_dir)
            effs[c] = rps
            s.stop()
        result["scaling"] = {
            "rows_per_sec_local8": round(effs["8"]),
            "rows_per_sec_local32": round(effs["32"]),
            "efficiency_8_to_32": round(effs["32"] / (4 * effs["8"]), 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
