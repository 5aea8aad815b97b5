"""Multi-JVM scaling isolation experiment (VERDICT round-1 #8, round-4 #4):
run scaling jobs on ``local-cluster[1,8,...]`` vs ``local-cluster[4,8,...]``
— real separate executor JVMs with their own heaps, python worker pools and
Arrow pipes, the closest one-box proxy to N vs 4N executors — and report
throughputs + efficiency, each measurement carrying the spin-control host
envelope taken immediately before it (the CLAUDE.md drift discipline: this
box swings ±30% under sustained load, so a ratio is only interpretable
against the simultaneously measured hardware ceiling).

On one box both configurations share the same DRAM controllers, so a ratio
below the spin envelope isolates memory bandwidth (the resource a real 4x
cluster step multiplies) rather than engine structure; the per-round record
keeps that caveat evidence-based.

Usage: python tools/cluster_scaling.py [--jobs tile,pip] [--rounds 2]
Prints one JSON line.  ``bench.py`` imports ``run`` and attaches the result
as the ``scaling.cluster`` block of its per-round JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def masters(threads: int = 8) -> dict:
    """1-executor vs 4-executor masters at a fixed threads-per-executor.
    ``threads=8`` (default, the bench.py block) uses all 32 cores at 4N;
    ``threads=4`` keeps the 4N leg at 16 cores — BELOW this box's memory-
    bus saturation knee (tile_assign saturates at ~4 busy cores), so the
    executor-count lever is measured with less of the shared-DRAM term a
    real multi-node 4x step does not pay."""
    return {
        "1xT": f"local-cluster[1,{threads},6144]",
        "4xT": f"local-cluster[4,{threads},6144]",
    }


def _worker(master: str, job: str, sf_dir: str) -> None:
    from pyspark.sql import SparkSession

    import bench

    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_exec = int(master.split("[")[1].split(",")[0])
    spark = (
        SparkSession.builder.master(master)
        # executor JVMs spawn their own python workers, which do not inherit
        # the driver's sys.path: ship the repo root (pip/verify jobs run
        # tilematrix_spark Arrow kernels executor-side; tile is pure native)
        .config("spark.executorEnv.PYTHONPATH", repo)
        .appName(f"tmx_cluster_scaling_{n_exec}")
        .config("spark.sql.shuffle.partitions", str(8 * n_exec))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-bench"))
        .config("spark.executor.memory", "6g")
        .config("spark.driver.memory", "8g")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if job == "tile":
        bench.scaling_job(spark, sf_dir)  # JIT warm-up
        rate = max(bench.scaling_job(spark, sf_dir)[0] for _ in range(2))
    elif job == "verify":
        # generation staged to parquet OUTSIDE the timed region (bench.py
        # verify_scaling_job) — the timed kernel is scan + Arrow verify
        bench.verify_scaling_job(spark, 20_000)
        rate = max(bench.verify_scaling_job(spark, 200_000) for _ in range(2))
    elif job == "focal":
        # halo-exchange stencil: strips+plane exchange + Arrow assemble —
        # the Arrow/python side scales with executor JVM count.  ~650KB
        # canvas rows: cap Arrow batches by records (bench.py note)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
        bench.focal_scaling_job(spark, 12)
        rate = max(bench.focal_scaling_job(spark, 160) for _ in range(2))
    elif job == "cc":
        # cross-tile CCL: python CCL kernels per tile (per-JVM worker
        # lever) + iterative JVM label-propagation rounds; canvas rows ->
        # record-capped Arrow batches
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
        bench.cc_scaling_job(spark, 12)
        n_side = int(os.environ.get("TMX_CC_SIDE", "48"))
        rate = max(bench.cc_scaling_job(spark, n_side) for _ in range(2))
    elif job == "minhash":
        # JVM-native text pipeline (shingle explode + md5 signatures +
        # banded self-join): the executor lever is heap/shuffle/GC
        # parallelism, no Arrow transfer in the hot path
        n_docs = int(os.environ.get("TMX_MINHASH_DOCS", "600000"))
        bench.minhash_scaling_job(spark, 20_000)
        rate = max(bench.minhash_scaling_job(spark, n_docs) for _ in range(2))
    else:
        n_pts = int(os.environ.get("TMX_PIP_POINTS", "24000000"))
        bench.pip_scaling_job(spark, 1_000_000)
        rate = max(bench.pip_scaling_job(spark, n_pts) for _ in range(2))
    spark.stop()
    print(rate)


def run(jobs=("tile", "pip"), rounds: int = 2, sf_dir: str | None = None, threads: int = 8) -> dict:
    """Best-of-``rounds`` interleaved 1x8/4x8 measurements per job, each
    with the spin control taken immediately before the winning run.  Per
    job: r1x8/r4x8 (throughput), eff (r4x8 / 4·r1x8), env (the spin
    envelope at the two winning measurements — the ceiling ANY sustained
    job could reach between those windows)."""
    import bench

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out: dict = {}
    for job in jobs:
        rates: dict[str, float] = {}
        spins: dict[str, float] = {}
        for _ in range(rounds):
            for key, master in masters(threads).items():
                time.sleep(5)  # cooldown: turbo drift penalizes the last runner
                env = bench.spin_control(threads if key == "1xT" else 4 * threads, dur=3.0)
                rate = float(
                    subprocess.run(
                        [sys.executable, os.path.abspath(__file__),
                         "--worker", master, job, sf_dir],
                        capture_output=True, text=True, check=True,
                    ).stdout.strip().splitlines()[-1]
                )
                if rate > rates.get(key, 0.0):
                    rates[key] = rate
                    spins[key] = env
        # keys keep the r1x8/r4x8 names for the bench-line schema; at
        # threads != 8 they mean 1 vs 4 executors of `threads` threads each
        out[job] = {
            "r1x8": round(rates["1xT"]),
            "r4x8": round(rates["4xT"]),
            "eff": round(rates["4xT"] / (4 * rates["1xT"]), 3),
            "env": round(spins["4xT"] / (4 * spins["1xT"]), 3),
        }
        if threads != 8:
            out[job]["threads_per_executor"] = threads
    return out


def main() -> None:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        _worker(sys.argv[i + 1], sys.argv[i + 2], sys.argv[i + 3])
        return
    if "--job" in sys.argv:  # legacy single-job spelling
        jobs = [sys.argv[sys.argv.index("--job") + 1]]
    elif "--jobs" in sys.argv:
        jobs = sys.argv[sys.argv.index("--jobs") + 1].split(",")
    else:
        jobs = ["tile", "pip"]
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) if "--rounds" in sys.argv else 2
    threads = int(sys.argv[sys.argv.index("--threads") + 1]) if "--threads" in sys.argv else 8
    print(json.dumps({"cluster": run(tuple(jobs), rounds, threads=threads)}))


if __name__ == "__main__":
    main()
