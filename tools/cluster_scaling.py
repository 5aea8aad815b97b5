"""Multi-JVM scaling isolation experiment (VERDICT round-1 #8): run the
tile-assign scaling job on ``local-cluster[1,8,...]`` vs
``local-cluster[4,8,...]`` — real executor JVMs with separate heaps and
Arrow pipes, the closest one-box proxy to N vs 4N executors — and report
throughputs + efficiency next to the simultaneously measured spin control.

On one box both configurations share the same DRAM controllers, so a ratio
below the spin envelope isolates memory bandwidth (the resource a real 4x
cluster step multiplies) rather than engine structure; the per-round record
keeps that caveat evidence-based.

Usage: python tools/cluster_scaling.py [--job tile|pip|verify] [--rounds 2]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
        bench.verify_scaling_job(spark, 20_000)
        rate = max(bench.verify_scaling_job(spark, 200_000) for _ in range(2))
    else:
        bench.pip_scaling_job(spark, 1_000_000)
        rate = max(bench.pip_scaling_job(spark, 24_000_000) for _ in range(2))
    spark.stop()
    print(rate)


def main() -> None:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        _worker(sys.argv[i + 1], sys.argv[i + 2], sys.argv[i + 3])
        return
    job = sys.argv[sys.argv.index("--job") + 1] if "--job" in sys.argv else "tile"
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) if "--rounds" in sys.argv else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench

    # local-cluster[N, cores-per-executor, mem-MiB]: real separate executor
    # JVMs + python worker pools per executor, unlike local[K]'s single JVM
    masters = {
        "1x8": "local-cluster[1,8,6144]",
        "4x8": "local-cluster[4,8,6144]",
    }
    rates: dict[str, float] = {}
    for _ in range(rounds):
        for key, master in masters.items():
            time.sleep(5)
            out = subprocess.run(
                [sys.executable, __file__, "--worker", master, job, sf_dir],
                capture_output=True, text=True, check=True,
            ).stdout.strip().splitlines()[-1]
            rates[key] = max(rates.get(key, 0.0), float(out))
    env8 = bench.spin_control(8)
    env32 = bench.spin_control(32)
    print(json.dumps({
        "job": job,
        "rate_1x8": round(rates["1x8"]),
        "rate_4x8": round(rates["4x8"]),
        "efficiency_1x8_to_4x8": round(rates["4x8"] / (4 * rates["1x8"]), 3),
        "spin_control_efficiency_8_to_32": round(env32 / (4 * env8), 3),
    }))


if __name__ == "__main__":
    main()
