"""Local mimic of the driver's correctness gate: run every queries() entry in
Spark AND its oracle_sql() in DuckDB at a given sf, compare row count, schema
shape, and an order-insensitive value multiset.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, list):
        return tuple(norm_val(x) for x in v)
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(norm_val(v) for v in row) for row in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle ({len(srows)} rows)")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = [tuple(norm_val(v) for v in row) for row in res.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} != {ocols}")
            failures.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(orows)}")
            failures.append(name)
            continue
        s_sorted = sorted(srows, key=repr)
        o_sorted = sorted(orows, key=repr)
        if s_sorted != o_sorted:
            diff_s = [r for r in s_sorted if r not in set(o_sorted)][:3]
            diff_o = [r for r in o_sorted if r not in set(s_sorted)][:3]
            print(f"FAIL {name}: values differ; spark-only={diff_s} oracle-only={diff_o}")
            failures.append(name)
            continue
        print(f"OK   {name}: {len(srows)} rows ({dt:.1f}s)")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
