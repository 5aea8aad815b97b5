"""spark-submit entry: INCREMENTAL maintenance of a committed IVF-PQ index —
encode only the new vector batch against the FROZEN quantizers and append it
as an independently committed delta partition; probes read base ∪ committed
deltas.

    tools/package.sh
    spark-submit --py-files dist/tilematrix_spark.zip \
        jobs/ann_update_job.py \
        --index /tmp/ann_index \
        --updates /data/new_vectors.parquet --batch-id 7

The ANN mirror of incremental pyramid maintenance (incremental.py): the
expensive full-corpus pass happened ONCE at index-build time; each update
batch costs Θ(|batch|) — one cell assignment + one PQ encode over the new
rows only, never a re-encode of the committed corpus.  The coarse and
product quantizers are read from the index's committed ``centroids`` /
``codebooks`` stages and NEVER retrained on append (the standard IVF
discipline: retraining would silently re-map committed codes; quantizer
drift is a monitored rebuild trigger, not an append-path side effect).

Crash/replay discipline (same as streaming.incremental_tile_sink): each
batch writes to its own ``delta=batch_{id}`` directory (internally
partitioned by ``_cell`` like the base index, so probe reads stay
layout-pruned) and is committed by an atomic lineage marker AFTER the write.
``read_index`` unions the base with committed deltas ONLY — a crash between
write and commit leaves an orphan directory that is invisible to probes and
simply overwritten on replay; a committed batch is skipped on replay.  Both
replay paths are idempotent and exactly-once at the output level.

Prints one JSON line of batch metrics (rows, cells touched, wall seconds).
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tilematrix_spark.functions import similarity as sim
from tilematrix_spark.io import Lineage, LineageRecord, TableIO


def read_index(spark: SparkSession, index_path: str) -> DataFrame:
    """The probe-visible index: base ``stage=index`` ∪ every COMMITTED
    ``delta=batch_*`` (lineage-gated — orphan directories from a crash
    between write and commit are excluded, never half-read)."""
    io = TableIO(spark)
    df = io.read(os.path.join(index_path, "stage=index"))
    for unit in sorted(Lineage(index_path).committed()):
        if unit.startswith("delta="):
            df = df.unionByName(io.read(os.path.join(index_path, unit)))
    return df


def append_batch(
    spark: SparkSession,
    index_path: str,
    updates: DataFrame,
    batch_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Encode ``updates`` with the index's frozen quantizers and commit it
    as ``delta=batch_{batch_id}``.  Idempotent: an already-committed batch
    is skipped (rows=0, skipped=True); an uncommitted leftover from a crash
    is overwritten before the marker lands."""
    lineage = Lineage(index_path)
    unit = f"delta=batch_{batch_id}"
    done = lineage.committed()
    if unit in done:
        return {"unit": unit, "rows": done[unit]["rows"], "skipped": True}
    io = TableIO(spark)
    cents = sim.centroids_from_rows(io.read(os.path.join(index_path, "stage=centroids")))
    books = sim.codebooks_from_rows(io.read(os.path.join(index_path, "stage=codebooks")))
    t0 = time.time()
    cb = sim.with_ivf_cells(
        updates.select(F.col(id_col), F.col(vec_col).alias("_cv")),
        cents, 1, "_cv",
    ).select(id_col, "_cv", F.element_at("_cells", 1).alias("_cell"))
    encoded = sim.with_pq_codes(cb, books, "_cv").select(id_col, "_cell", "codes")
    rows = io.write_counted(
        encoded, os.path.join(index_path, unit), partition_by=["_cell"]
    )
    wall = round(time.time() - t0, 3)
    lineage.commit(
        LineageRecord(
            unit=unit,
            rows=rows,
            wall_s=wall,
            committed_at=time.time(),
            config={"batch_id": int(batch_id), "frozen_quantizers": True},
        )
    )
    return {"unit": unit, "rows": rows, "wall_s": wall, "skipped": False}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True, help="output dir of ann_index_job")
    p.add_argument("--updates", required=True, help="parquet of new vectors")
    p.add_argument("--batch-id", type=int, required=True)
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    args = p.parse_args()

    spark = SparkSession.builder.appName("tmx_ann_update_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    updates = spark.read.parquet(args.updates)
    metrics = append_batch(
        spark, args.index, updates, args.batch_id,
        id_col=args.id_col, vec_col=args.vec_col,
    )
    metrics["index_rows_visible"] = read_index(spark, args.index).count()
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
