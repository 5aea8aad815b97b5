"""Storage + checkpointed, resumable job execution.

North-rule requirements: jobs "checkpoint per-partition progress … with
lineage + row-count/latency metrics, and resume idempotently mid-pyramid at
any zoom level".

``TableIO`` is a thin seam over the table format: Iceberg on a real cluster
(``format="iceberg"`` when the runtime jar is present), Parquet +
atomic-rename commit markers in this sandbox — same layout, same lineage
records either way.

``PyramidJob`` runs a per-zoom pipeline over the pyramid: each zoom level is
one unit of work whose output is written to ``out/zoom=Z/`` and whose
completion is committed by atomically renaming a lineage marker containing
row counts and wall-clock metrics.  Restart skips committed zooms (an
anti-join of the plan against the lineage), making the job idempotent: a
crashed run resumes mid-pyramid.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

from .grid import PyramidConfig


class TableIO:
    """Format seam: parquet now, iceberg when the runtime has the jar."""

    def __init__(self, spark: SparkSession, fmt: str = "parquet"):
        if fmt not in ("parquet", "iceberg"):
            raise ValueError("format must be parquet or iceberg")
        self.spark = spark
        self.fmt = fmt

    def write(self, df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: Optional[List[str]] = None) -> None:
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.format(self.fmt).save(path)

    def read(self, path: str) -> DataFrame:
        return self.spark.read.format(self.fmt).load(path)


@dataclass
class LineageRecord:
    unit: str
    rows: int
    wall_s: float
    committed_at: float
    config: Dict

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)


class Lineage:
    """Per-unit commit markers, written atomically (tmp + rename)."""

    def __init__(self, root: str):
        self.dir = os.path.join(root, "_lineage")
        os.makedirs(self.dir, exist_ok=True)

    def committed(self) -> Dict[str, dict]:
        out = {}
        for name in os.listdir(self.dir):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    rec = json.load(f)
                out[rec["unit"]] = rec
        return out

    def commit(self, rec: LineageRecord) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(rec.to_json())
        os.rename(tmp, os.path.join(self.dir, f"{rec.unit}.json"))


class PyramidJob:
    """Resumable per-zoom pipeline runner.

    ``build``: (spark, zoom) -> DataFrame for that zoom level.  Each zoom's
    output goes to ``{out}/zoom={z}/`` and is committed to lineage with
    metrics.  ``run`` returns the list of zooms actually executed (committed
    zooms are skipped — idempotent resume).
    """

    def __init__(
        self,
        spark: SparkSession,
        tp: PyramidConfig,
        out_path: str,
        build: Callable[[SparkSession, int], DataFrame],
        io: Optional[TableIO] = None,
    ):
        self.spark = spark
        self.tp = tp
        self.out = out_path
        self.build = build
        self.io = io or TableIO(spark)
        self.lineage = Lineage(out_path)

    def run(self, zooms: List[int]) -> List[int]:
        done = self.lineage.committed()
        executed = []
        for z in zooms:
            unit = f"zoom={z}"
            if unit in done:
                continue
            t0 = time.time()
            df = self.build(self.spark, z)
            path = os.path.join(self.out, unit)
            self.io.write(df, path)
            rows = self.io.read(path).count()
            self.lineage.commit(
                LineageRecord(
                    unit=unit,
                    rows=rows,
                    wall_s=round(time.time() - t0, 3),
                    committed_at=time.time(),
                    config=self.tp.to_dict(),
                )
            )
            executed.append(z)
        return executed

    def read_zoom(self, z: int) -> DataFrame:
        return self.io.read(os.path.join(self.out, f"zoom={z}"))

    def metrics(self) -> Dict[str, dict]:
        return self.lineage.committed()
