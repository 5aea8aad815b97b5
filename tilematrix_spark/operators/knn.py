"""kNN lookup via k-ring tile expansion — the north-star join operator.

Generalizes the reference's ``get_neighbors`` ring (``_tile.py:209-272``) to
an iterative disc expansion: for each query point, candidate partners are the
rows indexed in tiles within Chebyshev ring radius r; r doubles until the
k-th nearest candidate is provably closer than any point outside the
searched disc (d_k ≤ r · min(tile_w, tile_h) — the disc extends at least r
tile widths beyond the query's own tile edge), or the disc covers the whole
matrix.

Execution shape per round (all DataFrame-API):
  pending queries → k_ring explode (native) → equi-join on (row, col)
  against the tile-indexed point table → windowed top-k per query.
The ring side (queries × ring tiles) is the small side and is broadcast
when it fits; the point table never moves — the join is a map-side lookup.
Dense-tile skew on the point side is pre-broken by the tile index itself at
sufficient zoom; for hot tiles AQE skew-split is the backstop.

Driver-side loop = the engine's iterate primitive (Spark has none); each
round is one job over only the still-pending queries (anti-join).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..grid import PyramidConfig
from . import assign, hierarchy


def _dist(tp: PyramidConfig):
    dx = F.abs(F.col("_qx") - F.col("_px"))
    if tp.is_global:
        dx = F.least(dx, F.lit(tp.right - tp.left) - dx)
    dy = F.col("_qy") - F.col("_py")
    return F.sqrt(dx * dx + dy * dy)


def knn_join(
    queries: DataFrame,
    points: DataFrame,
    tp: PyramidConfig,
    zoom: int,
    k: int,
    query_id: str = "qid",
    point_id: str = "pid",
    qx: str = "lon",
    qy: str = "lat",
    px: str = "lon",
    py: str = "lat",
    max_radius: Optional[int] = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Return (query_id, point_id, dist, rank) with rank ≤ k per query.

    ``points`` is tile-indexed at ``zoom`` internally; pre-index and persist
    it for repeated lookups.  Distance is planar Euclidean in CRS units with
    antimeridian x-wrap on global grids.  Ties break on (dist, point_id) —
    deterministic.
    """
    w = tp.tile_x_size(zoom)
    h = tp.tile_y_size(zoom)
    guarantee = min(w, h)
    mw, mh = tp.matrix_width(zoom), tp.matrix_height(zoom)
    max_r = max(mw, mh)
    if max_radius is not None:
        max_r = min(max_r, max_radius)

    q = assign.with_tile(
        queries.select(F.col(query_id), F.col(qx).alias("_qx"), F.col(qy).alias("_qy")),
        tp, zoom, "_qx", "_qy", out_tile_id=None,
    )
    p = (
        assign.with_tile(
            points.select(F.col(point_id), F.col(px).alias("_px"), F.col(py).alias("_py")),
            tp, zoom, "_px", "_py", out_tile_id=None,
        )
        .withColumnRenamed("row", "_prow")
        .withColumnRenamed("col", "_pcol")
        # probed by every ring round: persist the tile-indexed point table
        # once instead of rescanning + re-assigning the source per round
        # (the operator-internal version of the "pre-index and persist"
        # advice above; MEMORY_AND_DISK default spills safely at scale)
        .persist()
    )

    round_results = []
    pending = q
    r = 1
    while True:
        ring = hierarchy.disc_tiles(pending, tp, radius=r, zoom=zoom).select(
            query_id, "_qx", "_qy", "ring_row", "ring_col"
        )
        left = F.broadcast(ring) if broadcast_queries else ring
        joined = left.join(
            p,
            (F.col("ring_row") == F.col("_prow")) & (F.col("ring_col") == F.col("_pcol")),
            "inner",
        )
        scored = joined.withColumn("dist", _dist(tp))
        win = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col(point_id).asc())
        # persisted: reused by the done-check, the result emit, and the
        # pending anti-join — otherwise the ring join recomputes 3x per round
        topk = (
            scored.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select(query_id, point_id, "dist", "rank")
        ).persist()
        # a query is DONE when it has k hits whose k-th distance fits the
        # guarantee radius, or when the disc already spans the whole matrix
        whole_matrix = (2 * r + 1) >= max(mw, mh)
        final_round = whole_matrix or r >= max_r
        per_q = topk.groupBy(query_id).agg(
            F.count("*").alias("_hits"), F.max("dist").alias("_dk")
        )
        if final_round:
            done_q = per_q.select(query_id)
        else:
            done_q = per_q.filter(
                (F.col("_hits") >= k) & (F.col("_dk") <= F.lit(float(r) * guarantee))
            ).select(query_id)
        # winners are checkpointed eagerly per round (k rows per done query —
        # small), so this round's cached topk can be released as soon as the
        # pending set for the next round is materialized: peak storage stays
        # one round's topk + the point table, independent of round count
        done_rows = topk.join(F.broadcast(done_q), query_id, "left_semi").localCheckpoint(
            eager=True
        )
        round_results.append(done_rows)
        if final_round:
            topk.unpersist()
            break
        pending = pending.join(F.broadcast(done_q), query_id, "left_anti").localCheckpoint(
            eager=True
        )
        topk.unpersist()
        if pending.isEmpty():
            break
        r *= 2
    results = round_results[0]
    for extra in round_results[1:]:
        results = results.unionByName(extra)
    p.unpersist()
    return results


def knn_brute_force(
    queries: DataFrame,
    points: DataFrame,
    tp: PyramidConfig,
    k: int,
    query_id: str = "qid",
    point_id: str = "pid",
    qx: str = "lon",
    qy: str = "lat",
    px: str = "lon",
    py: str = "lat",
) -> DataFrame:
    """Oracle-grade brute force: broadcast cross join + windowed top-k.
    O(|Q|·|P|) — for verification and small query sets only."""
    q = queries.select(F.col(query_id), F.col(qx).alias("_qx"), F.col(qy).alias("_qy"))
    p = points.select(F.col(point_id), F.col(px).alias("_px"), F.col(py).alias("_py"))
    joined = F.broadcast(q).crossJoin(p)
    win = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col(point_id).asc())
    return (
        joined.withColumn("dist", _dist(tp))
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(query_id, point_id, "dist", "rank")
    )
