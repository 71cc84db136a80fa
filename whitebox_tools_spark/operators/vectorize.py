"""RasterToVectorPolygons — the raster->vector conversion named in the
north star.

Reference: data_tools/raster_to_vector_polygons.rs —
(1) clump equal-valued regions (:236-262)  -> operators/clump.py
(2) extract boundary edges between differing clumps (:279-340)
(3) assemble edges into closed rings; shells clockwise, holes
    counter-clockwise (shapefile convention, is_clockwise_order).

Distributed plan:
- step 2 is a pure codegen scatter: every cell emits its 4 sides, a
  side survives if the across-neighbor has a different clump id (or is
  off-raster). Edges are DIRECTED so the region interior is on the
  RIGHT in map coordinates — after the walk, shells come out CW and
  holes CCW with no post-hoc orientation fixing.
- step 3 groups edges by clump (applyInPandas) and walks rings with a
  rightmost-turn rule at saddle corners (keeps rings non-crossing).
  Vertices are cell-corner coordinates (x = west + col*resx,
  y = north - row*resy); collinear runs are merged.

The per-clump walk is sequential by nature; the shuffle key is
clump_id, so at scale each region assembles independently and AQE
handles giant-region skew (a continent-sized clump is the known worst
case — the same limit WBT hits with its global in-memory trace).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BooleanType, DoubleType, IntegerType,
                               LongType, StructField, StructType)

from ..functions.raster_math import GridMeta
from .clump import clump

_FEATURE_SCHEMA = StructType([
    StructField("clump_id", LongType(), False),
    StructField("value", DoubleType(), False),
    StructField("parts", ArrayType(StructType([
        StructField("part_idx", IntegerType(), False),
        StructField("is_hole", BooleanType(), False),
        StructField("ring", ArrayType(StructType([
            StructField("x", DoubleType(), False),
            StructField("y", DoubleType(), False),
        ])), False),
    ])), False),
])


def boundary_edges(labeled: DataFrame) -> DataFrame:
    """Directed boundary edges (corner-grid coordinates) per clump.

    A side is a boundary when the across-neighbor misses or belongs to
    a different clump. Direction convention (map coords, y up), chosen
    so the interior is on the right of travel:
      top:    (r, c)   -> (r, c+1)      bottom: (r+1, c+1) -> (r+1, c)
      left:   (r+1, c) -> (r, c)        right:  (r, c+1)   -> (r+1, c+1)
    """
    nbrs = labeled.selectExpr(
        "row", "col", "clump_id",
        "row - 1 AS up_r", "row + 1 AS dn_r", "col - 1 AS lf_c", "col + 1 AS rt_c",
    )
    lab = labeled.selectExpr("row AS nr", "col AS nc", "clump_id AS n_id")
    j = (
        nbrs
        .join(lab.withColumnRenamed("n_id", "up_id"),
              (F.col("up_r") == F.col("nr")) & (F.col("col") == F.col("nc")), "left")
        .drop("nr", "nc")
        .join(lab.withColumnRenamed("n_id", "dn_id"),
              (F.col("dn_r") == F.col("nr")) & (F.col("col") == F.col("nc")), "left")
        .drop("nr", "nc")
        .join(lab.withColumnRenamed("n_id", "lf_id"),
              (F.col("row") == F.col("nr")) & (F.col("lf_c") == F.col("nc")), "left")
        .drop("nr", "nc")
        .join(lab.withColumnRenamed("n_id", "rt_id"),
              (F.col("row") == F.col("nr")) & (F.col("rt_c") == F.col("nc")), "left")
        .drop("nr", "nc")
    )
    edges = j.selectExpr(
        "clump_id",
        """EXPLODE(FILTER(ARRAY(
            IF(up_id IS NULL OR up_id <> clump_id,
               STRUCT(row AS r0, col AS c0, row AS r1, col + 1 AS c1), NULL),
            IF(dn_id IS NULL OR dn_id <> clump_id,
               STRUCT(row + 1 AS r0, col + 1 AS c0, row + 1 AS r1, col AS c1), NULL),
            IF(lf_id IS NULL OR lf_id <> clump_id,
               STRUCT(row + 1 AS r0, col AS c0, row AS r1, col AS c1), NULL),
            IF(rt_id IS NULL OR rt_id <> clump_id,
               STRUCT(row AS r0, col + 1 AS c0, row + 1 AS r1, col + 1 AS c1), NULL)
        ), e -> e IS NOT NULL)) AS e""",
    ).selectExpr("clump_id", "e.r0", "e.c0", "e.r1", "e.c1")
    return edges


def _walk_rings(edges: np.ndarray) -> list[np.ndarray]:
    """Assemble directed corner-grid edges into closed rings.

    At corners with multiple outgoing edges (saddles) take the
    rightmost turn relative to the incoming direction (interior-right
    convention keeps rings simple)."""
    from collections import defaultdict

    out_edges: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i, (r0, c0, r1, c1) in enumerate(edges):
        out_edges[(r0, c0)].append(i)
    used = np.zeros(len(edges), dtype=bool)
    # map coords y-up: direction vector (dx, dy) = (dc, -dr)
    rings = []
    order = np.lexsort((edges[:, 1], edges[:, 0]))
    for start in order:
        if used[start]:
            continue
        ring = [(edges[start][0], edges[start][1])]
        cur = start
        used[start] = True
        while True:
            r1, c1 = edges[cur][2], edges[cur][3]
            ring.append((r1, c1))
            if (r1, c1) == ring[0]:
                break
            cands = [i for i in out_edges[(r1, c1)] if not used[i]]
            if not cands:
                break  # malformed; emit what we have
            if len(cands) == 1:
                nxt = cands[0]
            else:
                # rightmost turn: maximize clockwise angle from incoming
                din = (edges[cur][3] - edges[cur][1], -(edges[cur][2] - edges[cur][0]))
                best, best_key = None, None
                for i in cands:
                    dout = (edges[i][3] - edges[i][1], -(edges[i][2] - edges[i][0]))
                    cross = din[0] * dout[1] - din[1] * dout[0]
                    dot = din[0] * dout[0] + din[1] * dout[1]
                    # preference: right turn (cross<0), straight, left
                    key = (0 if cross < 0 else (1 if cross == 0 and dot > 0 else 2), i)
                    if best_key is None or key < best_key:
                        best, best_key = i, key
                nxt = best
            used[nxt] = True
            cur = nxt
        if len(ring) >= 4 and ring[0] == ring[-1]:
            rings.append(np.asarray(ring, dtype=np.int64))
    return rings


def _merge_collinear(ring: np.ndarray) -> np.ndarray:
    """Drop vertices interior to straight runs (unit-step chain)."""
    keep = [0]
    n = len(ring) - 1  # closed
    for i in range(1, n):
        d0 = ring[i] - ring[keep[-1]]
        d1 = ring[i + 1] - ring[i]
        if d0[0] * d1[1] - d0[1] * d1[0] != 0:
            keep.append(i)
    pts = ring[keep]
    return np.vstack([pts, pts[:1]])


def raster_to_polygons(cells: DataFrame, meta: GridMeta,
                       diag: bool = False) -> DataFrame:
    """(clump_id, value, parts) polygon features for equal-valued
    regions. 4-connectivity by default (matching edge topology: an
    8-connected clump can pinch through a corner, which has no polygon
    boundary representation)."""
    labeled = clump(cells, meta.columns, diag=diag).persist()
    edges = boundary_edges(labeled.select("row", "col", "clump_id"))
    vals = labeled.groupBy("clump_id").agg(F.first("value").alias("value"))
    # bucket the per-clump walks: grouping directly on clump_id makes
    # one Arrow batch per clump (a fine-clumped raster is mostly
    # 1-cell clumps, so the per-group Arrow round-trip dominated the
    # operator ~10:1); PMOD-bucketing keeps one batch per shuffle
    # partition and loops the same kernel over the clumps inside it.
    # A clump's edges still co-locate (same clump_id -> same bucket),
    # and per-clump output is independent of its bucket neighbors.
    nb = int(cells.sparkSession.conf.get("spark.sql.shuffle.partitions",
                                         "200"))
    grouped = edges.join(vals, "clump_id") \
        .withColumn("__b", F.expr(f"PMOD(clump_id, {nb})"))

    west, north = meta.west, meta.north
    resx, resy = meta.resolution_x, meta.resolution_y

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cids, cvals, cparts = [], [], []
        for cid, g in pdf.groupby("clump_id", sort=True):
            e = g[["r0", "c0", "r1", "c1"]].to_numpy(dtype=np.int64)
            rings = _walk_rings(e)
            parts = []
            for idx, ring in enumerate(rings):
                ring = _merge_collinear(ring)
                xs = west + ring[:, 1].astype(np.float64) * resx
                ys = north - ring[:, 0].astype(np.float64) * resy
                # signed area (CCW positive): holes are CCW by construction
                area2 = float(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))
                parts.append({
                    "part_idx": idx,
                    "is_hole": bool(area2 > 0),
                    "ring": [{"x": float(x), "y": float(y)}
                             for x, y in zip(xs, ys)],
                })
            cids.append(int(cid))
            cvals.append(float(g["value"].iloc[0]))
            cparts.append(parts)
        return pd.DataFrame({
            "clump_id": cids,
            "value": cvals,
            "parts": cparts,
        })

    out = grouped.groupBy("__b").applyInPandas(assemble, schema=_FEATURE_SCHEMA)
    return out
