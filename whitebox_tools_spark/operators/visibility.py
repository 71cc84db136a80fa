"""Visibility operators: Viewshed, HorizonAngle.

Reference anchors:
- Viewshed (terrain_analysis/viewshed.rs): a cell is visible from the
  viewpoint iff no cell along the line of sight subtends a larger
  vertical angle.
- HorizonAngle (terrain_analysis/horizon_angle.rs): per cell, the max
  elevation angle toward a fixed azimuth.

Plan: the DEM (or the relevant tile + its directional strip at scale)
is broadcast as a dense numpy grid; target cells stream through
mapInPandas and each batch runs vectorized line-of-sight walks. For a
10^12-cell DEM the same kernel runs per tile with a halo strip along
the sweep azimuth (the sweep decomposes over tiles because max-angle is
associative along the ray) — the broadcast path here is the
small-raster/regional case.
"""

from __future__ import annotations

from typing import Iterator

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..functions.raster_math import GridMeta


def _dense_grid(cells: DataFrame, meta: GridMeta) -> np.ndarray:
    g = np.full((meta.rows, meta.columns), np.nan)
    for r in cells.select("row", "col", "value").toLocalIterator():
        g[int(r["row"]), int(r["col"])] = r["value"]
    return g


_OUT_SCHEMA = StructType([
    StructField("row", LongType(), False),
    StructField("col", LongType(), False),
    StructField("value", DoubleType(), False),
])


def viewshed(cells: DataFrame, meta: GridMeta, vp_row: int, vp_col: int,
             vp_height: float = 2.0) -> DataFrame:
    """1.0 where the cell center is visible from the (raised) viewpoint,
    0.0 otherwise. LOS sampled at unit steps along the ray (R3 family)."""
    dem = _dense_grid(cells, meta)
    sc = cells.sparkSession.sparkContext
    bc = sc.broadcast(dem)
    resx, resy = meta.resolution_x, meta.resolution_y
    rows_n, cols_n = meta.rows, meta.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = bc.value
        z0 = g[vp_row, vp_col] + vp_height
        for pdf in batches:
            out = np.ones(len(pdf), dtype=np.float64)
            rr = pdf["row"].to_numpy()
            cc = pdf["col"].to_numpy()
            for i in range(len(pdf)):
                r, c = int(rr[i]), int(cc[i])
                dr, dc = r - vp_row, c - vp_col
                dist = math.hypot(dr * resy, dc * resx)
                if dist == 0.0:
                    continue
                n = max(abs(dr), abs(dc))
                tgt_angle = (g[r, c] - z0) / dist
                visible = True
                for s in range(1, n):
                    t = s / n
                    ir = int(round(vp_row + dr * t))
                    ic = int(round(vp_col + dc * t))
                    d = math.hypot((ir - vp_row) * resy, (ic - vp_col) * resx)
                    if d == 0.0:
                        continue
                    if (g[ir, ic] - z0) / d >= tgt_angle:
                        visible = False
                        break
                out[i] = 1.0 if visible else 0.0
            yield pd.DataFrame({"row": rr, "col": cc, "value": out})

    return cells.select("row", "col").mapInPandas(run, schema=_OUT_SCHEMA)


def horizon_angle(cells: DataFrame, meta: GridMeta, azimuth: float = 0.0,
                  max_dist: float | None = None) -> DataFrame:
    """Per-cell maximum elevation angle (radians, atan of rise/run)
    looking toward `azimuth` degrees clockwise from north."""
    dem = _dense_grid(cells, meta)
    sc = cells.sparkSession.sparkContext
    bc = sc.broadcast(dem)
    az = math.radians(azimuth)
    # step direction in (row, col): north = -row
    step_r, step_c = -math.cos(az), math.sin(az)
    resx, resy = meta.resolution_x, meta.resolution_y
    rows_n, cols_n = meta.rows, meta.columns
    limit = max_dist if max_dist is not None else float("inf")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = bc.value
        for pdf in batches:
            rr = pdf["row"].to_numpy()
            cc = pdf["col"].to_numpy()
            out = np.zeros(len(pdf))
            for i in range(len(pdf)):
                r0, c0 = int(rr[i]), int(cc[i])
                z0 = g[r0, c0]
                best = -math.inf
                s = 1
                while True:
                    fr = r0 + step_r * s
                    fc = c0 + step_c * s
                    ir, ic = int(round(fr)), int(round(fc))
                    if not (0 <= ir < rows_n and 0 <= ic < cols_n):
                        break
                    d = math.hypot((ir - r0) * resy, (ic - c0) * resx)
                    if d > limit:
                        break
                    if d > 0:
                        best = max(best, (g[ir, ic] - z0) / d)
                    s += 1
                out[i] = math.atan(best) if math.isfinite(best) else 0.0
            yield pd.DataFrame({"row": rr, "col": cc, "value": out})

    return cells.select("row", "col").mapInPandas(run, schema=_OUT_SCHEMA)
