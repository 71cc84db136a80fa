"""Point-in-polygon spatial joins (Clip / Erase / tag-join).

Reference semantics (transcribed, not copied):
- even-odd winding PIP with boundary-outside:
  whitebox-common/src/algorithms/poly_ops.rs:30-72
- ClipLidarToPolygon / ErasePolygonFromLidar sequential record scan with
  bbox prefilter, shell-sets-true then hole-sets-false:
  whitebox-tools-app/src/tools/lidar_analysis/clip_lidar_to_polygon.rs:274-317,
  erase_polygon_from_lidar.rs (same loop, inverted keep-mask)

Two physical plans:

1. **Broadcast plan** (small polygon layer — the common case, e.g. admin
   boundaries vs 10^12 points): polygons are collected once, broadcast to
   executors, and evaluated in a single mapInPandas pass over the point
   stream. Zero shuffle: the job is scan -> batched numpy PIP -> write.

2. **Cell-cover plan** (large polygon layer): each polygon emits the FRS
   cells covered by its bbox (explode(sequence(...)) x2 — codegen), the
   points carry their own cell key, and an equi-join on cell id produces
   candidate pairs; a numpy PIP refine follows. The join is a plain
   shuffle hash/sort-merge join on int64 cells — AQE handles skewed
   (hot) cells; `functions.cells.cell_prefix_salt` is available when a
   single cell exceeds a task.

Both plans preserve the input row payload untouched (span-sequence
invariant): they only append `polygon_id` / keep-or-drop rows.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..functions import geometry as G
from ..functions.cells import frs_cell_expr, with_frs_cells

# ---------------------------------------------------------------------------
# Polygon layer representation
# ---------------------------------------------------------------------------


class PolygonRecord:
    """One feature: bbox + shell rings + hole rings as numpy arrays."""

    __slots__ = ("polygon_id", "bbox", "shells", "holes")

    def __init__(self, polygon_id: int, bbox, shells, holes):
        self.polygon_id = polygon_id
        self.bbox = bbox  # (xmin, ymin, xmax, ymax)
        self.shells = shells
        self.holes = holes


def collect_polygons(polygons: DataFrame) -> list[PolygonRecord]:
    """Collect a (small) polygon layer to plain numpy, ordered by
    polygon_id — the record order of the WBT sequential scan."""
    rows = polygons.select("polygon_id", "bbox", "parts").orderBy("polygon_id").collect()
    out = []
    for r in rows:
        shells, holes = [], []
        for part in r["parts"]:
            ring = np.asarray([(p["x"], p["y"]) for p in part["ring"]], dtype=np.float64)
            (holes if part["is_hole"] else shells).append(ring)
        bbox = (r["bbox"]["xmin"], r["bbox"]["ymin"], r["bbox"]["xmax"], r["bbox"]["ymax"])
        out.append(PolygonRecord(int(r["polygon_id"]), bbox, shells, holes))
    return out


# ---------------------------------------------------------------------------
# Broadcast plan
# ---------------------------------------------------------------------------


def clip_points(points: DataFrame, polygons: DataFrame, x: str = "x", y: str = "y", erase: bool = False) -> DataFrame:
    """ClipLidarToPolygon (erase=False) / ErasePolygonFromLidar (erase=True).

    Semi/anti spatial join, broadcast plan. Returns input rows filtered by
    the WBT sequential shell/hole verdict; all payload columns untouched.
    """
    recs = collect_polygons(polygons)
    sc = points.sparkSession.sparkContext
    bc = sc.broadcast(
        [(r.polygon_id, r.bbox, r.shells, r.holes) for r in recs]
    )
    schema = points.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        records = bc.value
        for pdf in batches:
            px = pdf[x].to_numpy(dtype=np.float64)
            py = pdf[y].to_numpy(dtype=np.float64)
            verdict = np.zeros(len(pdf), dtype=bool)
            for _pid, bbox, shells, holes in records:
                verdict = G.points_in_feature(px, py, shells, holes, bbox, state=verdict)
            yield pdf[~verdict if erase else verdict]

    return points.mapInPandas(run, schema=schema)


def erase_points(points: DataFrame, polygons: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    return clip_points(points, polygons, x=x, y=y, erase=True)


def points_in_polygons(points: DataFrame, polygons: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """Tag-join: one output row per (point, containing polygon) pair.

    Containment per record = in any non-hole ring AND not in any hole
    ring of that record (even-odd, boundary outside). Output = all point
    columns + `polygon_id`. Points in no polygon produce no row (inner
    semantics); the caller can left-join back for outer semantics.
    """
    recs = collect_polygons(polygons)
    sc = points.sparkSession.sparkContext
    bc = sc.broadcast([(r.polygon_id, r.bbox, r.shells, r.holes) for r in recs])
    schema = StructType(points.schema.fields + [StructField("polygon_id", LongType(), False)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        records = bc.value
        for pdf in batches:
            px = pdf[x].to_numpy(dtype=np.float64)
            py = pdf[y].to_numpy(dtype=np.float64)
            outs = []
            for pid, bbox, shells, holes in records:
                mask = G.points_in_feature(px, py, shells, holes, bbox)
                if mask.any():
                    sub = pdf[mask].copy()
                    sub["polygon_id"] = np.int64(pid)
                    outs.append(sub)
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return points.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# Cell-cover plan (large polygon layer)
# ---------------------------------------------------------------------------


def polygon_cover_cells(polygons: DataFrame, radius: float) -> DataFrame:
    """(cell cx, cy, polygon_id) for every FRS cell intersecting each
    polygon's bbox. Pure codegen: sequence + explode, no UDF."""
    cxmin = frs_cell_expr("bbox.xmin", radius)
    cxmax = frs_cell_expr("bbox.xmax", radius)
    cymin = frs_cell_expr("bbox.ymin", radius)
    cymax = frs_cell_expr("bbox.ymax", radius)
    return (
        polygons.select("polygon_id", "bbox")
        .withColumn("cx", F.explode(F.expr(f"SEQUENCE({cxmin}, {cxmax})")))
        .withColumn("cy", F.explode(F.expr(f"SEQUENCE({cymin}, {cymax})")))
        .select("polygon_id", "cx", "cy")
    )


def points_in_polygons_cellcover(
    points: DataFrame,
    polygons: DataFrame,
    radius: float,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Tag-join via cell-cover equi-join + PIP refine.

    Plan: points gain (cx, cy) [codegen] -> equi-join against the
    polygon cover-cell table on (cx, cy) [one shuffle; AQE skew-split]
    -> bbox prefilter [codegen] -> numpy PIP refine on the surviving
    candidate pairs [mapInPandas, batched per polygon_id]. The refine
    looks geometry up from a broadcast map keyed by polygon_id; for
    polygon layers too large to broadcast, swap the lookup for a
    cogrouped applyInPandas on polygon_id (same kernel).
    """
    recs = collect_polygons(polygons)
    sc = points.sparkSession.sparkContext
    bc = sc.broadcast({r.polygon_id: (r.shells, r.holes) for r in recs})

    pts = with_frs_cells(points, radius, x=x, y=y)
    cover = polygon_cover_cells(polygons, radius)
    cand = pts.join(cover, ["cx", "cy"], "inner").join(
        F.broadcast(polygons.select("polygon_id", "bbox")), "polygon_id", "inner"
    )
    # bbox prefilter: strict interior (bounding_box.rs:217)
    cand = cand.where(
        (F.col(x) > F.col("bbox.xmin"))
        & (F.col(x) < F.col("bbox.xmax"))
        & (F.col(y) > F.col("bbox.ymin"))
        & (F.col(y) < F.col("bbox.ymax"))
    ).drop("cx", "cy", "bbox")

    out_fields = [f for f in points.schema.fields] + [StructField("polygon_id", LongType(), False)]
    schema = StructType(out_fields)
    point_cols = [f.name for f in points.schema.fields]

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        geom = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            px = pdf[x].to_numpy(dtype=np.float64)
            py = pdf[y].to_numpy(dtype=np.float64)
            pid = pdf["polygon_id"].to_numpy()
            for p in np.unique(pid):
                sel = pid == p
                shells, holes = geom[int(p)]
                m = G.points_in_feature(px[sel], py[sel], shells, holes)
                keep[np.nonzero(sel)[0][m]] = True
            out = pdf[keep]
            yield out[point_cols + ["polygon_id"]]

    return cand.mapInPandas(refine, schema=schema)
