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
from ..functions import geometry_sql as GS
from ..functions.cells import frs_cell_expr, with_frs_cells

# Polygon layers with at most this many total edges compile to a pure
# SQL predicate (WholeStageCodegen — no Python exchange, linear thread
# scaling). Bigger layers fall back to the Arrow kernel / cell-cover.
CODEGEN_MAX_EDGES = 4096

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


def _rings(rec: PolygonRecord) -> tuple[list, list]:
    return ([r.tolist() for r in rec.shells], [r.tolist() for r in rec.holes])


def clip_points(
    points: DataFrame,
    polygons: DataFrame,
    x: str = "x",
    y: str = "y",
    erase: bool = False,
    plan: str = "auto",
) -> DataFrame:
    """ClipLidarToPolygon (erase=False) / ErasePolygonFromLidar (erase=True).

    Semi/anti spatial join, broadcast plan; all payload columns untouched.
    plan='codegen' compiles the winding test to a SQL predicate
    (WholeStageCodegen, zero Python); plan='arrow' runs the numpy kernel
    via mapInArrow; 'auto' picks codegen while the layer has
    <= CODEGEN_MAX_EDGES edges.
    """
    recs = collect_polygons(polygons)
    n_edges = sum(GS.edge_count(*_rings(r)) for r in recs)
    if plan == "codegen" or (plan == "auto" and n_edges <= CODEGEN_MAX_EDGES):
        verdict = GS.clip_verdict_spark_sql(
            [(*_rings(r), r.bbox) for r in recs], x, y
        )
        return points.where(F.expr(f"NOT ({verdict})" if erase else verdict))
    return _clip_points_arrow(points, recs, x, y, erase)


def _clip_points_arrow(points: DataFrame, recs: list, x: str, y: str, erase: bool) -> DataFrame:
    """Arrow-kernel plan: verdict reads only (x, y) as zero-copy numpy
    views; the payload (incl. strings) is filtered as Arrow buffers and
    never materializes Python objects."""
    import pyarrow as pa

    sc = points.sparkSession.sparkContext
    bc = sc.broadcast(
        [(r.polygon_id, r.bbox, r.shells, r.holes) for r in recs]
    )
    schema = points.schema

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        records = bc.value
        xi = yi = None
        for batch in batches:
            if xi is None:
                xi = batch.schema.get_field_index(x)
                yi = batch.schema.get_field_index(y)
            px = batch.column(xi).to_numpy(zero_copy_only=False)
            py = batch.column(yi).to_numpy(zero_copy_only=False)
            verdict = np.zeros(batch.num_rows, dtype=bool)
            for _pid, bbox, shells, holes in records:
                verdict = G.points_in_feature(px, py, shells, holes, bbox, state=verdict)
            yield batch.filter(pa.array(~verdict if erase else verdict))

    return points.mapInArrow(run, schema=schema)


def erase_points(points: DataFrame, polygons: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    return clip_points(points, polygons, x=x, y=y, erase=True)


def points_in_polygons(
    points: DataFrame,
    polygons: DataFrame,
    x: str = "x",
    y: str = "y",
    plan: str = "auto",
) -> DataFrame:
    """Tag-join: one output row per (point, containing polygon) pair.

    Containment per record = in any non-hole ring AND not in any hole
    ring of that record (even-odd, boundary outside). Output = all point
    columns + `polygon_id`. Points in no polygon produce no row (inner
    semantics); the caller can left-join back for outer semantics.

    plan='codegen': the per-record verdicts compile to one SQL
    FILTER(ARRAY(...)) + explode — WholeStageCodegen end to end.
    plan='arrow': batched numpy kernel via mapInArrow. 'auto' picks
    codegen while the layer has <= CODEGEN_MAX_EDGES edges.
    """
    recs = collect_polygons(polygons)
    n_edges = sum(GS.edge_count(*_rings(r)) for r in recs)
    if plan == "codegen" or (plan == "auto" and n_edges <= CODEGEN_MAX_EDGES):
        arms = ", ".join(
            f"IF({GS.inside_feature_sql(*_rings(r), xs=x, ys=y, bbox=r.bbox)}, "
            f"CAST({r.polygon_id} AS BIGINT), NULL)"
            for r in recs
        )
        return points.withColumn(
            "polygon_id",
            F.explode(F.expr(f"FILTER(ARRAY({arms}), v -> v IS NOT NULL)")),
        )
    return _points_in_polygons_arrow(points, recs, x, y)


def _points_in_polygons_arrow(points: DataFrame, recs: list, x: str, y: str) -> DataFrame:
    import pyarrow as pa

    sc = points.sparkSession.sparkContext
    bc = sc.broadcast([(r.polygon_id, r.bbox, r.shells, r.holes) for r in recs])
    schema = StructType(points.schema.fields + [StructField("polygon_id", LongType(), False)])

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        records = bc.value
        xi = yi = None
        for batch in batches:
            if xi is None:
                xi = batch.schema.get_field_index(x)
                yi = batch.schema.get_field_index(y)
            px = batch.column(xi).to_numpy(zero_copy_only=False)
            py = batch.column(yi).to_numpy(zero_copy_only=False)
            for pid, bbox, shells, holes in records:
                mask = G.points_in_feature(px, py, shells, holes, bbox)
                if mask.any():
                    sub = batch.filter(pa.array(mask))
                    pid_col = pa.array(np.full(sub.num_rows, pid, dtype=np.int64))
                    yield pa.RecordBatch.from_arrays(
                        list(sub.columns) + [pid_col],
                        names=[f.name for f in sub.schema] + ["polygon_id"],
                    )

    return points.mapInArrow(run, schema=schema)


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
