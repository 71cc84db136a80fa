"""Distance-transform operators.

Reference anchors:
- EuclideanDistance / EuclideanAllocation (Shih & Wu two-scan transform):
  gis_analysis/euclidean_distance.rs:23-33, euclidean_allocation.rs
- BufferRaster (distance threshold): gis_analysis/buffer_raster.rs

Spark plan: the two-scan algorithm is inherently sequential per row/col;
the distributed equivalent with identical OUTPUT is an exact 1-NN join
between every grid cell and the target-cell set (grid kNN with shell
expansion + ring guarantee, operators/knn.py). Distances are computed
between cell CENTERS in map units — sqrt of the same dist2 expression
on every engine, so values are bit-stable for the oracle gate.

At 100 TB the target set is usually sparse (features burned into the
grid); the kNN join shuffles on FRS cell keys sized from target density,
so each round is one int64 equi-join with AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.raster_math import GridMeta
from .knn import knn_join_exact, wbt_default_radius


def _centers(cells: DataFrame, meta: GridMeta, id_col: str) -> DataFrame:
    return cells.selectExpr(
        f"(row * {meta.columns}L + col) AS {id_col}",
        "row",
        "col",
        f"{meta.x_center_expr('col')} AS x",
        f"{meta.y_center_expr('row')} AS y",
        "value",
    )


def _nearest_target(cells: DataFrame, meta: GridMeta, target_pred: str,
                    radius: float | None = None) -> DataFrame:
    q = _centers(cells, meta, "cell_idx")
    t = _centers(cells.where(F.expr(target_pred)), meta, "target_idx")
    if radius is None:
        n_t = max(t.count(), 1)
        area = (meta.east - meta.west) * (meta.north - meta.south)
        radius = wbt_default_radius(area, n_t)
    nn = knn_join_exact(
        q.select("cell_idx", "x", "y"),
        t.select("target_idx", "x", "y"),
        k=1,
        radius=radius,
        qid="cell_idx",
        tid="target_idx",
    )
    return (
        nn.join(q.select("cell_idx", "row", "col"), "cell_idx")
        .join(t.selectExpr("target_idx", "value AS target_value"), "target_idx")
    )


def euclidean_distance(cells: DataFrame, meta: GridMeta,
                       target_pred: str = "value <> 0.0",
                       radius: float | None = None) -> DataFrame:
    """Map-unit distance from every cell to the nearest target cell
    (EuclideanDistance semantics; targets = cells matching target_pred,
    their own distance is 0)."""
    nn = _nearest_target(cells, meta, target_pred, radius)
    return nn.selectExpr("row", "col", "SQRT(dist2) AS value")


def euclidean_allocation(cells: DataFrame, meta: GridMeta,
                         target_pred: str = "value <> 0.0",
                         radius: float | None = None) -> DataFrame:
    """Value of the nearest target cell (EuclideanAllocation); ties
    resolve by (dist2, target linear index) — deterministic."""
    nn = _nearest_target(cells, meta, target_pred, radius)
    return nn.selectExpr("row", "col", "target_value AS value")


def buffer_raster(cells: DataFrame, meta: GridMeta, size: float,
                  target_pred: str = "value <> 0.0",
                  radius: float | None = None) -> DataFrame:
    """BufferRaster: 1.0 within `size` map units of a target, else 0.0."""
    nn = _nearest_target(cells, meta, target_pred, radius)
    return nn.selectExpr(
        "row", "col",
        f"CAST(CASE WHEN SQRT(dist2) <= {size!r} THEN 1.0 ELSE 0.0 END AS DOUBLE) AS value",
    )
