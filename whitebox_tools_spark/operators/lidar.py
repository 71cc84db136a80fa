"""LiDAR point-cloud operators over the points table.

Reference anchors:
- FilterLidarClasses: lidar_analysis/filter_lidar_classes.rs
- FilterLidarScanAngles: lidar_analysis/filter_lidar_scan_angles.rs
- LidarElevationSlice: lidar_analysis/lidar_elevation_slice.rs
- LidarThin (keep one point per resolution cell, first by point order):
  lidar_analysis/lidar_thin.rs
- LidarJoin (concatenate clouds): lidar_analysis/lidar_join.rs
- LidarTile / footprints live in operators/tiling.py
- EliminateCoincidentPoints: gis_analysis/eliminate_coincident_points.rs

All row-level predicates are plain Catalyst filters (pushed into the
scan); thinning is one hash aggregation on the FRS cell key.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import with_frs_cells


def filter_classes(points: DataFrame, keep: list[int],
                   class_col: str = "classification") -> DataFrame:
    return points.where(F.col(class_col).isin(keep))


def filter_scan_angles(points: DataFrame, min_angle: int, max_angle: int,
                       angle_col: str = "scan_angle") -> DataFrame:
    return points.where(F.col(angle_col).between(min_angle, max_angle))


def elevation_slice(points: DataFrame, minz: float, maxz: float,
                    z_col: str = "z") -> DataFrame:
    """LidarElevationSlice: keep points with minz <= z <= maxz."""
    return points.where((F.col(z_col) >= minz) & (F.col(z_col) <= maxz))


def lidar_thin(points: DataFrame, resolution: float,
               x: str = "x", y: str = "y",
               order_col: str = "record_num") -> DataFrame:
    """LidarThin: one point per resolution cell — the FIRST by point
    order (the reference scans the file sequentially and keeps the first
    hit per cell). FRS binning (resolution = bin size*2 convention kept
    from functions.cells); deterministic via min_by(order_col)."""
    binned = with_frs_cells(points, resolution, x=x, y=y)
    keep = binned.groupBy("cx", "cy").agg(F.expr(f"MIN({order_col})").alias(order_col))
    return (
        binned.join(keep, ["cx", "cy", order_col], "inner")
        .drop("cx", "cy")
    )


def block_maximum(points: DataFrame, meta, value_col: str = "value",
                  x: str = "x", y: str = "y") -> DataFrame:
    """BlockMaximumGridding (gis_analysis/block_maximum.rs +
    lidar_analysis variant): per-cell max of point values."""
    return points.selectExpr(
        f"{meta.row_from_y_expr(y)} AS row",
        f"{meta.col_from_x_expr(x)} AS col",
        f"{value_col} AS v",
    ).where(F.expr(meta.in_grid_pred("row", "col"))).groupBy("row", "col") \
     .agg(F.max("v").alias("value"))


def block_minimum(points: DataFrame, meta, value_col: str = "value",
                  x: str = "x", y: str = "y") -> DataFrame:
    """BlockMinimumGridding."""
    return points.selectExpr(
        f"{meta.row_from_y_expr(y)} AS row",
        f"{meta.col_from_x_expr(x)} AS col",
        f"{value_col} AS v",
    ).where(F.expr(meta.in_grid_pred("row", "col"))).groupBy("row", "col") \
     .agg(F.min("v").alias("value"))


def point_density(points: DataFrame, meta, x: str = "x", y: str = "y") -> DataFrame:
    """LidarPointDensity (lidar_analysis/lidar_point_density.rs):
    points per unit area per cell."""
    cell_area = meta.resolution_x * meta.resolution_y
    return points.selectExpr(
        f"{meta.row_from_y_expr(y)} AS row",
        f"{meta.col_from_x_expr(x)} AS col",
    ).where(F.expr(meta.in_grid_pred("row", "col"))).groupBy("row", "col") \
     .agg(F.expr(f"CAST(COUNT(*) AS DOUBLE) / {cell_area!r}").alias("value"))


def normalize_by_cell_min(points: DataFrame, resolution: float,
                          z_col: str = "value",
                          x: str = "x", y: str = "y") -> DataFrame:
    """Height-above-ground normalization, simplified ground model:
    ground = per-cell minimum z (HeightAboveGround /
    lidar_analysis/normalize_lidar semantics with a min-z ground
    surface). Output: input rows with `hag` appended."""
    binned = with_frs_cells(points, resolution, x=x, y=y)
    mins = binned.groupBy("cx", "cy").agg(F.min(z_col).alias("__gmin"))
    return (
        binned.join(mins, ["cx", "cy"], "left")
        .withColumn("hag", F.col(z_col) - F.col("__gmin"))
        .drop("cx", "cy", "__gmin")
    )


def lidar_join(clouds: list[DataFrame]) -> DataFrame:
    """LidarJoin: bag union of point clouds."""
    return reduce(lambda a, b: a.unionByName(b), clouds)


def remove_duplicates(points: DataFrame, x: str = "x", y: str = "y",
                      order_col: str = "record_num") -> DataFrame:
    """RemoveDuplicates (lidar_analysis/remove_duplicates.rs): drop
    points with exactly equal coordinates, keeping the first by record
    order."""
    keep = points.groupBy(x, y).agg(F.expr(f"MIN({order_col})").alias(order_col))
    return points.join(keep, [x, y, order_col], "inner")


def lidar_outliers(points: DataFrame, resolution: float, threshold: float,
                   z_col: str = "value", x: str = "x", y: str = "y",
                   remove: bool = True) -> DataFrame:
    """LidarOutliers-style residual filter (lidar_analysis/
    lidar_outliers.rs semantics, FRS-cell neighborhood model): a point
    is an outlier when |z - mean(cell z)| exceeds the threshold."""
    binned = with_frs_cells(points, resolution, x=x, y=y)
    stats = binned.groupBy("cx", "cy").agg(F.avg(z_col).alias("__mz"))
    j = binned.join(stats, ["cx", "cy"], "left")
    pred = F.expr(f"ABS({z_col} - __mz) <= {threshold!r}")
    out = j.where(pred if remove else ~pred)
    return out.drop("cx", "cy", "__mz")


def eliminate_coincident_points(points: DataFrame, tolerance: float,
                                x: str = "x", y: str = "y",
                                order_col: str = "record_num") -> DataFrame:
    """Drop points that fall in the same tolerance cell, keeping the
    first by record order (eliminate_coincident_points.rs snap-cell
    semantics)."""
    return lidar_thin(points, tolerance, x=x, y=y, order_col=order_col)


def lidar_sort_by_time(points: DataFrame, time_col: str = "gps_time") -> DataFrame:
    """LidarSortByTime: global acquisition-order index per point — a
    DISTRIBUTED global row_number (range partition + per-partition
    window + broadcast offsets; plans/rank.py), not a single-reducer
    sort. Ties break on record_num for determinism."""
    from ..plans.rank import global_row_number

    ranked, _n = global_row_number(points, [time_col, "record_num"], out="sort_index")
    return ranked
