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


def lidar_join(clouds: list[DataFrame]) -> DataFrame:
    """LidarJoin: bag union of point clouds."""
    return reduce(lambda a, b: a.unionByName(b), clouds)


def eliminate_coincident_points(points: DataFrame, tolerance: float,
                                x: str = "x", y: str = "y",
                                order_col: str = "record_num") -> DataFrame:
    """Drop points that fall in the same tolerance cell, keeping the
    first by record order (eliminate_coincident_points.rs snap-cell
    semantics)."""
    return lidar_thin(points, tolerance, x=x, y=y, order_col=order_col)
