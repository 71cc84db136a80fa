"""Raster geotransform math — cell <-> coordinate, WBT parity.

Reference formulas (whitebox-raster/src/lib.rs):
  x from column : x = west + res_x/2 + col*res_x            (lib.rs:728-735)
  y from row    : y = north - res_y/2 - row*res_y           (lib.rs:737-742)
  column from x : col = floor((x - west) / res_x)           (lib.rs:743-745)
  row from y    : row = floor((north - y) / res_y)          (lib.rs:747-749)

NN-gridding cell centers use the equivalent
  x = west + (col + 0.5)*res_x ; y = north - (row + 0.5)*res_y
(nearest_neighbour_gridding.rs:447-449). Both formula variants are
provided because their floating-point results can differ in the last ulp
— parity requires using the same variant as the tool being replicated.

Everything is emitted as portable SQL expression strings (identical text
runs in Spark SQL and DuckDB, giving bit-identical doubles).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class GridMeta:
    """Broadcastable replica of RasterConfigs (lib.rs:1260-1295)."""

    rows: int
    columns: int
    north: float
    south: float
    east: float
    west: float
    resolution_x: float
    resolution_y: float
    nodata: float = -32768.0  # default sentinel, lib.rs:1304

    # -- coordinate -> cell (lib.rs:743-749) --
    def col_from_x_expr(self, x_sql: str) -> str:
        return f"CAST(FLOOR((({x_sql}) - {self.west!r}) / {self.resolution_x!r}) AS BIGINT)"

    def row_from_y_expr(self, y_sql: str) -> str:
        return f"CAST(FLOOR(({self.north!r} - ({y_sql})) / {self.resolution_y!r}) AS BIGINT)"

    # -- cell -> coordinate, half-res form (lib.rs:728-742) --
    def x_from_col_expr(self, col_sql: str) -> str:
        half = self.resolution_x / 2.0
        return f"({self.west!r} + {half!r} + CAST({col_sql} AS DOUBLE) * {self.resolution_x!r})"

    def y_from_row_expr(self, row_sql: str) -> str:
        half = self.resolution_y / 2.0
        return f"({self.north!r} - {half!r} - CAST({row_sql} AS DOUBLE) * {self.resolution_y!r})"

    # -- cell -> coordinate, (c+0.5) form (nearest_neighbour_gridding.rs:447-449) --
    def x_center_expr(self, col_sql: str) -> str:
        return f"({self.west!r} + (CAST({col_sql} AS DOUBLE) + 0.5) * {self.resolution_x!r})"

    def y_center_expr(self, row_sql: str) -> str:
        return f"({self.north!r} - (CAST({row_sql} AS DOUBLE) + 0.5) * {self.resolution_y!r})"

    def in_grid_pred(self, row_sql: str = "row", col_sql: str = "col") -> str:
        return (
            f"({row_sql}) >= 0 AND ({row_sql}) < {self.rows} "
            f"AND ({col_sql}) >= 0 AND ({col_sql}) < {self.columns}"
        )
