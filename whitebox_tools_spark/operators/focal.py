"""Focal (moving-window) raster operators — WBT's window functions.

Reference anchors:
- MeanFilter / MinFilter / MaxFilter / RangeFilter / TotalFilter /
  MedianFilter / MajorityFilter / DiversityFilter:
  whitebox-tools-app/src/tools/image_analysis/{mean_filter,minimum_filter,
  maximum_filter,range_filter,total_filter,median_filter,majority_filter,
  diversity_filter}.rs
- Slope / Aspect / Hillshade (Horn 3x3 weighted differences + z_factor):
  terrain_analysis/slope.rs:301-326, aspect.rs, hillshade.rs

Two physical plans:

1. **scatter-gather (groupBy) plan** — each cell scatters its value to
   the (2r+1)^2 window centers it contributes to (explode of constant
   offsets, pure codegen), then one hash aggregation on (row, col).
   Exactly one shuffle; partial aggregation is map-side. Edge cells
   aggregate over their existing neighbors (WBT edge semantics).
   Works for any stat expressible as a Spark aggregate.

2. **tile + halo plan** (`focal_filter_halo`) — cells scatter to their
   own tile plus neighboring tiles within the halo; one numpy kernel per
   tile computes the dense windowed stat via sliding_window_view. This
   is the scale plan for large kernels (k^2 scatter cost becomes one
   O(tile) kernel); emits only cells with a complete window.

Determinism note: the derived test rasters carry integer-valued doubles,
so SUM/AVG are exact in any accumulation order — the groupBy plan, the
numpy kernel and the DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..functions.raster_math import GridMeta

# ---------------------------------------------------------------------------
# Plan 1: scatter-gather focal stats
# ---------------------------------------------------------------------------


def _scatter(cells: DataFrame, radius: int) -> DataFrame:
    offs = [(dr, dc) for dr in range(-radius, radius + 1) for dc in range(-radius, radius + 1)]
    pairs = ", ".join(f"STRUCT(row + ({dr}L) AS crow, col + ({dc}L) AS ccol)" for dr, dc in offs)
    return (
        cells.withColumn("__n", F.expr(f"EXPLODE(ARRAY({pairs}))"))
        .selectExpr("__n.crow AS row", "__n.ccol AS col", "value AS nv")
    )


_FOCAL_AGGS = {
    "mean": "AVG(nv)",
    "sum": "SUM(nv)",
    "min": "MIN(nv)",
    "max": "MAX(nv)",
    "range": "MAX(nv) - MIN(nv)",
    "total": "SUM(nv)",
    # lower median over the sorted window values (deterministic; FLOOR
    # keeps the index identical across engines — bare CAST of x.5 to int
    # truncates on Spark but rounds on DuckDB)
    "median": "ELEMENT_AT(ARRAY_SORT(COLLECT_LIST(nv)), CAST(FLOOR((COUNT(nv) + 1) / 2) AS INT))",
    "diversity": "CAST(COUNT(DISTINCT nv) AS DOUBLE)",
}


def focal_stat(cells: DataFrame, stat: str, radius: int = 1,
               meta: GridMeta | None = None) -> DataFrame:
    """Focal statistic over a (2r+1)^2 square window.

    Output: (row, col, value) for every window center that exists in the
    input raster; edge centers use their available neighbors.
    """
    agg = _FOCAL_AGGS[stat]
    scattered = _scatter(cells, radius)
    if meta is not None:
        scattered = scattered.where(F.expr(meta.in_grid_pred("row", "col")))
    out = scattered.groupBy("row", "col").agg(F.expr(f"{agg}").alias("value"))
    # keep only real centers (scatter also hits cells outside the raster
    # footprint / nodata holes)
    return out.join(cells.select("row", "col"), ["row", "col"], "leftsemi")


def focal_percentile(cells: DataFrame, p: float, radius: int = 1) -> DataFrame:
    """PercentileFilter (image_analysis/percentile_filter.rs semantics):
    the window value at sorted index floor((n-1)*p) (0-based) —
    deterministic nearest-rank rule."""
    scattered = _scatter(cells, radius)
    agg = (f"ELEMENT_AT(ARRAY_SORT(COLLECT_LIST(nv)), "
           f"CAST(FLOOR((COUNT(nv) - 1) * {p!r}) AS INT) + 1)")
    out = scattered.groupBy("row", "col").agg(F.expr(agg).alias("value"))
    return out.join(cells.select("row", "col"), ["row", "col"], "leftsemi")


def majority_filter(cells: DataFrame, radius: int = 1) -> DataFrame:
    """MajorityFilter: modal value of the window; ties resolve to the
    smallest value (deterministic)."""
    scattered = _scatter(cells, radius)
    counts = scattered.groupBy("row", "col", "nv").agg(F.count(F.lit(1)).alias("c"))
    out = counts.groupBy("row", "col").agg(
        F.expr("MIN_BY(nv, STRUCT(-c, nv))").alias("value")
    )
    return out.join(cells.select("row", "col"), ["row", "col"], "leftsemi")


# ---------------------------------------------------------------------------
# Generic convolution (image_analysis kernel filters)
# ---------------------------------------------------------------------------

# kernel anchors: laplacian_filter.rs:330-346 (variant weight tables),
# emboss_filter.rs:339-347 (directional), sobel_filter.rs:330 (magnitude
# = sqrt(gx^2 + gy^2) of the two 3x3 gradient kernels)
LAPLACIAN_3X3_1 = [[0.0, -1.0, 0.0], [-1.0, 4.0, -1.0], [0.0, -1.0, 0.0]]
LAPLACIAN_3X3_2 = [[0.0, -1.0, 0.0], [-1.0, 5.0, -1.0], [0.0, -1.0, 0.0]]
LAPLACIAN_3X3_3 = [[-1.0, -1.0, -1.0], [-1.0, 8.0, -1.0], [-1.0, -1.0, -1.0]]
SOBEL_X = [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]
SOBEL_Y = [[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]]
PREWITT_X = [[-1.0, 0.0, 1.0], [-1.0, 0.0, 1.0], [-1.0, 0.0, 1.0]]
PREWITT_Y = [[-1.0, -1.0, -1.0], [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]
EMBOSS = {
    "n": [[0.0, -1.0, 0.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
    "s": [[0.0, 1.0, 0.0], [0.0, 0.0, 0.0], [0.0, -1.0, 0.0]],
    "e": [[0.0, 0.0, 0.0], [1.0, 0.0, -1.0], [0.0, 0.0, 0.0]],
    "w": [[0.0, 0.0, 0.0], [-1.0, 0.0, 1.0], [0.0, 0.0, 0.0]],
}


def convolve(cells: DataFrame, kernels: dict[str, list[list[float]]],
             interior_only: bool = True) -> DataFrame:
    """Convolve one or more (same-sized) kernels in a single scatter
    pass: out_k(r, c) = sum_ij k[i][j] * in(r + i - m, c + j - m).
    Output: (row, col, <one column per kernel name>). interior_only
    keeps centers whose full window exists (the kernel-filter edge rule
    for derivative kernels)."""
    names = list(kernels)
    size = len(next(iter(kernels.values())))
    m = size // 2
    elems = []
    for i in range(size):
        for j in range(size):
            ws = ", ".join(f"{kernels[n][i][j]!r} AS w_{n}" for n in names)
            elems.append(
                f"STRUCT(row - ({i - m}L) AS crow, col - ({j - m}L) AS ccol, {ws})"
            )
    scattered = (
        cells.withColumn("__s", F.expr(f"EXPLODE(ARRAY({', '.join(elems)}))"))
        .selectExpr("__s.crow AS row", "__s.ccol AS col", "value AS nv",
                    *[f"__s.w_{n} AS w_{n}" for n in names])
    )
    aggs = [F.expr(f"SUM(w_{n} * nv)").alias(n) for n in names]
    aggs.append(F.count(F.lit(1)).alias("__cnt"))
    out = scattered.groupBy("row", "col").agg(*aggs)
    if interior_only:
        out = out.where(F.col("__cnt") == size * size)
    return out.drop("__cnt").join(cells.select("row", "col"), ["row", "col"], "leftsemi")


def laplacian_filter(cells: DataFrame, variant: str = "3x3(1)") -> DataFrame:
    k = {"3x3(1)": LAPLACIAN_3X3_1, "3x3(2)": LAPLACIAN_3X3_2,
         "3x3(3)": LAPLACIAN_3X3_3}[variant]
    return convolve(cells, {"v": k}).withColumnRenamed("v", "value")


def sobel_filter(cells: DataFrame) -> DataFrame:
    out = convolve(cells, {"gx": SOBEL_X, "gy": SOBEL_Y})
    return out.selectExpr("row", "col", "SQRT(gx * gx + gy * gy) AS value")


def prewitt_filter(cells: DataFrame) -> DataFrame:
    out = convolve(cells, {"gx": PREWITT_X, "gy": PREWITT_Y})
    return out.selectExpr("row", "col", "SQRT(gx * gx + gy * gy) AS value")


def emboss_filter(cells: DataFrame, direction: str = "n") -> DataFrame:
    return convolve(cells, {"v": EMBOSS[direction]}).withColumnRenamed("v", "value")


# ---------------------------------------------------------------------------
# Integral image (Crow 1984) — the reference's O(1)-window mean machinery
# (image_analysis/mean_filter.rs:28,301-338, IntegralImage tool)
# ---------------------------------------------------------------------------


def integral_image(cells: DataFrame) -> DataFrame:
    """ii(r, c) = sum of values with row <= r AND col <= c, via two
    cumulative-sum window passes (row-wise then column-wise). Requires a
    dense raster (no missing cells inside the footprint)."""
    from pyspark.sql import Window

    w1 = Window.partitionBy("row").orderBy("col").rowsBetween(Window.unboundedPreceding, 0)
    rowcum = cells.withColumn("__rc", F.sum("value").over(w1))
    w2 = Window.partitionBy("col").orderBy("row").rowsBetween(Window.unboundedPreceding, 0)
    return rowcum.withColumn("ii", F.sum("__rc").over(w2)).select("row", "col", "ii")


def mean_filter_ii(cells: DataFrame, meta: GridMeta, radius: int = 1) -> DataFrame:
    """MeanFilter via the integral image: window sum = 4 corner lookups
    (equi-joins), mean = sum / clamped-window cell count. On a dense
    raster this is bit-identical to focal_stat(..., 'mean') when values
    are integer-valued (exact sums), while costing O(1) work per cell
    for ANY kernel radius — the scale plan for big windows."""
    # eager localCheckpoint, not persist: the four corner joins reuse the
    # materialized blocks and the ContextCleaner reclaims them on GC (a
    # bare persist() here leaked cache for the session lifetime)
    ii = integral_image(cells).localCheckpoint(eager=True)
    b = cells.selectExpr(
        "row", "col",
        f"GREATEST(row - {radius}, 0L) AS r1",
        f"LEAST(row + {radius}, {meta.rows - 1}L) AS r2",
        f"GREATEST(col - {radius}, 0L) AS c1",
        f"LEAST(col + {radius}, {meta.columns - 1}L) AS c2",
    )

    def corner(df, rr, cc, name):
        c = ii.selectExpr(f"row AS __r_{name}", f"col AS __c_{name}", f"ii AS {name}")
        return df.join(
            c, (F.expr(rr) == F.col(f"__r_{name}")) & (F.expr(cc) == F.col(f"__c_{name}")),
            "left",
        ).drop(f"__r_{name}", f"__c_{name}")

    j = corner(b, "r2", "c2", "iA")
    j = corner(j, "r1 - 1", "c2", "iB")
    j = corner(j, "r2", "c1 - 1", "iC")
    j = corner(j, "r1 - 1", "c1 - 1", "iD")
    return j.selectExpr(
        "row", "col",
        "(iA - COALESCE(iB, 0.0) - COALESCE(iC, 0.0) + COALESCE(iD, 0.0)) "
        "/ CAST((r2 - r1 + 1) * (c2 - c1 + 1) AS DOUBLE) AS value",
    )


# ---------------------------------------------------------------------------
# 5x5 pivot + terrain derivatives (Florinsky polynomial fit)
# ---------------------------------------------------------------------------


def focal_pivot5(cells: DataFrame, z_factor: float = 1.0) -> DataFrame:
    """The 25-cell stencil of slope.rs / aspect.rs / hillshade.rs as
    columns z_0..z_24, where z_n sits at (row + (n//5 - 2),
    col + (n%5 - 2)). Missing neighbors (edges / nodata holes) take the
    center value — the references' `z[n] = z12 * z_factor` substitution.
    One shuffle (scatter + pivot aggregation)."""
    # a cell's value reaches center (row - dr, col - dc) as that center's
    # z_n, so z_n(center) = value(center + (dr, dc)) with dr = n//5 - 2,
    # dc = n%5 - 2 (the reference's offsets[n] = [dc, dr] indexing)
    pairs = ", ".join(
        f"STRUCT(row - ({n // 5 - 2}L) AS crow, col - ({n % 5 - 2}L) AS ccol, {n} AS n)"
        for n in range(25)
    )
    scattered = (
        cells.withColumn("__s", F.expr(f"EXPLODE(ARRAY({pairs}))"))
        .selectExpr("__s.crow AS row", "__s.ccol AS col", "__s.n AS n", "value AS nv")
    )
    aggs = [
        F.expr(f"MAX(CASE WHEN n = {n} THEN nv END)").alias(f"z_{n}") for n in range(25)
    ]
    piv = scattered.groupBy("row", "col").agg(*aggs)
    # keep only real centers (z_12 is the center offset), substitute the
    # center for missing neighbors, apply z_factor per-z like the loop
    piv = piv.where(F.col("z_12").isNotNull())
    zs = [f"(COALESCE(z_{n}, z_12) * {z_factor!r}) AS z{n}" for n in range(25)]
    return piv.selectExpr("row", "col", *zs)


def _florinsky_pq(res: float) -> tuple[str, str]:
    """p, q from Florinsky (2016) ch.4 pg.117 — exact transcription of
    slope.rs:294-301 (identical text in aspect.rs / hillshade.rs);
    res = (resolution_x + resolution_y) / 2.

    The 1/(420*res) scale is folded in Python (same two IEEE-754 ops as
    the reference) and embedded as a literal: an all-literal `1.0 /
    (420.0 * res)` would be evaluated in DECIMAL arithmetic by DuckDB
    (literals are decimals there), silently changing the oracle value.
    """
    scale = 1.0 / (420.0 * res)
    p = (f"({scale!r} * (44.0 * (z3 + z23 - z1 - z21) + "
         f"31.0 * (z0 + z20 - z4 - z24 + 2.0 * (z8 + z18 - z6 - z16)) + "
         f"17.0 * (z14 - z10 + 4.0 * (z13 - z11)) + 5.0 * (z9 + z19 - z5 - z15)))")
    q = (f"({scale!r} * (44.0 * (z5 + z9 - z15 - z19) + "
         f"31.0 * (z20 + z24 - z0 - z4 + 2.0 * (z6 + z8 - z16 - z18)) + "
         f"17.0 * (z2 - z22 + 4.0 * (z7 - z17)) + 5.0 * (z1 + z3 - z21 - z23)))")
    return p, q


def slope(cells: DataFrame, meta: GridMeta, z_factor: float = 1.0,
          units: str = "degrees") -> DataFrame:
    """Slope via the Florinsky 5x5 fit (slope.rs:294-330).

    units: 'degrees' | 'radians' | 'percent'. The oracle gate uses
    'percent' (sqrt is correctly rounded everywhere; atan is not
    guaranteed bit-identical across libm implementations).
    """
    res = (meta.resolution_x + meta.resolution_y) / 2.0
    p, q = _florinsky_pq(res)
    mag = f"SQRT({p} * {p} + {q} * {q})"
    value = {
        "degrees": f"DEGREES(ATAN({mag}))",
        "radians": f"ATAN({mag})",
        "percent": f"{mag} * 100.0",
    }[units]
    return focal_pivot5(cells, z_factor).selectExpr("row", "col", f"{value} AS value")


def aspect(cells: DataFrame, meta: GridMeta, z_factor: float = 1.0) -> DataFrame:
    """Aspect in degrees clockwise from north (aspect.rs:285-294):
    -90(1-sign q)(1-|sign p|) + 180(1+sign p) - (180/pi) sign(p)
    acos(-q / sqrt(p^2+q^2)); -1 (undefined) where p == 0."""
    res = (meta.resolution_x + meta.resolution_y) / 2.0
    p, q = _florinsky_pq(res)
    sp = f"SIGN({p})"
    sq = f"SIGN({q})"
    formula = (f"(-90.0 * (1.0 - {sq}) * (1.0 - ABS({sp})) + 180.0 * (1.0 + {sp}) "
               f"- 180.0 / PI() * {sp} * ACOS(-({q}) / SQRT({p} * {p} + {q} * {q})))")
    value = f"CASE WHEN {p} <> 0.0 THEN {formula} ELSE -1.0 END"
    return focal_pivot5(cells, z_factor).selectExpr("row", "col", f"{value} AS value")


def hillshade_value_expr(meta: GridMeta, azimuth: float = 315.0,
                         altitude: float = 30.0) -> str:
    """Hillshade value over z0..z24 pivot columns (hillshade.rs:293-378):
    Florinsky p/q, tan_slope clamped at 0.00017, aspect = pi - atan(q/p)
    + (pi/2)sign(p) (pi where p==0), val = round(term1*(term2-term3) *
    32767) clamped at 0. Portable SQL (also builds the DuckDB oracle)."""
    import math

    res = (meta.resolution_x + meta.resolution_y) / 2.0
    p, q = _florinsky_pq(res)
    az = math.radians(azimuth - 90.0)
    sin_theta = math.sin(math.radians(altitude))
    cos_theta = math.cos(math.radians(altitude))
    ts = f"GREATEST(SQRT({p} * {p} + {q} * {q}), 0.00017)"
    aspect_r = (f"CASE WHEN {p} <> 0.0 THEN PI() - ATAN(({q}) / ({p})) "
                f"+ PI() / 2.0 * SIGN({p}) ELSE PI() END")
    term1 = f"({ts}) / SQRT(1.0 + ({ts}) * ({ts}))"
    term2 = f"{sin_theta!r} / ({ts})"
    term3 = f"{cos_theta!r} * SIN({az!r} - ({aspect_r}))"
    return f"ROUND(GREATEST((({term1}) * (({term2}) - ({term3}))) * 32767.0, 0.0))"


def hillshade(cells: DataFrame, meta: GridMeta, azimuth: float = 315.0,
              altitude: float = 30.0, z_factor: float = 1.0) -> DataFrame:
    value = hillshade_value_expr(meta, azimuth, altitude)
    return focal_pivot5(cells, z_factor).selectExpr("row", "col", f"{value} AS value")


# ---------------------------------------------------------------------------
# Plan 2: tile + halo numpy kernel
# ---------------------------------------------------------------------------


def focal_filter_halo(cells: DataFrame, meta: GridMeta, stat: str = "median",
                      radius: int = 1, tile: int = 64) -> DataFrame:
    """Tile+halo focal filter: one dense numpy kernel per tile.

    Cells scatter to every tile whose halo contains them (<= 4 tiles for
    halo < tile), then applyInPandas assembles the dense tile grid and
    computes the windowed stat with sliding_window_view. Only complete
    windows are emitted (interior rule), so results are independent of
    the tiling. Missing cells inside a window poison it via NaN and the
    center is dropped — same "all 9 present" rule as focal_pivot3.
    """
    r = radius
    tiles = (
        cells.withColumn(
            "__t",
            F.expr(
                f"EXPLODE(ARRAY_DISTINCT(ARRAY("
                f"STRUCT(CAST(FLOOR((row - {r}) / {tile}) AS BIGINT) AS tr, CAST(FLOOR((col - {r}) / {tile}) AS BIGINT) AS tc), "
                f"STRUCT(CAST(FLOOR((row - {r}) / {tile}) AS BIGINT) AS tr, CAST(FLOOR((col + {r}) / {tile}) AS BIGINT) AS tc), "
                f"STRUCT(CAST(FLOOR((row + {r}) / {tile}) AS BIGINT) AS tr, CAST(FLOOR((col - {r}) / {tile}) AS BIGINT) AS tc), "
                f"STRUCT(CAST(FLOOR((row + {r}) / {tile}) AS BIGINT) AS tr, CAST(FLOOR((col + {r}) / {tile}) AS BIGINT) AS tc))))"
            ),
        )
        .selectExpr("__t.tr AS tr", "__t.tc AS tc", "row", "col", "value")
    )
    schema = StructType([
        StructField("row", LongType(), False),
        StructField("col", LongType(), False),
        StructField("value", DoubleType(), False),
    ])
    size = 2 * r + 1

    def kernel(pdf) -> "object":
        import pandas as pd

        tr = int(pdf["tr"].iloc[0])
        tc = int(pdf["tc"].iloc[0])
        r0, c0 = tr * tile - r, tc * tile - r
        h = w = tile + 2 * r
        grid = np.full((h, w), np.nan)
        rr = pdf["row"].to_numpy() - r0
        cc = pdf["col"].to_numpy() - c0
        ok = (rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)
        grid[rr[ok], cc[ok]] = pdf["value"].to_numpy()[ok]
        win = np.lib.stride_tricks.sliding_window_view(grid, (size, size))
        flat = win.reshape(win.shape[0], win.shape[1], -1)
        # validity: every cell of the window present (NaN does NOT
        # propagate through sort-based stats, so track it explicitly)
        complete = ~np.isnan(flat).any(axis=2)
        if stat == "median":
            s = np.sort(flat, axis=2)
            out = s[:, :, (size * size + 1) // 2 - 1]
        elif stat == "mean":
            out = flat.mean(axis=2)
        elif stat == "min":
            out = flat.min(axis=2)
        elif stat == "max":
            out = flat.max(axis=2)
        else:
            raise ValueError(stat)
        # centers of complete windows, clipped to this tile's own extent
        rows, cols = np.meshgrid(
            np.arange(win.shape[0]) + r0 + r, np.arange(win.shape[1]) + c0 + r, indexing="ij"
        )
        own = ((rows >= tr * tile) & (rows < (tr + 1) * tile)
               & (cols >= tc * tile) & (cols < (tc + 1) * tile) & complete)
        return pd.DataFrame({"row": rows[own], "col": cols[own], "value": out[own]})

    return tiles.groupBy("tr", "tc").applyInPandas(kernel, schema=schema)
