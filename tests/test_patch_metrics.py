"""Patch-shape metrics: narrowness (circle analytic), edge proportion,
boundary shape complexity ordering, hole proportion."""

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators import raster as R
from whitebox_tools_spark.operators.vector_ops import hole_proportion

N = 40
META = GridMeta(rows=N, columns=N, north=400.0, south=0.0, east=400.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)


def _patches(spark, mask_fn):
    rows = []
    for r in range(N):
        for c in range(N):
            pid = mask_fn(r, c)
            if pid:
                rows.append((r, c, float(pid)))
    return spark.createDataFrame(rows, "row long, col long, value double")


def test_narrowness_circle_vs_bar(spark):
    # patch 1: disc radius 8 cells; patch 2: 2x20 bar
    def f(r, c):
        if (r - 12) ** 2 + (c - 12) ** 2 <= 64:
            return 1
        if 30 <= r <= 31 and 5 <= c <= 24:
            return 2
        return 0

    out = {}
    for row in R.narrowness_index(_patches(spark, f), META).collect():
        out[row["patch_id"]] = row["value"]
    # disc: NI ~ 1 (area ~ pi MD^2); bar: much higher
    assert 0.5 < out[1.0] < 2.0, out
    assert out[2.0] > 3.0 * out[1.0], out


def test_edge_proportion_values(spark):
    # 4x4 square: 12 of 16 cells are edge
    def f(r, c):
        return 1 if 10 <= r <= 13 and 10 <= c <= 13 else 0

    out = {(r["row"], r["col"]): r["value"]
           for r in R.edge_proportion(_patches(spark, f), META).collect()}
    assert len(out) == 16
    assert abs(next(iter(out.values())) - 12.0 / 16.0) < 1e-12


def test_bsc_simple_vs_spurred(spark):
    # patch 1: clean bar; patch 2: bar with perpendicular spurs
    def f(r, c):
        if 5 <= r <= 8 and 5 <= c <= 30:
            return 1
        if 20 <= r <= 23 and 5 <= c <= 30:
            return 2
        if 14 <= r <= 19 and c in (8, 16, 24):
            return 2  # spurs hanging off patch 2
        return 0

    got = {}
    for row in R.boundary_shape_complexity(_patches(spark, f), META).collect():
        got[row["patch_id"]] = row["value"]
    assert got[2.0] > got[1.0], got


def test_hole_proportion_analytic(spark):
    # 10x10 shell with 4x4 hole: prop = 16/100
    shell = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    hole = [(3.0, 3.0), (7.0, 3.0), (7.0, 7.0), (3.0, 7.0), (3.0, 3.0)]
    rows = [(1, [
        {"part_idx": 0, "is_hole": False,
         "ring": [{"x": x, "y": y} for x, y in shell]},
        {"part_idx": 1, "is_hole": True,
         "ring": [{"x": x, "y": y} for x, y in hole]},
    ])]
    df = spark.createDataFrame(
        rows, "shape_id long, parts array<struct<part_idx:int,is_hole:boolean,"
              "ring:array<struct<x:double,y:double>>>>")
    out = hole_proportion(df).collect()
    assert abs(out[0]["hole_prop"] - 0.16) < 1e-12
