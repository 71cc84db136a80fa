"""Viewshed / horizon angle tests."""

import math

import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators.visibility import horizon_angle, viewshed


def _df(spark, vals):
    rows = [(r, c, float(vals[r][c])) for r in range(len(vals)) for c in range(len(vals[0]))]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _grid(df):
    return {(r["row"], r["col"]): r["value"] for r in df.collect()}


def test_viewshed_wall_blocks(spark):
    # flat plain with a wall at col 2; viewpoint at col 0
    vals = [[0.0, 0.0, 50.0, 0.0, 0.0, 0.0]]
    meta = GridMeta(rows=1, columns=6, north=10.0, south=0.0, east=60.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    got = _grid(viewshed(_df(spark, vals), meta, 0, 0, vp_height=2.0))
    assert got[(0, 0)] == 1.0 and got[(0, 1)] == 1.0
    assert got[(0, 2)] == 1.0  # the wall top itself is visible
    for c in (3, 4, 5):
        assert got[(0, c)] == 0.0  # shadowed behind the wall


def test_viewshed_open_plain_all_visible(spark):
    vals = [[0.0] * 5 for _ in range(5)]
    meta = GridMeta(rows=5, columns=5, north=50.0, south=0.0, east=50.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    got = _grid(viewshed(_df(spark, vals), meta, 2, 2))
    assert all(v == 1.0 for v in got.values())


def test_horizon_angle_east_wall(spark):
    vals = [[0.0, 0.0, 0.0, 30.0]]
    meta = GridMeta(rows=1, columns=4, north=10.0, south=0.0, east=40.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    got = _grid(horizon_angle(_df(spark, vals), meta, azimuth=90.0))
    # from col 0 the wall at distance 30 rises 30 -> angle atan(1)
    assert got[(0, 0)] == pytest.approx(math.atan(1.0))
    # from col 2 the wall at distance 10 rises 30 -> atan(3)
    assert got[(0, 2)] == pytest.approx(math.atan(3.0))
    # nothing east of the wall
    assert got[(0, 3)] == 0.0
