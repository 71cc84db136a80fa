"""Visibility long tail: directional relief, fetch, visibility index,
time in daylight."""

import math

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators import visibility as VI

N = 24
META = GridMeta(rows=N, columns=N, north=240.0, south=0.0, east=240.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)


def _df(spark, vals):
    rows = [(int(r), int(c), float(vals[r, c])) for r in range(N) for c in range(N)]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _grid(df):
    out = np.full((N, N), np.nan)
    for r in df.collect():
        out[int(r["row"]), int(r["col"])] = r["value"]
    return out


def test_directional_relief_slope_plane(spark):
    # z increases northward (row 0 = north = highest): looking north
    # (azimuth 0) every on-ray cell is HIGHER -> relief positive,
    # and grows with distance from the north edge
    vals = np.repeat((N - 1 - np.arange(N))[:, None], N, axis=1) * 2.0
    g = _grid(VI.directional_relief(_df(spark, vals), META, azimuth=0.0))
    assert g[12, 12] > 0.0
    assert g[20, 12] > g[5, 12]


def test_fetch_analysis_wall(spark):
    # flat plane with a tall wall at row 4: looking north from south of
    # the wall, fetch = distance to the wall
    vals = np.zeros((N, N))
    vals[4, :] = 100.0
    g = _grid(VI.fetch_analysis(_df(spark, vals), META, azimuth=0.0,
                                increment=0.05))
    # from (10, 12): wall is 6 rows away = 60 m
    assert abs(g[10, 12] - 60.0) < 1e-6
    # north of the wall nothing obstructs: negative edge-truncated value
    assert g[2, 12] < 0.0


def test_visibility_index_peak_dominates(spark):
    # single central peak: the peak cell should be visible from most
    # stations; a pit cell adjacent to the peak sees less
    rng = np.random.RandomState(5)
    vals = rng.rand(N, N)
    vals[12, 12] = 50.0
    g = _grid(VI.visibility_index(_df(spark, vals), META, res_factor=8))
    assert g[12, 12] >= 0.9
    assert np.nanmean(g) <= 1.0


def test_time_in_daylight_valley_vs_ridge(spark):
    # deep east-west valley: valley floor gets less daylight than the
    # ridge tops
    vals = np.zeros((N, N))
    for r in range(N):
        vals[r, :] = abs(r - 12) * 30.0
    g = _grid(VI.time_in_daylight(_df(spark, vals), META, lat=45.0,
                                  n_azimuths=8, time_step_min=60))
    assert np.all((g[~np.isnan(g)] >= 0.0) & (g[~np.isnan(g)] <= 1.0))
    assert g[12, 12] < g[0, 12] + 1e-9
    assert g[12, 12] < 1.0


def test_horizon_angle_multi_matches_single(spark):
    """The one-plan multi-azimuth horizon equals per-azimuth calls
    bit-for-bit (same expressions, keyed by azid)."""
    from whitebox_tools_spark.operators.visibility import (horizon_angle,
                                                           horizon_angle_multi)

    rng = np.random.RandomState(13)
    vals = rng.rand(N, N) * 30.0
    df = _df(spark, vals)
    azs = [0.0, 75.0, 211.0]
    multi = {(r["azid"], r["row"], r["col"]): r["value"]
             for r in horizon_angle_multi(df, META, azs).collect()}
    for i, a in enumerate(azs):
        single = {(r["row"], r["col"]): r["value"]
                  for r in horizon_angle(df, META, azimuth=a).collect()}
        for (rr, cc), v in single.items():
            assert multi[(i, rr, cc)] == v, (a, rr, cc)
