"""Round-3 terrain/hydro misc: downslope index, max branch length,
flood order, stochastic depressions, cost pathway, raster<->streams,
clip/erase raster, fill missing data, edge filters, ROTO, FPS."""

import math

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators import focal as FO
from whitebox_tools_spark.operators import hydro as HY
from whitebox_tools_spark.operators import raster as R

N = 12
META = GridMeta(rows=N, columns=N, north=120.0, south=0.0, east=120.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)


def _df(spark, vals):
    rows = [(int(r), int(c), float(vals[r, c])) for r in range(N) for c in range(N)]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _grid(df):
    out = np.full((N, N), np.nan)
    for r in df.collect():
        out[int(r["row"]), int(r["col"])] = r["value"]
    return out


@pytest.fixture(scope="module")
def dem(spark):
    rng = np.random.RandomState(77)
    vals = rng.randint(0, 30, size=(N, N)) + np.arange(N)[:, None] * 4.0
    return _df(spark, vals), vals


def test_downslope_index_monotone_slope(spark):
    # pure north-south slope, dz = 4 per row (10 m): path goes straight N
    vals = np.repeat((np.arange(N) * 4.0)[:, None], N, axis=1)
    df = _df(spark, vals)
    g = _grid(HY.downslope_index(df, META, drop=7.9, out_type="distance"))
    # from any interior cell: 2 steps of 10 m reach drop 8 >= 7.9
    assert abs(g[6, 6] - 20.0) < 1e-9
    t = _grid(HY.downslope_index(df, META, drop=7.9, out_type="tangent"))
    assert abs(t[6, 6] - (8.0 / 20.0)) < 1e-9


def test_max_branch_length_brute(spark, dem):
    df, vals = dem
    got = _grid(HY.max_branch_length(df, META))
    up = _grid(HY.max_upslope_flowpath_length(df, META))
    down = _grid(HY.downslope_flowpath_length(df, META))
    want = np.nan_to_num(up) + np.nan_to_num(down)
    assert np.allclose(np.nan_to_num(got), want, atol=1e-9)


def test_flood_order_is_permutation_and_sorted(spark, dem):
    df, vals = dem
    g = _grid(HY.flood_order(df, META))
    order = g.ravel().astype(int)
    assert sorted(order) == list(range(1, N * N + 1))
    filled = _grid(HY.fill_depressions(df, META))
    flat_f = filled.ravel()
    idx = np.argsort(order)
    # filled elevation is non-decreasing along the flood order
    assert np.all(np.diff(flat_f[idx]) >= -1e-12)


def test_stochastic_depression_range_and_determinism(spark, dem):
    df, _ = dem
    a = _grid(HY.stochastic_depression_analysis(df, META, rmse=2.0,
                                                iterations=4))
    b = _grid(HY.stochastic_depression_analysis(df, META, rmse=2.0,
                                                iterations=4))
    assert np.array_equal(a, b)
    assert np.nanmin(a) >= 0.0 and np.nanmax(a) <= 1.0


def test_cost_pathway_traces_path(spark):
    cost = _df(spark, np.ones((N, N)))
    src = "(row = 0 AND col = 0)"
    back = HY.cost_backlink(cost, META, src)
    acc = HY.cost_distance(cost, META, src)
    path = _grid(HY.cost_pathway(acc, back, META,
                                 f"(row = {N - 1} AND col = {N - 1})"))
    # path runs along the diagonal (uniform cost)
    assert path[N - 1, N - 1] == 1.0
    assert path[0, 0] == 1.0
    n_path = int(np.nansum(path))
    assert n_path == N  # pure diagonal walk


def test_edge_preserving_mean_numpy(spark, dem):
    df, vals = dem
    got = _grid(FO.edge_preserving_mean_filter(df, radius=1, threshold=10.0))
    for r in range(N):
        for c in range(N):
            acc, cnt = 0.0, 0
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < N and 0 <= cc < N and \
                            abs(vals[rr, cc] - vals[r, c]) <= 10.0:
                        acc += vals[rr, cc]
                        cnt += 1
            assert abs(got[r, c] - acc / cnt) < 1e-9, (r, c)


def test_remove_off_terrain_objects_flattens_box(spark):
    vals = np.zeros((N, N))
    vals[5:7, 5:7] = 30.0  # building
    g = _grid(FO.remove_off_terrain_objects(_df(spark, vals), META,
                                            radius=2, slope_threshold=15.0))
    assert np.nanmax(g) < 1.0  # the box is gone
    assert np.allclose(g[0], 0.0)


def test_feature_preserving_smoothing_keeps_step(spark):
    rng = np.random.RandomState(11)
    vals = np.where(np.arange(N)[None, :] < 6, 0.0, 50.0) + rng.rand(N, N)
    sm = _grid(FO.feature_preserving_smoothing(_df(spark, vals), META,
                                               num_iter=2))
    # the 50-unit step survives
    assert sm[6, 7] - sm[6, 4] > 40.0
    # noise variance on the flat side decreases
    assert np.var(sm[2:10, 1:4]) < np.var(vals[2:10, 1:4])


def test_fill_missing_data_idw(spark, dem):
    df, vals = dem
    holes = df.where("NOT (row = 5 AND col = 5) AND NOT (row = 8 AND col = 2)")
    out = _grid(R.fill_missing_data(holes, META, radius=3))
    assert not np.isnan(out[5, 5]) and not np.isnan(out[8, 2])
    lo, hi = vals[4:7, 4:7].min(), vals[4:7, 4:7].max()
    assert lo - 5.0 <= out[5, 5] <= hi + 5.0


def test_edge_density_step(spark):
    vals = np.where(np.arange(N)[None, :] < 6, 0.0, 60.0)
    vals = np.repeat(vals, 1, axis=0) + np.zeros((N, N))
    g = _grid(FO.edge_density(_df(spark, vals), META, radius=2,
                              norm_diff_deg=5.0))
    assert g[6, 5] > g[6, 1]  # density peaks near the breakline


def test_raster_streams_roundtrip(spark, dem):
    df, _ = dem
    segs = HY.raster_streams_to_vector(df, META, threshold=4.0)
    rows = segs.collect()
    assert len(rows) > 0
    for r in rows[:20]:
        assert r["link_id"] >= 1.0
        d = math.hypot(r["x2"] - r["x1"], r["y2"] - r["y1"])
        assert d <= math.hypot(10.0, 10.0) + 1e-9
