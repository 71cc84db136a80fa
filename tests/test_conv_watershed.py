"""Convolution filters + watershed/snap pour point tests."""

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators import focal as FO
from whitebox_tools_spark.operators import hydro as HY


def _df(spark, vals):
    rows = [(r, c, float(vals[r][c])) for r in range(len(vals)) for c in range(len(vals[0]))]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _grid(df, col="value"):
    return {(r["row"], r["col"]): r[col] for r in df.collect()}


def test_laplacian_matches_numpy(spark):
    rng = np.random.RandomState(5)
    vals = rng.randint(0, 40, size=(8, 8)).astype(float)
    got = _grid(FO.laplacian_filter(_df(spark, vals.tolist())))
    k = np.array(FO.LAPLACIAN_3X3_1)
    assert set(got) == {(r, c) for r in range(1, 7) for c in range(1, 7)}
    for (r, c), v in got.items():
        win = vals[r - 1:r + 2, c - 1:c + 2]
        assert v == pytest.approx((win * k).sum())


def test_sobel_magnitude(spark):
    vals = [[float(c) for c in range(6)] for _ in range(6)]  # plane: d/dx = 1
    got = _grid(FO.sobel_filter(_df(spark, vals)))
    for v in got.values():
        assert v == pytest.approx(8.0)  # |gx| = 8 on a unit-slope plane


def test_emboss_direction(spark):
    vals = [[float(r * 5) for _ in range(5)] for r in range(5)]
    got = _grid(FO.emboss_filter(_df(spark, vals), "n"))
    # kernel n: -1 at north, +1 at south -> z_s - z_n = 10
    assert all(v == pytest.approx(10.0) for v in got.values())


def test_watershed_first_outlet_shadows(spark):
    meta = GridMeta(rows=1, columns=6, north=10.0, south=0.0, east=60.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    vals = [[5.0, 4.0, 3.0, 2.0, 1.0, 0.0]]  # flow east along the row
    df = _df(spark, vals)
    outlets = spark.createDataFrame([(100, 0, 3), (200, 0, 5)],
                                    "outlet_id long, row long, col long")
    got = _grid(HY.watershed(df, meta, outlets))
    # cells 0..3 hit outlet at col3 FIRST (shadows the one at col5)
    for c in range(4):
        assert got[(0, c)] == 100.0
    for c in (4, 5):
        assert got[(0, c)] == 200.0


def test_watershed_unlabeled_cells_absent(spark):
    meta = GridMeta(rows=1, columns=4, north=10.0, south=0.0, east=40.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    vals = [[0.0, 1.0, 1.0, 0.0]]  # two pits at the ends
    df = _df(spark, vals)
    outlets = spark.createDataFrame([(7, 0, 0)], "outlet_id long, row long, col long")
    got = _grid(HY.watershed(df, meta, outlets))
    assert (0, 0) in got and (0, 1) in got
    assert (0, 3) not in got  # drains to the unmonitored pit
    # col2: ties between neighbors 1.0/0.0 -> flows toward the lower
    # east pit (steepest), also unlabeled
    assert (0, 2) not in got


def test_snap_pour_points(spark):
    vals = [[0.0, 0.0, 0.0],
            [0.0, 1.0, 9.0],
            [0.0, 0.0, 0.0]]
    accum = _df(spark, vals)
    pour = spark.createDataFrame([(1, 1, 1)], "pour_id long, row long, col long")
    out = HY.snap_pour_points(pour, accum, snap_cells=1).collect()[0]
    assert (out["row"], out["col"]) == (1, 2)
