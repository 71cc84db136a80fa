"""Round-4c image/generator ops: CorrectVignetting,
GaussianContrastStretch, UserDefinedWeightsFilter, ImageStackProfile,
RandomField, RandomSample."""

import math

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators import enhancement as EN
from whitebox_tools_spark.operators import focal as FO
from whitebox_tools_spark.operators import raster as R

META = GridMeta(rows=10, columns=10, north=100.0, south=0.0, east=100.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)


def _cells(spark, z):
    rows = [(r, c, float(z[r, c]))
            for r in range(z.shape[0]) for c in range(z.shape[1])]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _asmap(df):
    return {(r["row"], r["col"]): r["value"] for r in df.collect()}


def test_correct_vignetting(spark):
    rng = np.random.RandomState(2)
    z = np.round(rng.uniform(50, 200, size=(10, 10)), 1)
    out = _asmap(EN.correct_vignetting(_cells(spark, z), META,
                                       pp_col=4.5, pp_row=4.5))
    # output range equals input range (the loop-2 rescale)
    assert min(out.values()) == pytest.approx(z.min(), abs=1e-9)
    assert max(out.values()) == pytest.approx(z.max(), abs=1e-9)
    # a corner cell is brightened relative to the principal point given
    # equal input values
    flat = np.full((10, 10), 100.0)
    flat[9, 9] = 50.0  # establish a nonzero range so the rescale is monotone
    o2 = _asmap(EN.correct_vignetting(_cells(spark, flat), META,
                                      pp_col=4.5, pp_row=4.5))
    assert o2[(0, 0)] > o2[(4, 4)]


def test_gaussian_contrast_stretch(spark):
    rng = np.random.RandomState(4)
    z = np.round(rng.uniform(0, 255, size=(10, 10)), 0)
    out = _asmap(EN.gaussian_contrast_stretch(_cells(spark, z)))
    vals = np.array(list(out.values()))
    assert vals.min() >= -3.0 - 1e-9 and vals.max() <= 3.0 + 1e-9
    # monotone: higher input -> no lower output
    pairs = sorted((z[k], out[k]) for k in out)
    for (a, oa), (b, ob) in zip(pairs, pairs[1:]):
        if b > a:
            assert ob >= oa - 1e-12


def test_user_defined_weights_filter(spark):
    z = np.arange(100, dtype=float).reshape(10, 10)
    k = [[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]]
    out = _asmap(FO.user_defined_filter(_cells(spark, z), k))
    # interior only
    assert (0, 0) not in out
    r, c = 5, 5
    want = sum(k[i][j] * z[r + i - 1, c + j - 1]
               for i in range(3) for j in range(3))
    assert out[(r, c)] == want


def test_image_stack_profile(spark):
    a = np.full((10, 10), 7.0)
    b = np.full((10, 10), 9.0)
    pts = spark.createDataFrame(
        [(1, 15.0, 85.0, 0.0), (2, 55.0, 45.0, 0.0)],
        "record_num long, x double, y double, value double")
    out = EN.image_stack_profile(
        [_cells(spark, a), _cells(spark, b)], pts, META).collect()
    got = {(r["record_num"], r["image_num"]): r["value"] for r in out}
    assert got == {(1, 1): 7.0, (1, 2): 9.0, (2, 1): 7.0, (2, 2): 9.0}


def test_random_field(spark):
    out = R.random_field(spark, META, seed=1)
    vals = np.array([r["value"] for r in out.collect()])
    assert len(vals) == 100
    # roughly standard normal, deterministic
    assert abs(vals.mean()) < 0.5
    assert 0.5 < vals.std() < 1.6
    again = np.array([r["value"] for r in
                      R.random_field(spark, META, seed=1).collect()])
    assert np.array_equal(np.sort(vals), np.sort(again))


def test_random_sample(spark):
    z = np.zeros((10, 10))
    out = R.random_sample(_cells(spark, z), META, num_samples=17, seed=3)
    rows = out.collect()
    assert len(rows) == 17
    assert sorted(r["value"] for r in rows) == [float(i) for i in
                                                range(1, 18)]
    cells = {(r["row"], r["col"]) for r in rows}
    assert len(cells) == 17
