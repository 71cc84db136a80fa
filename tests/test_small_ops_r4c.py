"""Round-4c named ops: directed 3x3 neighbor scans (Num*Neighbours,
Max/MinDownslopeElevChange, MaxUpslopeElevChange), RelativeAspect,
CircularVarianceOfAspect, MaxDifferenceFromMean. Each Spark plan is
checked against a direct numpy transcription of the reference tool's
per-cell rule (strict-first-win scan order included)."""

import math

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators import focal as FO
from whitebox_tools_spark.operators import hydro as HY

META = GridMeta(rows=8, columns=8, north=80.0, south=0.0, east=80.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)

DX = HY.D8_DX
DY = HY.D8_DY


def _grid(seed=7, n=8):
    rng = np.random.RandomState(seed)
    return np.round(rng.uniform(0, 100, size=(n, n)), 1)


def _cells(spark, z):
    rows = [(r, c, float(z[r, c]))
            for r in range(z.shape[0]) for c in range(z.shape[1])]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _asmap(df):
    return {(r["row"], r["col"]): r["value"] for r in df.collect()}


def _lengths(meta):
    diag = math.sqrt(meta.resolution_x ** 2 + meta.resolution_y ** 2)
    return [diag, meta.resolution_x, diag, meta.resolution_y,
            diag, meta.resolution_x, diag, meta.resolution_y]


def _nbr(z, r, c, i):
    rr, cc = r + DY[i], c + DX[i]
    if 0 <= rr < z.shape[0] and 0 <= cc < z.shape[1]:
        return z[rr, cc]
    return None


def test_num_downslope_neighbours(spark):
    z = _grid()
    out = _asmap(HY.num_downslope_neighbours(_cells(spark, z), META))
    for r in range(8):
        for c in range(8):
            want = sum(1 for i in range(8)
                       if (_nbr(z, r, c, i) is not None
                           and _nbr(z, r, c, i) < z[r, c]))
            assert out[(r, c)] == float(want)


def test_num_upslope_neighbours(spark):
    z = _grid(11)
    out = _asmap(HY.num_upslope_neighbours(_cells(spark, z), META))
    for r in range(8):
        for c in range(8):
            want = sum(1 for i in range(8)
                       if (_nbr(z, r, c, i) is not None
                           and _nbr(z, r, c, i) > z[r, c]))
            assert out[(r, c)] == float(want)


def _elev_change_ref(z, r, c, kind, lengths):
    best_slope = math.inf if kind == "min_down" else -math.inf
    best_chg = 0.0
    for i in range(8):
        zn = _nbr(z, r, c, i)
        if zn is None:
            continue
        if kind == "max_down" and zn < z[r, c]:
            s = (z[r, c] - zn) / lengths[i]
            if s > best_slope:
                best_slope, best_chg = s, z[r, c] - zn
        elif kind == "min_down" and zn <= z[r, c]:
            s = (z[r, c] - zn) / lengths[i]
            if s < best_slope:
                best_slope, best_chg = s, z[r, c] - zn
        elif kind == "max_up" and zn > z[r, c]:
            s = (zn - z[r, c]) / lengths[i]
            if s > best_slope:
                best_slope, best_chg = s, zn - z[r, c]
    return best_chg


@pytest.mark.parametrize("kind,fn", [
    ("max_down", HY.max_downslope_elev_change),
    ("min_down", HY.min_downslope_elev_change),
    ("max_up", HY.max_upslope_elev_change),
])
def test_elev_change_scans(spark, kind, fn):
    z = _grid(23)
    lengths = _lengths(META)
    out = _asmap(fn(_cells(spark, z), META))
    for r in range(8):
        for c in range(8):
            want = _elev_change_ref(z, r, c, kind, lengths)
            assert out[(r, c)] == pytest.approx(want, abs=1e-12), (r, c)


def test_relative_aspect(spark):
    """Azimuth-invariant checks: a flat plane is undefined (-1)
    everywhere; on a uniform east-facing ramp the relative aspect to
    azimuth=90 is 0 and to azimuth=270 is 180 (interior cells); output
    domain is [-1] U [0, 180]."""
    flat = np.full((8, 8), 5.0)
    out = _asmap(FO.relative_aspect(_cells(spark, flat), META, azimuth=45.0))
    assert all(v == -1.0 for v in out.values())

    # z increases to the east -> aspect faces west (270 deg)
    ramp = np.tile(np.arange(8, dtype=float) * 10.0, (8, 1))
    to270 = _asmap(FO.relative_aspect(_cells(spark, ramp), META, azimuth=270.0))
    to90 = _asmap(FO.relative_aspect(_cells(spark, ramp), META, azimuth=90.0))
    for r in range(2, 6):
        for c in range(2, 6):
            assert to270[(r, c)] == pytest.approx(0.0, abs=1e-9)
            assert to90[(r, c)] == pytest.approx(180.0, abs=1e-9)
    rnd = _grid(31)
    for v in _asmap(FO.relative_aspect(_cells(spark, rnd), META,
                                       azimuth=45.0)).values():
        assert v == -1.0 or (0.0 <= v <= 180.0)


def test_circular_variance_of_aspect(spark):
    """Flat plane -> every unit vector is (0,0) (fx == 0 guard), so the
    circular variance is 1 everywhere; a uniform slope -> identical unit
    vectors, variance 0 (interior)."""
    flat = np.full((8, 8), 5.0)
    out = _asmap(FO.circular_variance_of_aspect(_cells(spark, flat), META,
                                                filter_size=3))
    assert all(v == pytest.approx(1.0) for v in out.values())

    ramp = np.tile(np.arange(8, dtype=float) * 10.0, (8, 1))
    out2 = _asmap(FO.circular_variance_of_aspect(_cells(spark, ramp), META,
                                                 filter_size=3))
    # interior: all unit vectors identical -> resultant length == n
    for r in range(2, 6):
        for c in range(2, 6):
            assert out2[(r, c)] == pytest.approx(0.0, abs=1e-12)


def test_max_diff_from_mean(spark):
    z = _grid(41)
    out = FO.max_diff_from_mean(_cells(spark, z), [1, 2])
    rows = {(r["row"], r["col"]): (r["value"], r["scale"])
            for r in out.collect()}
    for r in range(8):
        for c in range(8):
            cands = []
            for rad in (1, 2):
                win = z[max(r - rad, 0):r + rad + 1,
                        max(c - rad, 0):c + rad + 1]
                cands.append((z[r, c] - win.mean(), rad))
            want = min(cands, key=lambda t: (-abs(t[0]), t[1]))
            got = rows[(r, c)]
            assert got[0] == pytest.approx(want[0], abs=1e-9)
            assert got[1] == want[1]
