"""TIN gridding tests — Delaunay kernel + linear-surface property."""

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators.tin import delaunay, interpolate_tin, tin_gridding


def test_delaunay_square():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    tris = delaunay(pts)
    assert len(tris) == 2
    assert {frozenset(t) for t in tris.tolist()} <= {
        frozenset(s) for s in ([0, 1, 2], [1, 2, 3], [0, 1, 3], [0, 2, 3])
    }


def test_delaunay_property_empty_circumcircle():
    rng = np.random.RandomState(2)
    pts = rng.rand(40, 2) * 100
    tris = delaunay(pts)
    # Euler: triangles = 2n - 2 - hull_size for a triangulation
    assert len(tris) >= 40  # sanity: dense triangulation
    # spot-check empty circumcircle on a few triangles
    for t in tris[:10]:
        a, b, c = pts[t]
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1]))
        ux = ((a ** 2).sum() * (b[1] - c[1]) + (b ** 2).sum() * (c[1] - a[1])
              + (c ** 2).sum() * (a[1] - b[1])) / d
        uy = ((a ** 2).sum() * (c[0] - b[0]) + (b ** 2).sum() * (a[0] - c[0])
              + (c ** 2).sum() * (b[0] - a[0])) / d
        r2 = ((a[0] - ux) ** 2 + (a[1] - uy) ** 2)
        dists = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
        others = np.setdiff1d(np.arange(len(pts)), t)
        assert (dists[others] >= r2 - 1e-6).all()


def test_interpolate_linear_exact():
    rng = np.random.RandomState(3)
    pts = rng.rand(50, 2) * 100
    z = 3.0 + 0.5 * pts[:, 0] - 0.25 * pts[:, 1]
    tris = delaunay(pts)
    qx = rng.rand(200) * 100
    qy = rng.rand(200) * 100
    vals = interpolate_tin(pts, z, tris, qx, qy)
    ok = ~np.isnan(vals)
    assert ok.sum() > 100
    want = 3.0 + 0.5 * qx[ok] - 0.25 * qy[ok]
    np.testing.assert_allclose(vals[ok], want, rtol=1e-9, atol=1e-7)


def test_tin_gridding_linear_surface(spark):
    # a TIN reproduces a linear surface exactly for ANY triangulation,
    # so the tile+halo approximation is invisible on this fixture
    rng = np.random.RandomState(4)
    n = 400
    xs = rng.rand(n) * 1000
    ys = rng.rand(n) * 1000
    zs = 10.0 + 0.02 * xs + 0.05 * ys
    rows = [(i, float(xs[i]), float(ys[i]), float(zs[i])) for i in range(n)]
    pts = spark.createDataFrame(rows, "record_num long, x double, y double, value double")
    meta = GridMeta(rows=50, columns=50, north=1000.0, south=0.0, east=1000.0,
                    west=0.0, resolution_x=20.0, resolution_y=20.0)
    out = tin_gridding(pts, meta, tile=16).collect()
    assert len(out) > 1500  # most of the grid is inside the hull
    for r in out:
        cx = 0.0 + (r["col"] + 0.5) * 20.0
        cy = 1000.0 - (r["row"] + 0.5) * 20.0
        assert r["value"] == pytest.approx(10.0 + 0.02 * cx + 0.05 * cy, rel=1e-9, abs=1e-6)


def test_tin_gridding_range_bound(spark):
    rng = np.random.RandomState(5)
    n = 200
    rows = [(i, float(rng.rand() * 1000), float(rng.rand() * 1000),
             float(rng.rand() * 50)) for i in range(n)]
    pts = spark.createDataFrame(rows, "record_num long, x double, y double, value double")
    meta = GridMeta(rows=40, columns=40, north=1000.0, south=0.0, east=1000.0,
                    west=0.0, resolution_x=25.0, resolution_y=25.0)
    vals = [r["value"] for r in tin_gridding(pts, meta, tile=20).collect()]
    assert vals and min(vals) >= 0.0 - 1e-9 and max(vals) <= 50.0 + 1e-9
