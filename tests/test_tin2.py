"""Round-3 interpolation family: natural-neighbour (Sibson), RBF,
ConstructVectorTIN — linear-precision and structural gates."""

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators.tin import (
    circumcenters,
    construct_vector_tin,
    delaunay,
    natural_neighbour_gridding,
    natural_neighbour_values,
    rbf_interpolation,
)

N = 40
META = GridMeta(rows=N, columns=N, north=100.0, south=0.0, east=100.0,
                west=0.0, resolution_x=2.5, resolution_y=2.5)


def _pts(spark, seed=7, n=300, plane=(3.0, 0.25, -0.4)):
    rng = np.random.RandomState(seed)
    xs = rng.rand(n) * 100.0
    ys = rng.rand(n) * 100.0
    b0, b1, b2 = plane
    zs = b0 + b1 * xs + b2 * ys
    rows = [(float(x), float(y), float(z)) for x, y, z in zip(xs, ys, zs)]
    return spark.createDataFrame(rows, "x double, y double, value double")


def test_sibson_kernel_linear_precision():
    """Sibson weights have linear precision: a planar surface is
    reproduced exactly (to fp round-off) strictly inside the hull."""
    rng = np.random.RandomState(3)
    P = rng.rand(120, 2) * 100.0
    Z = 2.0 + 0.5 * P[:, 0] - 0.25 * P[:, 1]
    tris = delaunay(P)
    q = rng.rand(200, 2) * 60.0 + 20.0  # well inside
    got = natural_neighbour_values(P, Z, tris, q[:, 0], q[:, 1])
    want = 2.0 + 0.5 * q[:, 0] - 0.25 * q[:, 1]
    ok = ~np.isnan(got)
    assert ok.mean() > 0.95
    assert np.allclose(got[ok], want[ok], atol=1e-6)


def test_sibson_kernel_partition_of_unity_bounds():
    """Interpolated values stay within the local data range (convex
    weights)."""
    rng = np.random.RandomState(4)
    P = rng.rand(80, 2) * 100.0
    Z = rng.rand(80) * 10.0
    tris = delaunay(P)
    q = rng.rand(100, 2) * 60.0 + 20.0
    got = natural_neighbour_values(P, Z, tris, q[:, 0], q[:, 1])
    ok = ~np.isnan(got)
    assert got[ok].min() >= Z.min() - 1e-9
    assert got[ok].max() <= Z.max() + 1e-9


def test_natural_neighbour_gridding_linear_surface(spark):
    pts = _pts(spark)
    out = natural_neighbour_gridding(pts, META, tile=16).collect()
    assert len(out) > 0.5 * N * N
    for r in out:
        x = META.west + (r["col"] + 0.5) * META.resolution_x
        y = META.north - (r["row"] + 0.5) * META.resolution_y
        want = 3.0 + 0.25 * x - 0.4 * y
        assert abs(r["value"] - want) < 1e-6, (r, want)


def test_rbf_linear_surface(spark):
    pts = _pts(spark, seed=9)
    out = rbf_interpolation(pts, META, k=16, tile=16).collect()
    assert len(out) == N * N  # RBF extrapolates: every cell gets a value
    bad = 0
    for r in out:
        x = META.west + (r["col"] + 0.5) * META.resolution_x
        y = META.north - (r["row"] + 0.5) * META.resolution_y
        want = 3.0 + 0.25 * x - 0.4 * y
        if abs(r["value"] - want) > 1e-4:
            bad += 1
    assert bad == 0, bad


def test_construct_vector_tin_structure(spark):
    pts = _pts(spark, seed=11, n=200)
    tris = construct_vector_tin(pts, META, tile=16).collect()
    assert len(tris) > 200  # dense triangulation
    # each triangle is emitted exactly once (centroid-ownership dedup)
    keys = [tuple(round(r[c], 9) for c in
                  ("ax", "ay", "bx", "by", "cx", "cy")) for r in tris]
    assert len(keys) == len(set(keys))
    # canonical vertex order: (ax, ay) <= (bx, by) <= (cx, cy)
    for r in tris:
        assert (r["ax"], r["ay"]) <= (r["bx"], r["by"]) <= (r["cx"], r["cy"])
    # positive area
    for r in tris:
        area = 0.5 * abs((r["bx"] - r["ax"]) * (r["cy"] - r["ay"])
                         - (r["cx"] - r["ax"]) * (r["by"] - r["ay"]))
        assert area > 0.0


def test_circumcenters_match_scalar():
    rng = np.random.RandomState(5)
    P = rng.rand(30, 2) * 10.0
    tris = delaunay(P)
    cc = circumcenters(P, tris)
    for i, t in enumerate(tris[:10]):
        a, b, c = P[t[0]], P[t[1]], P[t[2]]
        for v in (a, b, c):
            r2 = (v[0] - cc[i, 0]) ** 2 + (v[1] - cc[i, 1]) ** 2
            assert abs(r2 - cc[i, 2]) < 1e-6 * max(1.0, cc[i, 2])


def test_construct_tin_tile_size_independent(spark):
    """delaunay_certified contract: the triangle set is the GLOBAL
    Delaunay — identical for any tile/halo choice (round 5)."""
    import numpy as np

    from whitebox_tools_spark.functions.raster_math import GridMeta
    from whitebox_tools_spark.operators.tin import construct_vector_tin

    rng = np.random.RandomState(77)
    n = 500
    rows = [(float(x), float(y), float(z)) for x, y, z in
            zip(rng.rand(n) * 300, rng.rand(n) * 300, rng.rand(n) * 50)]
    df = spark.createDataFrame(rows, "x double, y double, value double")
    meta = GridMeta(rows=30, columns=30, north=300.0, south=0.0,
                    east=300.0, west=0.0, resolution_x=10.0,
                    resolution_y=10.0)
    a = {tuple(r) for r in construct_vector_tin(df, meta, tile=5).collect()}
    b = {tuple(r) for r in construct_vector_tin(df, meta, tile=11).collect()}
    c = {tuple(r) for r in construct_vector_tin(df, meta, tile=30).collect()}
    assert a == b == c
    assert len(a) > 2 * n - 2 - 60  # Euler bound sanity (h hull points)


def test_tin_gridding_tile_size_independent(spark):
    """tin_gridding over the certified Delaunay + SQL barycentric:
    identical cell values for any tile choice (round 5)."""
    import numpy as np

    from whitebox_tools_spark.functions.raster_math import GridMeta
    from whitebox_tools_spark.operators.tin import tin_gridding

    rng = np.random.RandomState(99)
    n = 400
    rows = [(float(x), float(y), float(z)) for x, y, z in
            zip(rng.rand(n) * 200, rng.rand(n) * 200, rng.rand(n) * 30)]
    df = spark.createDataFrame(rows, "x double, y double, value double")
    meta = GridMeta(rows=20, columns=20, north=200.0, south=0.0,
                    east=200.0, west=0.0, resolution_x=10.0,
                    resolution_y=10.0)
    a = {(r.row, r.col): r.value
         for r in tin_gridding(df, meta, tile=4).collect()}
    b = {(r.row, r.col): r.value
         for r in tin_gridding(df, meta, tile=20).collect()}
    assert a == b and len(a) > 300


def test_tin_family_degenerate_inputs(spark):
    """Two-point / no-ground inputs: no triangles, kNN-based RBF still
    covers the grid, normalize falls back to the corpus minimum."""
    from whitebox_tools_spark.functions.raster_math import GridMeta
    from whitebox_tools_spark.operators.lidar import normalize_lidar
    from whitebox_tools_spark.operators.tin import (construct_vector_tin,
                                                    rbf_interpolation,
                                                    tin_gridding)

    meta = GridMeta(rows=10, columns=10, north=100.0, south=0.0,
                    east=100.0, west=0.0, resolution_x=10.0,
                    resolution_y=10.0)
    two = spark.createDataFrame([(1.0, 1.0, 5.0), (90.0, 90.0, 7.0)],
                                "x double, y double, value double")
    assert construct_vector_tin(two, meta, tile=5).count() == 0
    assert tin_gridding(two, meta, tile=5).count() == 0
    assert rbf_interpolation(two, meta, k=5).count() == 100
    pts = spark.createDataFrame(
        [(0, 1.0, 1.0, 5.0, 1), (1, 90.0, 90.0, 7.0, 1)],
        "record_num long, x double, y double, value double, "
        "classification int")
    out = sorted((r.record_num, r.hag)
                 for r in normalize_lidar(pts, meta).collect())
    assert out == [(0, 0.0), (1, 2.0)]
