"""Round-5 named-variant wrappers: TrendSurfaceVectorPoints,
WriteFunctionMemoryInsertion, HistogramMatchingTwoImages,
LengthOfUpstreamChannels, ContourLidar, LidarRbfInterpolation."""

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta

META8 = GridMeta(rows=8, columns=8, north=80.0, south=0.0, east=80.0,
                 west=0.0, resolution_x=10.0, resolution_y=10.0)


def _pts(spark, n=60, seed=7):
    rng = np.random.RandomState(seed)
    rows = [(float(x), float(y), float(z)) for x, y, z in zip(
        rng.uniform(0, 80, n), rng.uniform(0, 80, n), rng.randint(0, 50, n))]
    return spark.createDataFrame(rows, "x double, y double, value double")


def test_trend_surface_points_order1_plane_exact(spark):
    """Order-1 fit of an exact plane reproduces it at every cell."""
    from whitebox_tools_spark.operators.raster import trend_surface_vector_points

    pts = _pts(spark).selectExpr("x", "y", "2.0 + 0.5 * x - 0.25 * y AS value")
    out = trend_surface_vector_points(pts, META8, order=1).collect()
    assert len(out) == 64
    for r in out:
        x = 0.0 + (r["col"] + 0.5) * 10.0
        y = 80.0 - (r["row"] + 0.5) * 10.0
        assert r["value"] == pytest.approx(2.0 + 0.5 * x - 0.25 * y, abs=1e-9)


def test_trend_surface_points_order2_matches_numpy_lstsq(spark):
    """Order-2 numpy path == direct lstsq over the same design matrix."""
    from whitebox_tools_spark.operators.raster import trend_surface_vector_points

    pts = _pts(spark, n=80, seed=11)
    pdf = pts.toPandas()
    out = {(r["row"], r["col"]): r["value"]
           for r in trend_surface_vector_points(pts, META8, order=2).collect()}
    terms = [(i, j) for t in range(3) for i in range(t + 1) for j in [t - i]]
    X = np.column_stack([pdf.x ** i * pdf.y ** j for i, j in terms])
    # same normal-equation system the operator solves
    coef, *_ = np.linalg.lstsq(X.T @ X, X.T @ pdf.value.to_numpy(), rcond=None)
    for (row, col), v in out.items():
        x = 0.0 + (col + 0.5) * 10.0
        y = 80.0 - (row + 0.5) * 10.0
        ref = sum(c * x ** i * y ** j for c, (i, j) in zip(coef, terms))
        assert v == pytest.approx(ref, rel=1e-8, abs=1e-8)


def test_wfm_insertion_known_pixels(spark):
    """2-date form: date3 defaults to date2; stretch + RGBA pack."""
    from whitebox_tools_spark.operators.enhancement import (
        write_function_memory_insertion)

    d1 = spark.createDataFrame([(0, 0, 0.0), (0, 1, 5.0), (0, 2, 10.0)],
                               "row long, col long, value double")
    d2 = spark.createDataFrame([(0, 0, 100.0), (0, 1, 50.0), (0, 2, 0.0)],
                               "row long, col long, value double")
    out = {(r["row"], r["col"]): r["value"]
           for r in write_function_memory_insertion(d1, d2).collect()}
    # pixel (0,0): r=0, g=b=255 -> 255<<24 | 255<<16 | 255<<8 | 0
    assert out[(0, 0)] == float((255 << 24) | (255 << 16) | (255 << 8))
    # pixel (0,2): r=255, g=b=0
    assert out[(0, 2)] == float((255 << 24) | 255)
    # pixel (0,1): r=floor(5/10*255)=127, g=b=floor(50/100*255)=127
    assert out[(0, 1)] == float((255 << 24) | (127 << 16) | (127 << 8) | 127)


def test_hist_match_two_images_delegates(spark):
    from whitebox_tools_spark.operators.enhancement import (
        histogram_matching, histogram_matching_two_images)

    a = spark.createDataFrame([(0, i, float(i % 5)) for i in range(20)],
                              "row long, col long, value double")
    b = spark.createDataFrame([(0, i, float(i % 7) * 10) for i in range(20)],
                              "row long, col long, value double")
    got = sorted(map(tuple, histogram_matching_two_images(a, b).collect()))
    want = sorted(map(tuple, histogram_matching(a, b).collect()))
    assert got == want


def test_length_upstream_channels_numpy_reference(spark):
    """Tiny synthetic DEM: per-cell result == the reference stack
    algorithm replayed in numpy over the same D8 pointer/streams."""
    from whitebox_tools_spark.operators import hydro as HY

    rng = np.random.RandomState(3)
    z = (rng.randint(0, 40, (8, 8)) + np.arange(8)[:, None] * 3).astype(float)
    cells = spark.createDataFrame(
        [(int(r), int(c), float(z[r, c])) for r in range(8) for c in range(8)],
        "row long, col long, value double")
    threshold = 3.0
    out = {(r["row"], r["col"]): r["value"]
           for r in HY.length_of_upstream_channels(cells, META8, threshold).collect()}

    # numpy reference: D8 pointer -> accumulation -> streams -> stack walk
    ptr_df = HY.d8_pointer(cells, META8).collect()
    acc_df = HY.d8_flow_accumulation(cells, META8).collect()
    ptr = {(r["row"], r["col"]): r["value"] for r in ptr_df}
    acc = {(r["row"], r["col"]): r["value"] for r in acc_df}
    stream = {rc for rc, a in acc.items() if a >= threshold}
    dyx = {1: (-1, 1), 2: (0, 1), 4: (1, 1), 8: (1, 0),
           16: (1, -1), 32: (0, -1), 64: (-1, -1), 128: (-1, 0)}
    diag = (2 * 10.0 ** 2) ** 0.5

    def downstream(rc):
        code = int(ptr.get(rc, 0))
        if code <= 0:
            return None, 0.0
        dy, dx = dyx[code]
        ln = diag if (dy != 0 and dx != 0) else 10.0
        return (rc[0] + dy, rc[1] + dx), ln

    ref = {rc: 0.0 for rc in stream}
    indeg = {rc: 0 for rc in stream}
    for s in stream:
        d, _ = downstream(s)
        if d in stream:
            indeg[d] += 1
    stack = [rc for rc, n in indeg.items() if n == 0]
    while stack:
        rc = stack.pop()
        d, ln = downstream(rc)
        if d in stream:
            ref[rc] += ln
            ref[d] += ref[rc]
            indeg[d] -= 1
            if indeg[d] == 0:
                stack.append(d)
    assert set(out) == stream
    for rc in stream:
        assert out[rc] == pytest.approx(ref[rc], abs=1e-9), rc


def test_contour_lidar_and_rbf_wrappers(spark):
    """Wrappers accept LiDAR-shaped frames and match their delegates."""
    from whitebox_tools_spark.operators import lidar as LI
    from whitebox_tools_spark.operators.contours import contours_from_points
    from whitebox_tools_spark.operators.tin import rbf_interpolation

    pts = _pts(spark, n=50, seed=5).selectExpr(
        "x", "y", "value", "CAST(1 AS INT) AS classification")
    cl = sorted(map(tuple, LI.contour_lidar(
        pts, META8, base=0.0, interval=10.0, tile=8).collect()))
    want = sorted(map(tuple, contours_from_points(
        pts.select("x", "y", "value"), META8, base=0.0, interval=10.0,
        tile=8).collect()))
    assert cl == want and len(cl) > 0

    rb = sorted(map(tuple, LI.lidar_rbf_interpolation(
        pts, META8, k=8, tile=8).collect()))
    want2 = sorted(map(tuple, rbf_interpolation(
        pts.select("x", "y", "value"), META8, k=8, tile=8).collect()))
    assert rb == want2 and len(rb) > 0
