"""Polygonize + ContoursFromPoints + TopographicHachures gates."""

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators.polygonize import polygonize


def _segs(spark, lines):
    rows = []
    for sid, pts in enumerate(lines):
        for i in range(len(pts) - 1):
            rows.append((sid, i, float(pts[i][0]), float(pts[i][1]),
                         float(pts[i + 1][0]), float(pts[i + 1][1])))
    return spark.createDataFrame(
        rows, "shape_id long, seg_idx long, x1 double, y1 double, "
              "x2 double, y2 double")


def _faces(df):
    rows = df.collect()
    faces = {}
    for r in rows:
        faces.setdefault(r["poly_id"], []).append((r["vertex_idx"], r["x"], r["y"]))
    out = {}
    for pid, vs in faces.items():
        vs.sort()
        out[pid] = [(x, y) for _, x, y in vs]
    return out


def test_tictactoe_grid(spark):
    # 3 vertical x 3 horizontal full-span lines -> 2x2 = 4 unit faces
    lines = [[(i, -1.0), (i, 3.0)] for i in range(3)] \
        + [[(-1.0, i), (3.0, i)] for i in range(3)]
    out = polygonize(_segs(spark, lines))
    faces = _faces(out)
    assert len(faces) == 4
    areas = sorted({round(r["area"], 9) for r in out.collect()})
    assert areas == [1.0]


def test_triangle_single_face(spark):
    lines = [[(0.0, 0.0), (4.0, 0.0), (2.0, 3.0), (0.0, 0.0)]]
    faces = _faces(polygonize(_segs(spark, lines)))
    assert len(faces) == 1
    ring = faces[1]
    area = 0.5 * abs(sum(
        ring[i][0] * ring[(i + 1) % len(ring)][1]
        - ring[(i + 1) % len(ring)][0] * ring[i][1]
        for i in range(len(ring))))
    assert abs(area - 6.0) < 1e-9


def test_crossing_diagonals_in_box(spark):
    # square + both diagonals -> 4 triangular faces
    lines = [
        [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)],
        [(0.0, 0.0), (2.0, 2.0)],
        [(2.0, 0.0), (0.0, 2.0)],
    ]
    faces = _faces(polygonize(_segs(spark, lines)))
    assert len(faces) == 4
    for ring in faces.values():
        area = 0.5 * sum(
            ring[i][0] * ring[(i + 1) % len(ring)][1]
            - ring[(i + 1) % len(ring)][0] * ring[i][1]
            for i in range(len(ring)))
        assert abs(area - 1.0) < 1e-9  # CCW quarters of the 4-square


def test_dangling_edges_ignored(spark):
    lines = [
        [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)],
        [(1.0, 1.0), (3.0, 3.0)],  # dangle off a corner
    ]
    faces = _faces(polygonize(_segs(spark, lines)))
    assert len(faces) == 1


def test_two_disjoint_components(spark):
    lines = [
        [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)],
        [(5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 6.0), (5.0, 5.0)],
    ]
    faces = _faces(polygonize(_segs(spark, lines)))
    assert len(faces) == 2


def test_contours_from_points_linear_surface(spark):
    from whitebox_tools_spark.operators.contours import contours_from_points

    N = 30
    META = GridMeta(rows=N, columns=N, north=300.0, south=0.0, east=300.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    rng = np.random.RandomState(12)
    xs = rng.rand(400) * 300.0
    ys = rng.rand(400) * 300.0
    zs = 0.1 * xs  # planar: contour of level L is the line x = 10 L
    pts = spark.createDataFrame(
        [(float(x), float(y), float(z)) for x, y, z in zip(xs, ys, zs)],
        "x double, y double, value double")
    segs = contours_from_points(pts, META, base=0.0, interval=5.0,
                                tile=15).collect()
    assert len(segs) > 10
    for s in segs:
        want_x = s["level"] * 10.0
        assert abs(s["x1"] - want_x) < 1e-6, s
        assert abs(s["x2"] - want_x) < 1e-6, s


def test_topographic_hachures_downslope(spark):
    from whitebox_tools_spark.operators.focal import surface_normals
    from whitebox_tools_spark.operators.contours import topographic_hachures

    N = 20
    META = GridMeta(rows=N, columns=N, north=200.0, south=0.0, east=200.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    # z rises with x: downslope is -x
    rows = [(r, c, 2.0 * c) for r in range(N) for c in range(N)]
    df = spark.createDataFrame(rows, "row long, col long, value double")
    out = topographic_hachures(df, META, spacing=3, min_slope_deg=1.0).collect()
    assert len(out) > 0
    for s in out:
        assert s["x2"] < s["x1"]  # strokes point downslope (-x)
        if s["y1"] < 190.0:  # row 0 center-substitutes and gains a fake gy
            assert abs(s["y2"] - s["y1"]) < 1e-9
