"""Bounding-geometry named ops: MinimumBoundingBox / Envelope / Circle,
PolygonLong/ShortAxis, PatchOrientation, RemovePolygonHoles."""

import itertools
import math

import numpy as np
import pytest

from whitebox_tools_spark.operators import vector_ops as VO


def _feat(spark, rings_by_id):
    rows = []
    for sid, rings in rings_by_id.items():
        parts = [(i, hole, [{"x": float(x), "y": float(y)} for x, y in ring])
                 for i, (hole, ring) in enumerate(rings)]
        rows.append((sid, parts))
    return spark.createDataFrame(
        rows, "shape_id long, parts array<struct<part_idx int, "
              "is_hole boolean, ring array<struct<x double, y double>>>>")


RECT = [(10.0, 10.0), (50.0, 10.0), (50.0, 30.0), (10.0, 30.0),
        (10.0, 10.0)]
# the same rectangle rotated 30 degrees about its centre
_C, _S = math.cos(math.radians(30)), math.sin(math.radians(30))
ROT = [((x - 30.0) * _C - (y - 20.0) * _S + 30.0,
        (x - 30.0) * _S + (y - 20.0) * _C + 20.0) for x, y in RECT]


def test_minimum_bounding_envelope(spark):
    out = {r["shape_id"]: r for r in
           VO.minimum_bounding_envelope(_feat(spark, {1: [(False, RECT)]}))
           .collect()}
    e = out[1]
    assert (e["xmin"], e["ymin"], e["xmax"], e["ymax"]) == (10.0, 10.0,
                                                            50.0, 30.0)


def test_minimum_bounding_box_rotated_rect(spark):
    df = VO.minimum_bounding_box(_feat(spark, {1: [(False, ROT)]}))
    rows = df.collect()
    assert len(rows) == 4
    la, sa = rows[0]["long_axis"], rows[0]["short_axis"]
    assert la == pytest.approx(40.0, abs=1e-9)
    assert sa == pytest.approx(20.0, abs=1e-9)
    # the corners recover the rotated rectangle's vertex set
    got = sorted((round(r["x"], 6), round(r["y"], 6)) for r in rows)
    want = sorted((round(x, 6), round(y, 6)) for x, y in ROT[:4])
    assert got == want


def test_polygon_axes(spark):
    feats = _feat(spark, {1: [(False, ROT)]})
    long_ax = VO.polygon_long_axis(feats).collect()[0]
    short_ax = VO.polygon_short_axis(feats).collect()[0]
    llen = math.hypot(long_ax["x2"] - long_ax["x1"],
                      long_ax["y2"] - long_ax["y1"])
    slen = math.hypot(short_ax["x2"] - short_ax["x1"],
                      short_ax["y2"] - short_ax["y1"])
    assert llen == pytest.approx(40.0, abs=1e-9)
    assert slen == pytest.approx(20.0, abs=1e-9)
    # both pass through the box centre (30, 20)
    for ax in (long_ax, short_ax):
        mx = (ax["x1"] + ax["x2"]) / 2.0
        my = (ax["y1"] + ax["y2"]) / 2.0
        assert (mx, my) == (pytest.approx(30.0, abs=1e-9),
                            pytest.approx(20.0, abs=1e-9))
    # the long axis lies along the 30-degree direction
    ang = math.degrees(math.atan2(long_ax["y2"] - long_ax["y1"],
                                  long_ax["x2"] - long_ax["x1"])) % 180.0
    assert ang == pytest.approx(30.0, abs=1e-6)


def test_minimum_bounding_circle(spark):
    rng = np.random.RandomState(3)
    pts = [(float(x), float(y)) for x, y in rng.uniform(0, 100, size=(12, 2))]
    ring = pts + [pts[0]]
    out = VO.minimum_bounding_circle(_feat(spark, {1: [(False, ring)]})) \
            .collect()[0]
    cx, cy, r = out["cx"], out["cy"], out["radius"]
    # containment
    for x, y in pts:
        assert math.hypot(x - cx, y - cy) <= r + 1e-9
    # minimality: no support circle from any 2 or 3 points that contains
    # everything is smaller
    best = math.inf
    for a, b in itertools.combinations(pts, 2):
        c = ((a[0] + b[0]) / 2, (a[1] + b[1]) / 2)
        rr = math.hypot(a[0] - c[0], a[1] - c[1])
        if all(math.hypot(x - c[0], y - c[1]) <= rr + 1e-9 for x, y in pts):
            best = min(best, rr)
    for a, b, c3 in itertools.combinations(pts, 3):
        ax, ay = a
        bx, by = b
        cx3, cy3 = c3
        d = 2.0 * (ax * (by - cy3) + bx * (cy3 - ay) + cx3 * (ay - by))
        if d == 0:
            continue
        ux = ((ax * ax + ay * ay) * (by - cy3) + (bx * bx + by * by)
              * (cy3 - ay) + (cx3 * cx3 + cy3 * cy3) * (ay - by)) / d
        uy = ((ax * ax + ay * ay) * (cx3 - bx) + (bx * bx + by * by)
              * (ax - cx3) + (cx3 * cx3 + cy3 * cy3) * (bx - ax)) / d
        rr = math.hypot(ax - ux, ay - uy)
        if all(math.hypot(x - ux, y - uy) <= rr + 1e-9 for x, y in pts):
            best = min(best, rr)
    assert r == pytest.approx(best, abs=1e-6)


def test_patch_orientation_diagonal(spark):
    # vertices along the y = x diagonal: RMA slope 1 -> 45 degrees
    ring = [(0.0, 0.0), (10.0, 10.1), (20.0, 19.9), (30.0, 30.0),
            (0.0, 0.0)]
    out = VO.patch_orientation(_feat(spark, {1: [(False, ring)]})) \
            .collect()[0]
    assert out["orientation"] == pytest.approx(45.0, abs=1.0)
    # anti-diagonal -> 135 degrees
    ring2 = [(0.0, 30.0), (10.0, 19.9), (20.0, 10.1), (30.0, 0.0),
             (0.0, 30.0)]
    out2 = VO.patch_orientation(_feat(spark, {1: [(False, ring2)]})) \
             .collect()[0]
    assert out2["orientation"] == pytest.approx(135.0, abs=1.0)


def test_remove_polygon_holes(spark):
    hole = [(20.0, 15.0), (30.0, 15.0), (30.0, 25.0), (20.0, 25.0),
            (20.0, 15.0)]
    feats = _feat(spark, {1: [(False, RECT), (True, hole)],
                          2: [(False, ROT)]})
    out = {r["shape_id"]: r["parts"] for r in
           VO.remove_polygon_holes(feats).collect()}
    assert len(out[1]) == 1 and not out[1][0]["is_hole"]
    assert out[1][0]["part_idx"] == 0
    assert [(v["x"], v["y"]) for v in out[1][0]["ring"]] == RECT
    assert len(out[2]) == 1


def test_voronoi_diagram(spark):
    """Every extent sample point lies in the Voronoi cell of its
    nearest site."""
    import numpy as np

    rng = np.random.RandomState(17)
    sites = [(i, float(x), float(y)) for i, (x, y) in
             enumerate(rng.uniform(10, 90, size=(8, 2)))]
    pts = spark.createDataFrame(sites, "record_num long, x double, y double")
    rows = VO.voronoi_diagram(pts, (0.0, 0.0, 100.0, 100.0)).collect()
    cells = {}
    for r in rows:
        cells.setdefault(r["record_num"], []).append((r["x"], r["y"]))

    def inside(poly, px, py):
        n = len(poly)
        ok = True
        for i in range(n):
            ax, ay = poly[i]
            bx, by = poly[(i + 1) % n]
            if (bx - ax) * (py - ay) - (by - ay) * (px - ax) < -1e-6:
                ok = False
        return ok

    assert len(cells) == 8
    for qx, qy in rng.uniform(5, 95, size=(40, 2)):
        best = min(sites, key=lambda s: (s[1] - qx) ** 2 + (s[2] - qy) ** 2)
        assert inside(cells[best[0]], qx, qy), (qx, qy)
    # cells cover the extent corners too
    for cx, cy in ((0.0, 0.0), (100.0, 0.0), (0.0, 100.0), (100.0, 100.0)):
        best = min(sites, key=lambda s: (s[1] - cx) ** 2 + (s[2] - cy) ** 2)
        assert inside(cells[best[0]], cx, cy)
