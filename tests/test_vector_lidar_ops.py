"""Tests for per-feature vector ops and lidar point ops."""

import math

import numpy as np
import pytest

from whitebox_tools_spark.operators import lidar as LI
from whitebox_tools_spark.operators import vector_ops as VO

RING = [(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0), (0.0, 0.0)]
HOLE = [(1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0)]


@pytest.fixture(scope="module")
def feats(spark):
    rows = [
        (1, [(0, False, [{"x": x, "y": y} for x, y in RING]),
             (1, True, [{"x": x, "y": y} for x, y in HOLE])]),
        (2, [(0, False, [{"x": x + 10, "y": y} for x, y in RING])]),
    ]
    schema = ("shape_id long, parts array<struct<part_idx int, is_hole boolean, "
              "ring array<struct<x double, y double>>>>")
    return spark.createDataFrame(rows, schema)


def test_polygon_area_holes_subtract(spark, feats):
    got = {r["shape_id"]: r["area"] for r in VO.polygon_area(feats).collect()}
    assert got[1] == pytest.approx(12.0 - 1.0)
    assert got[2] == pytest.approx(12.0)


def test_polygon_perimeter_all_rings(spark, feats):
    got = {r["shape_id"]: r["perimeter"] for r in VO.polygon_perimeter(feats).collect()}
    assert got[1] == pytest.approx(14.0 + 4.0)
    assert got[2] == pytest.approx(14.0)


def test_compactness_and_ratio(spark, feats):
    c = {r["shape_id"]: r["compactness"] for r in VO.compactness_ratio(feats).collect()}
    assert c[2] == pytest.approx(12.0 / 14.0)


def test_centroid_vertex_average(spark, feats):
    got = {r["shape_id"]: (r["cx"], r["cy"]) for r in VO.centroid_vector(feats).collect()}
    xs = [p[0] for p in RING] + [p[0] for p in HOLE]
    ys = [p[1] for p in RING] + [p[1] for p in HOLE]
    assert got[1][0] == pytest.approx(sum(xs) / len(xs))
    assert got[1][1] == pytest.approx(sum(ys) / len(ys))


def test_extract_nodes_count_and_order(spark, feats):
    nodes = VO.extract_nodes(feats).collect()
    assert len(nodes) == 10 + 5
    first = [n for n in nodes if n["shape_id"] == 2 and n["node_idx"] == 0][0]
    assert (first["x"], first["y"]) == (10.0, 0.0)


def test_multi_part_to_single_part(spark, feats):
    out = VO.multi_part_to_single_part(feats).collect()
    assert len(out) == 3


def test_convex_hull_matches_bruteforce(spark, feats):
    hulls = {r["shape_id"]: r["hull"] for r in VO.convex_hull(feats).collect()}
    # shape 2 is a rectangle: hull = its 4 corners
    pts = sorted((p["x"], p["y"]) for p in hulls[2])
    assert pts == [(10.0, 0.0), (10.0, 3.0), (14.0, 0.0), (14.0, 3.0)]
    # hull of shape 1 (rect + interior hole vertices) is still the rect
    pts1 = sorted((p["x"], p["y"]) for p in hulls[1])
    assert pts1 == [(0.0, 0.0), (0.0, 3.0), (4.0, 0.0), (4.0, 3.0)]


@pytest.fixture(scope="module")
def pts(spark):
    rows = [(i, float(i % 7) * 3.0, float(i % 5) * 3.0, float(i)) for i in range(40)]
    return spark.createDataFrame(rows, "record_num long, x double, y double, z double")


def test_lidar_thin_keeps_first_per_cell(spark, pts):
    out = LI.lidar_thin(pts, 100.0, order_col="record_num").collect()
    # bin size 50 -> all points in one cell -> exactly the first survives
    assert len(out) == 1 and out[0]["record_num"] == 0


def test_elevation_slice(spark, pts):
    out = LI.elevation_slice(pts, 10.0, 20.0)
    assert out.count() == 11


def test_lidar_join(spark, pts):
    assert LI.lidar_join([pts, pts]).count() == 80


def test_box_metrics_and_linearity(spark):
    """Min-box elongation/orientation + MEC rc-circle + linearity r^2 on
    shapes with known geometry."""
    import math

    import whitebox_tools_spark.operators.vector_ops as VO2

    def feat(i, ring):
        return (i, [{"part_idx": 0, "is_hole": False,
                     "ring": [{"x": float(x), "y": float(y)} for x, y in ring]}])

    # axis-aligned 10x2 rect; 45-degree 10x2 rect; unit square
    r1 = [(0, 0), (10, 0), (10, 2), (0, 2), (0, 0)]
    c, s = math.cos(math.radians(45)), math.sin(math.radians(45))
    r2 = [(x * c - y * s, x * s + y * c) for x, y in r1]
    sq = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]
    df = spark.createDataFrame(
        [feat(1, r1), feat(2, r2), feat(3, sq)],
        "shape_id long, parts array<struct<part_idx:int,is_hole:boolean,"
        "ring:array<struct<x:double,y:double>>>>",
    )
    out = {r["shape_id"]: r for r in VO2.box_metrics(df).collect()}
    assert out[1]["elongation"] == pytest.approx(1.0 - 2.0 / 10.0)
    assert out[1]["orientation"] == pytest.approx(90.0)  # long axis east-west
    assert out[2]["elongation"] == pytest.approx(0.8, abs=1e-9)
    assert out[2]["orientation"] == pytest.approx(45.0, abs=1e-6)
    assert out[3]["elongation"] == pytest.approx(0.0)
    # unit square MEC radius = sqrt(2)/2 -> rcc = 1 - 1/(pi/2)
    assert out[3]["rc_circle"] == pytest.approx(1.0 - 1.0 / (math.pi * 0.5), abs=1e-9)
    lin = {r["shape_id"]: r["linearity"] for r in VO2.linearity_index(df).collect()}

    def ref_r2(ring):
        # exact transcription incl. the closing-vertex double count and
        # the reference's (max-min)/2 midpoint quirk
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        mx = (max(xs) - min(xs)) / 2.0
        my = (max(ys) - min(ys)) / 2.0
        n = float(len(ring))
        sx = sum(x - mx for x in xs)
        sy = sum(y - my for y in ys)
        sxy = sum((x - mx) * (y - my) for x, y in ring)
        sxx = sum((x - mx) ** 2 for x in xs) / n - (sx / n) ** 2
        syy = sum((y - my) ** 2 for y in ys) / n - (sy / n) ** 2
        sxy_c = sxy / n - sx * sy / (n * n)
        return (sxy_c / math.sqrt(sxx * syy)) ** 2 if sxx * syy > 0 else 0.0

    for sid, ring in [(1, r1), (2, r2), (3, sq)]:
        assert lin[sid] == pytest.approx(ref_r2(ring), abs=1e-12), sid
    # the rotated thin rect is near-collinear -> high r^2
    assert lin[2] > 0.8
