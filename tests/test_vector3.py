"""Round-2 continuation vector ops: geometric invariants."""

import math

import numpy as np

from whitebox_tools_spark.operators import vector_ops as VO


def _poly(spark, ring):
    parts = [{"part_idx": 0, "is_hole": False,
              "ring": [{"x": float(x), "y": float(y)} for x, y in ring]}]
    return spark.createDataFrame(
        [(1, parts)],
        "shape_id long, parts array<struct<part_idx int, is_hole boolean, "
        "ring array<struct<x double, y double>>>>")


def test_extend_lines_moves_endpoints(spark):
    df = _poly(spark, [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])
    out = VO.extract_nodes(VO.extend_vector_lines(df, dist=2.0)).collect()
    pts = {r["node_idx"]: (r["x"], r["y"]) for r in out}
    # head extends along (second -> first) direction: (0,0)-(10,0) -> (-2, 0)
    assert pts[0] == (-2.0, 0.0)
    # tail extends along (penultimate -> last): (0,10)->(0,0) continues to (0,-2)
    assert pts[4] == (0.0, -2.0)
    # interior vertices untouched
    assert pts[1] == (10.0, 0.0) and pts[2] == (10.0, 10.0)


def test_extend_lines_start_only(spark):
    df = _poly(spark, [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])
    out = VO.extract_nodes(VO.extend_vector_lines(df, 2.0, "line start")).collect()
    pts = {r["node_idx"]: (r["x"], r["y"]) for r in out}
    assert pts[0] == (-2.0, 0.0)
    assert pts[4] == (0.0, 0.0)


def test_radius_of_gyration_square(spark):
    df = _poly(spark, [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)])
    rog = VO.radius_of_gyration(df).collect()[0]["rog"]
    # four corners at distance sqrt(2) from center -> RoG = sqrt(2)
    assert abs(rog - math.sqrt(2.0)) < 1e-12


def test_rect_grid_covers_extent(spark):
    g = VO.create_rectangular_vector_grid(spark, 0.0, 0.0, 100.0, 50.0,
                                          25.0, 25.0).collect()
    assert len(g) == 8  # 4 cols x 2 rows
    xs = {(r["xmin"], r["xmax"]) for r in g}
    assert (0.0, 25.0) in xs and (75.0, 100.0) in xs
    for r in g:
        assert r["xmax"] - r["xmin"] == 25.0
        assert r["ymax"] - r["ymin"] == 25.0


def test_hex_grid_geometry(spark):
    g = VO.create_hexagonal_vector_grid(spark, 0.0, 0.0, 200.0, 200.0,
                                        80.0).collect()
    size = 40.0 / (math.sqrt(3.0) / 2.0)
    for r in g[:5]:
        for i in range(6):
            d = math.hypot(r[f"vx_{i}"] - r["cx"], r[f"vy_{i}"] - r["cy"])
            assert abs(d - size) < 1e-9  # vertices on the circumcircle
    # odd rows are offset by half a width
    rows = {}
    for r in g:
        rows.setdefault(round(r["cy"], 6), set()).add(r["cx"])
    ys = sorted(rows)
    assert any(min(rows[ys[1]]) - min(rows[ys[0]]) == 40.0 for _ in [0])


def test_tile_footprint(spark):
    pts = spark.createDataFrame(
        [(0, 1.0, 2.0), (0, 5.0, 8.0), (1, -1.0, 0.0)],
        "tile long, x double, y double")
    fp = {r["tile"]: r for r in VO.lidar_tile_footprint(pts, "tile").collect()}
    assert fp[0]["min_x"] == 1.0 and fp[0]["max_y"] == 8.0
    assert fp[0]["num_points"] == 2 and fp[1]["num_points"] == 1
