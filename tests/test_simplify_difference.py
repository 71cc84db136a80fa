"""RDP simplification and convex-difference tests."""

import numpy as np
import pytest

from whitebox_tools_spark.operators.overlay_vector import (difference_features,
                                                           difference_ring_convex)
from whitebox_tools_spark.operators.vector_ops import _rdp, simplify_features


def _area(ring):
    r = np.asarray(ring)
    return abs(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])) / 2.0


def test_rdp_straight_chain_collapses():
    chain = [(float(i), 0.0) for i in range(10)]
    assert _rdp(chain, 0.001) == [(0.0, 0.0), (9.0, 0.0)]


def test_rdp_keeps_corners_subset_of_input():
    ring = [(0.0, 0.0), (5.0, 0.05), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    out = _rdp(ring, 0.001)
    assert set(out) <= set(ring)
    assert (5.0, 0.05) in out  # above tolerance -> kept
    out2 = _rdp(ring, 0.1)
    assert (5.0, 0.05) not in out2  # below tolerance -> dropped


def test_simplify_features_df(spark):
    ring = [(0.0, 0.0), (5.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    rows = [(1, [(0, False, [{"x": x, "y": y} for x, y in ring])])]
    schema = ("shape_id long, parts array<struct<part_idx int, is_hole boolean, "
              "ring array<struct<x double, y double>>>>")
    df = spark.createDataFrame(rows, schema)
    out = simplify_features(df, 0.001).collect()[0]
    pts = [(p["x"], p["y"]) for p in out["parts"][0]["ring"]]
    assert (5.0, 0.0) not in pts
    assert _area(pts) == pytest.approx(100.0)


RECT = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]


def test_difference_ring_area_identity():
    clip = [(5.0, -5.0), (15.0, -5.0), (15.0, 15.0), (5.0, 15.0), (5.0, -5.0)]
    pieces = difference_ring_convex(RECT, clip)
    total = sum(_area(p) for p in pieces)
    assert total == pytest.approx(50.0)  # right half erased


def test_difference_ring_hole_case():
    clip = [(3.0, 3.0), (7.0, 3.0), (7.0, 7.0), (3.0, 7.0), (3.0, 3.0)]
    pieces = difference_ring_convex(RECT, clip)
    total = sum(_area(p) for p in pieces)
    assert total == pytest.approx(100.0 - 16.0)
    # pieces are disjoint: pairwise bbox checks suffice for this layout
    assert len(pieces) == 4


def test_difference_features_df(spark):
    rows = [(1, [(0, False, [{"x": x, "y": y} for x, y in RECT])])]
    schema = ("shape_id long, parts array<struct<part_idx int, is_hole boolean, "
              "ring array<struct<x double, y double>>>>")
    a = spark.createDataFrame(rows, schema)
    tri = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (0.0, 0.0)]
    b = spark.createDataFrame(
        [(9, [(0, False, [{"x": x, "y": y} for x, y in tri])])],
        schema.replace("shape_id", "clip_id"))
    out = difference_features(a, b).collect()
    assert len(out) == 1
    total = sum(_area([(p["x"], p["y"]) for p in part["ring"]])
                for part in out[0]["parts"])
    assert total == pytest.approx(50.0)
