"""Geometric clip/intersect kernel tests."""

import numpy as np
import pytest

from whitebox_tools_spark.operators.overlay_vector import (
    clip_features_window, clip_ring_convex, clip_ring_window, intersect_features)


def _area(ring):
    r = np.asarray(ring)
    return abs(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])) / 2.0


RECT = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
DIAMOND = [(5.0, 0.0), (10.0, 5.0), (5.0, 10.0), (0.0, 5.0), (5.0, 0.0)]


def test_clip_ring_window_rect_exact():
    out = clip_ring_window(RECT, 4.0, 3.0, 20.0, 20.0)
    xs = [p[0] for p in out]
    ys = [p[1] for p in out]
    assert min(xs) == 4.0 and max(xs) == 10.0
    assert min(ys) == 3.0 and max(ys) == 10.0
    assert _area(out) == pytest.approx(6.0 * 7.0)


def test_clip_ring_window_inside_and_outside():
    assert clip_ring_window(RECT, -5.0, -5.0, 50.0, 50.0)[:-1] == RECT[:-1]
    assert clip_ring_window(RECT, 20.0, 20.0, 30.0, 30.0) == []


def test_clip_ring_window_diamond_half():
    out = clip_ring_window(DIAMOND, 5.0, -10.0, 30.0, 30.0)
    # right half of the diamond: area 25
    assert _area(out) == pytest.approx(25.0)


def test_clip_ring_convex_triangle():
    tri = [(0.0, 0.0), (20.0, 0.0), (0.0, 20.0), (0.0, 0.0)]
    out = clip_ring_convex(RECT, tri)
    # rect corner (10,10) is on the hypotenuse x+y=20 -> full rect kept
    assert _area(out) == pytest.approx(100.0)
    tri2 = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (0.0, 0.0)]
    out2 = clip_ring_convex(RECT, tri2)
    assert _area(out2) == pytest.approx(50.0)


def test_clip_ring_convex_orientation_insensitive():
    cw = list(reversed(DIAMOND))
    a1 = _area(clip_ring_convex(RECT, DIAMOND))
    a2 = _area(clip_ring_convex(RECT, cw))
    assert a1 == pytest.approx(a2) == pytest.approx(_area(DIAMOND))


@pytest.fixture()
def feats(spark):
    rows = [
        (1, [(0, False, [{"x": x, "y": y} for x, y in RECT])]),
        (2, [(0, False, [{"x": x + 100, "y": y} for x, y in RECT])]),  # outside
    ]
    schema = ("shape_id long, parts array<struct<part_idx int, is_hole boolean, "
              "ring array<struct<x double, y double>>>>")
    return spark.createDataFrame(rows, schema)


def test_clip_features_window_df(spark, feats):
    out = clip_features_window(feats, (4.0, 3.0, 50.0, 50.0)).collect()
    assert len(out) == 1 and out[0]["shape_id"] == 1
    ring = [(p["x"], p["y"]) for p in out[0]["parts"][0]["ring"]]
    assert _area(ring) == pytest.approx(42.0)


def test_intersect_features_df(spark, feats):
    clip_rows = [(7, [(0, False, [{"x": x, "y": y} for x, y in DIAMOND])])]
    schema = ("clip_id long, parts array<struct<part_idx int, is_hole boolean, "
              "ring array<struct<x double, y double>>>>")
    clip = spark.createDataFrame(clip_rows, schema)
    out = intersect_features(feats, clip).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["shape_id"], r["clip_id"]) == (1, 7)
    ring = [(p["x"], p["y"]) for p in r["parts"][0]["ring"]]
    assert _area(ring) == pytest.approx(_area(DIAMOND))
