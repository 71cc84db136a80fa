"""Kernel parity tests ported from the reference unit tests
(whitebox-common/src/algorithms/poly_ops.rs:180-256)."""

import numpy as np

from whitebox_tools_spark.functions import geometry as G

# poly_ops.rs test polygon: triangle (0,0) (10,0) (5,10), closed
TRI = np.array([(0.0, 0.0), (10.0, 0.0), (5.0, 10.0), (0.0, 0.0)])
# rect used in winding tests: (0,0)(5,0)(5,5)(0,5)
RECT = np.array([(0.0, 0.0), (5.0, 0.0), (5.0, 5.0), (0.0, 5.0), (0.0, 0.0)])


def test_point_in_poly_inside_outside():
    # poly_ops.rs:184-196 semantics
    px = np.array([5.0, 20.0, 5.0])
    py = np.array([5.0, 5.0, 20.0])
    inside = G.points_in_polygon(px, py, TRI)
    assert inside.tolist() == [True, False, False]


def test_boundary_point_is_outside():
    # poly_ops.rs:205-209 verbatim: triangle (0,0)(5,0)(5,5);
    # point ON the right edge (5,2) -> wn == 0 (outside), (4,2) inside,
    # (6,2) outside.
    tri = np.array([(0.0, 0.0), (5.0, 0.0), (5.0, 5.0), (0.0, 0.0)])
    px = np.array([5.0, 4.0, 6.0])
    py = np.array([2.0, 2.0, 2.0])
    wn = G.winding_number(px, py, tri)
    assert wn.tolist() == [0, 1, 0]


def test_rect_winding():
    px = np.array([2.0, 5.0, -1.0])
    py = np.array([2.0, 2.0, 2.0])  # inside, on right edge, outside
    inside = G.points_in_polygon(px, py, RECT)
    assert inside.tolist() == [True, False, False]


def test_hole_override():
    shell = np.array([(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)])
    hole = np.array([(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0), (2.0, 2.0)])
    px = np.array([1.0, 5.0, 11.0])
    py = np.array([1.0, 5.0, 5.0])
    v = G.points_in_feature(px, py, [shell], [hole], bbox=(0.0, 0.0, 10.0, 10.0))
    assert v.tolist() == [True, False, False]


def test_sequential_record_state():
    """A later record's hole overrides an earlier record's shell — the
    clip_lidar_to_polygon.rs:274-317 sequential-scan semantics."""
    shell_a = np.array([(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)])
    hole_b = np.array([(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)])
    shell_b = np.array([(20.0, 0.0), (20.0, 10.0), (30.0, 10.0), (30.0, 0.0), (20.0, 0.0)])
    px = np.array([5.0, 1.0])
    py = np.array([5.0, 1.0])
    v = G.points_in_feature(px, py, [shell_a], [], bbox=(0.0, 0.0, 10.0, 10.0))
    v = G.points_in_feature(px, py, [shell_b], [hole_b], bbox=(0.0, 0.0, 30.0, 10.0), state=v)
    assert v.tolist() == [False, True]


def test_shoelace_and_orientation():
    # clockwise ring (in y-up coords) has negative... WBT: CW positive area?
    # poly_area.rs returns signed area; is_clockwise = area < 0.
    ccw = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)])
    assert G.shoelace_area(ccw) == 50.0 * 2  # 100.0
    assert not G.is_clockwise(ccw)
    cw = ccw[::-1].copy()
    assert G.shoelace_area(cw) == -100.0
    assert G.is_clockwise(cw)
