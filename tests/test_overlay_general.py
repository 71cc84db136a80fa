"""General polygon overlay + dissolve gates: concave x concave, holes,
containment, shared edges — kernel (pure python) and DataFrame level."""

import pytest

from whitebox_tools_spark.functions.poly_overlay import (overlay_rings,
                                                         region_area,
                                                         ring_signed_area2)


def sq(x0, y0, x1, y1):
    return [(False, [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)])]


U_SHAPE = [(False, [(0, 0), (6, 0), (6, 5), (4, 5), (4, 2), (2, 2), (2, 5),
                    (0, 5), (0, 0)])]  # area 24
HOLEY = [(False, [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]),
         (True, [(3, 3), (3, 7), (7, 7), (7, 3), (3, 3)])]  # area 84


CASES = [
    # (A, B, {mode: expected_area})
    (sq(0, 0, 2, 2), sq(1, 1, 3, 3),
     {"intersect": 1, "union": 7, "difference": 3, "symmetric_difference": 6}),
    (U_SHAPE, sq(-1, 3, 7, 4),
     {"intersect": 4, "union": 28, "difference": 20, "symmetric_difference": 24}),
    (sq(0, 0, 10, 10), sq(2, 2, 4, 4),
     {"intersect": 4, "union": 100, "difference": 96, "symmetric_difference": 96}),
    (sq(0, 0, 2, 2), sq(2, 0, 4, 2),   # shared edge
     {"intersect": 0, "union": 8, "difference": 4, "symmetric_difference": 8}),
    (HOLEY, sq(2, 2, 8, 8),
     {"intersect": 20, "union": 100, "difference": 64, "symmetric_difference": 84 + 36 - 2 * 20}),
    (U_SHAPE, U_SHAPE[:],               # self overlay
     {"intersect": 24, "union": 24, "difference": 0, "symmetric_difference": 0}),
]


def test_overlay_kernel_area_matrix():
    for a, b, wants in CASES:
        for mode, want in wants.items():
            out = overlay_rings(a, b, mode)
            assert region_area(out) == pytest.approx(want, abs=1e-9), (mode, want)


def test_overlay_kernel_area_identity():
    """area(A) + area(B) == area(A u B) + area(A n B) for every case."""
    for a, b, _ in CASES:
        aa, ab = region_area(a and [(h, list(r)) for h, r in a]), region_area(b)
        aa = region_area(a)
        u = region_area(overlay_rings(a, b, "union"))
        i = region_area(overlay_rings(a, b, "intersect"))
        assert aa + ab == pytest.approx(u + i, abs=1e-9)


def test_overlay_rings_are_closed_and_signed():
    out = overlay_rings(sq(0, 0, 10, 10), sq(2, 2, 4, 4), "symmetric_difference")
    assert len(out) == 2
    shells = [r for h, r in out if not h]
    holes = [r for h, r in out if h]
    assert len(shells) == 1 and len(holes) == 1
    assert all(r[0] == r[-1] for _h, r in out)
    assert ring_signed_area2(shells[0]) > 0
    assert ring_signed_area2(holes[0]) < 0


def test_overlay_features_dataframe(spark):
    from whitebox_tools_spark.operators.overlay_vector import overlay_features

    def layer(idc, shapes):
        rows = [(i, [{"part_idx": j, "is_hole": h,
                      "ring": [{"x": float(x), "y": float(y)} for x, y in r]}
                     for j, (h, r) in enumerate(parts)])
                for i, parts in enumerate(shapes)]
        return spark.createDataFrame(
            rows,
            f"{idc} long, parts array<struct<part_idx:int,is_hole:boolean,"
            f"ring:array<struct<x:double,y:double>>>>",
        )

    a = layer("shape_id", [sq(0, 0, 2, 2), U_SHAPE, sq(100, 100, 101, 101)])
    b = layer("clip_id", [sq(1, 1, 3, 3), sq(-1, 3, 7, 4)])
    out = overlay_features(a, b, "union").collect()
    # pass-through: the far square overlaps nothing
    assert any(r["shape_id"] == 2 and r["clip_id"] == -1 for r in out)
    got = {}
    for r in out:
        parts = [(p["is_hole"], [(v["x"], v["y"]) for v in p["ring"]]) for p in r["parts"]]
        got[(r["shape_id"], r["clip_id"])] = region_area(parts)
    assert got[(1, 0)] == pytest.approx(24 + 4 - 3)   # U-shape u small square
    assert got[(1, 1)] == pytest.approx(28)           # U-shape u bar
    assert got[(0, 0)] == pytest.approx(7)            # overlapping squares
    assert got[(2, -1)] == pytest.approx(1)


def test_dissolve_donut(spark):
    """A ring of 8 unit cells around an empty center dissolves to one
    shell + one hole."""
    from whitebox_tools_spark.operators.overlay_vector import dissolve

    cells = []
    i = 0
    for x in range(3):
        for y in range(3):
            if (x, y) == (1, 1):
                continue
            cells.append((i, 0, [{"part_idx": 0, "is_hole": False, "ring": [
                {"x": float(x), "y": float(y)}, {"x": float(x + 1), "y": float(y)},
                {"x": float(x + 1), "y": float(y + 1)}, {"x": float(x), "y": float(y + 1)},
                {"x": float(x), "y": float(y)}]}]))
            i += 1
    df = spark.createDataFrame(
        cells,
        "shape_id long, grp long, parts array<struct<part_idx:int,is_hole:boolean,"
        "ring:array<struct<x:double,y:double>>>>",
    )
    out = dissolve(df, "grp").collect()
    assert len(out) == 1
    parts = [(p["is_hole"], [(v["x"], v["y"]) for v in p["ring"]]) for p in out[0]["parts"]]
    assert sorted(h for h, _ in parts) == [False, True]
    assert region_area(parts) == pytest.approx(8.0)
