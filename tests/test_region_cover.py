"""region_cover (S2 RegionCoverer equivalent) vs a pure-Python
reference of the leaf-intersect decomposition + reference compaction,
plus the superset-cover contract."""

import sys

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402
from whitebox_tools_spark.operators.tiling import region_cover  # noqa: E402

from tests.test_cell_compact import _ref_compact  # noqa: E402

EX, EY, SIZE, L = 0.0, 0.0, 1000.0, 6
N = 1 << L
W = SIZE / N


def _winding_inside(ring, xs, ys):
    s = 0.0
    for (x0, y0), (x1, y1) in zip(ring[:-1], ring[1:]):
        il = (x1 - x0) * (ys - y0) - (xs - x0) * (y1 - y0)
        if y0 <= ys and y1 > ys and il > 0:
            s += 1.0
        elif y0 > ys and y1 <= ys and il < 0:
            s -= 1.0
    return s % 2.0 != 0.0


def _inside_region(shells, holes, xs, ys):
    return (any(_winding_inside(r, xs, ys) for r in shells)
            and not any(_winding_inside(r, xs, ys) for r in holes))


def _seg_rect(ax, ay, bx, by, x0, y0, x1, y1):
    if max(ax, bx) < x0 or min(ax, bx) > x1 or max(ay, by) < y0 or min(ay, by) > y1:
        return False
    ds = [(bx - ax) * (py - ay) - (by - ay) * (px - ax)
          for px, py in ((x0, y0), (x1, y0), (x1, y1), (x0, y1))]
    return not (all(d > 0 for d in ds) or all(d < 0 for d in ds))


def _ref_leaves(shells, holes):
    rings = list(shells) + list(holes)
    vcells = {(min(max(int((vx - EX) // W), 0), N - 1),
               min(max(int((vy - EY) // W), 0), N - 1))
              for r in rings for vx, vy in r}
    edges = [(a, b) for r in rings for a, b in zip(r[:-1], r[1:])]
    out = set()
    for iy in range(N):
        for ix in range(N):
            x0, y0 = EX + ix * W, EY + iy * W
            x1, y1 = EX + (ix + 1) * W, EY + (iy + 1) * W
            hit = ((ix, iy) in vcells
                   or any(_seg_rect(a[0], a[1], b[0], b[1], x0, y0, x1, y1)
                          for a, b in edges)
                   or _inside_region(shells, holes, x0, y0))
            if hit:
                out.add(_morton(ix, iy))
    return out


def _morton(ix, iy):
    def spread(v):
        v &= 0x7FFFFFFF
        v = (v | (v << 16)) & 0x0000FFFF0000FFFF
        v = (v | (v << 8)) & 0x00FF00FF00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v << 2)) & 0x3333333333333333
        v = (v | (v << 1)) & 0x5555555555555555
        return v

    return spread(ix) | (spread(iy) << 1)


def test_region_cover_matches_reference(spark):
    got = {}
    for r in region_cover(spark, E._polygons_df(spark),
                          extent=(EX, EY, SIZE), max_level=L).collect():
        got.setdefault(r["polygon_id"], []).append((r["cell_id"], r["level"]))
    assert set(got) == {0, 1, 2}
    for pid, shells, holes in E._POLYS:
        want = _ref_compact(_ref_leaves(shells, holes), L)
        assert sorted(got[pid]) == want


def test_region_cover_is_superset(spark):
    # every interior sample point's leaf cell appears in the expanded cover
    from tests.test_cell_compact import _expand

    cover = {}
    for r in region_cover(spark, E._polygons_df(spark),
                          extent=(EX, EY, SIZE), max_level=L).collect():
        cover.setdefault(r["polygon_id"], []).append((r["cell_id"], r["level"]))
    for pid, shells, holes in E._POLYS:
        leaves = _expand(cover[pid], L)
        for k in range(400):
            xs, ys = (k * 997) % 1000 + 0.3, (k * 643) % 1000 + 0.7
            if _inside_region(shells, holes, xs, ys):
                cell = _morton(int((xs - EX) // W), int((ys - EY) // W))
                assert cell in leaves, (pid, xs, ys)


def test_region_cover_random_polygons(spark):
    """Random convex polygons (deterministic seeds) vs the reference."""
    import math
    import random

    from pyspark.sql import Row

    polys = []
    for pid, seed in enumerate((3, 17, 41)):
        rng = random.Random(seed)
        cx, cy = rng.uniform(200, 800), rng.uniform(200, 800)
        rad = rng.uniform(60, 250)
        angs = sorted(rng.uniform(0, 2 * math.pi) for _ in range(rng.randrange(4, 9)))
        ring = [(round(cx + rad * math.cos(a), 3),
                 round(cy + rad * math.sin(a), 3)) for a in angs]
        ring.append(ring[0])
        polys.append((pid, [ring], []))

    rows = []
    for pid, shells, holes in polys:
        xs = [p[0] for r in shells for p in r]
        ys = [p[1] for r in shells for p in r]
        rows.append(Row(
            polygon_id=pid,
            bbox=Row(xmin=min(xs), ymin=min(ys), xmax=max(xs), ymax=max(ys)),
            parts=[Row(part_idx=0, is_hole=False,
                       ring=[Row(x=x, y=y) for x, y in shells[0]])],
        ))
    pdf = spark.createDataFrame(rows, E._POLY_SCHEMA)
    got = {}
    for r in region_cover(spark, pdf, extent=(EX, EY, SIZE),
                          max_level=L).collect():
        got.setdefault(r["polygon_id"], []).append((r["cell_id"], r["level"]))
    for pid, shells, holes in polys:
        want = _ref_compact(_ref_leaves(shells, holes), L)
        assert sorted(got[pid]) == want, pid
