"""Audit of the exact-Delaunay oracle sub-fixtures.

The `*_exact` TIN queries (construct_tin_exact / tin_gridding_exact /
tin_contours_exact / normalize_lidar_exact in __spark_entry__) gate the
TIN operators against a DuckDB replay whose Delaunay CTE is the
ORDER-FREE empty-circumcircle rule evaluated in float. That rule equals
the operators' float Bowyer-Watson output only when the fixture has no
near-degenerate sliver whose decision depends on insertion order. This
test certifies both sub-fixtures by computing THREE independent
triangle sets and asserting they coincide:

1. the operator kernel (tin.delaunay, float Bowyer-Watson with a
   super-triangle, canonically sorted input — exactly what
   delaunay_certified's tiles and fallback execute);
2. the float empty-circumcircle rule, the exact expression text the
   DuckDB oracle runs (tin._circumcircle's center/radius formulas);
3. the EXACT integer-arithmetic Delaunay: every coordinate double
   times 2^60 is an exact integer here, so orientation and incircle
   are exact 2x2 / 3x3 integer determinants with no rounding at all.

1 == 3 proves the kernel commits no rounding error on this input
(no sliver drops, no super-triangle hull artifact); 2 == 3 proves the
oracle's float formulation decides every (triple, point) pair like
exact arithmetic — together the replay is bit-exact by construction,
not by coincidence. Runs in pure Python/numpy (no Spark session).
"""

from fractions import Fraction
from itertools import combinations

import numpy as np

from whitebox_tools_spark.operators.tin import delaunay

SCALE = 1 << 60  # fixture coords are >= 2^-8 in magnitude: ulp >= 2^-60


def _fixture_points(ids):
    """The __spark_entry__ point layer for the given event ids."""
    pts = [((e * 48271) % 100000 / 100.0 + 0.005,
            (e * 69621) % 100000 / 100.0 + 0.005,
            float(e % 1000)) for e in ids]
    pts.sort()
    return pts


def _exact_delaunay(pts):
    """Exact Delaunay of the double coordinates via integer predicates."""
    n = len(pts)
    xi = [int(Fraction(x) * SCALE) for x, _, _ in pts]
    yi = [int(Fraction(y) * SCALE) for _, y, _ in pts]
    for (x, y, _), a, b in zip(pts, xi, yi):
        assert Fraction(a, SCALE) == Fraction(x)
        assert Fraction(b, SCALE) == Fraction(y)
    out = set()
    for a, b, c in combinations(range(n), 3):
        ori = (xi[b] - xi[a]) * (yi[c] - yi[a]) \
            - (yi[b] - yi[a]) * (xi[c] - xi[a])
        if ori == 0:
            continue
        empty = True
        for p in range(n):
            if p in (a, b, c):
                continue
            adx = xi[a] - xi[p]; ady = yi[a] - yi[p]
            bdx = xi[b] - xi[p]; bdy = yi[b] - yi[p]
            cdx = xi[c] - xi[p]; cdy = yi[c] - yi[p]
            aw = adx * adx + ady * ady
            bw = bdx * bdx + bdy * bdy
            cw = cdx * cdx + cdy * cdy
            det = (adx * (bdy * cw - bw * cdy)
                   - ady * (bdx * cw - bw * cdx)
                   + aw * (bdx * cdy - bdy * cdx))
            if (det if ori > 0 else -det) > 0:  # strictly inside
                empty = False
                break
        if empty:
            out.add(tuple(sorted((pts[a], pts[b], pts[c]))))
    return out


def _float_emptiness(pts):
    """The DuckDB oracle's formulation: tin._circumcircle's float
    center/radius + the strict inside test, over all lexicographic
    triples."""
    P = np.array([(x, y) for x, y, _ in pts])
    n = len(pts)
    out = set()
    for a, b, c in combinations(range(n), 3):
        ax, ay = P[a]; bx, by = P[b]; cx, cy = P[c]
        d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if d == 0.0:
            continue
        a2, b2, c2 = ax * ax + ay * ay, bx * bx + by * by, cx * cx + cy * cy
        ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
        uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        dx = P[:, 0] - ux
        dy = P[:, 1] - uy
        inside = (dx * dx + dy * dy) < r2
        inside[[a, b, c]] = False
        if not inside.any():
            out.add(tuple(sorted((pts[a], pts[b], pts[c]))))
    return out


def _audit(ids):
    pts = _fixture_points(ids)
    assert len({(x, y) for x, y, _ in pts}) == len(pts)  # injective coords
    P = np.array([(x, y) for x, y, _ in pts])
    kernel = {tuple(sorted((pts[a], pts[b], pts[c])))
              for a, b, c in delaunay(P)}
    exact = _exact_delaunay(pts)
    fl = _float_emptiness(pts)
    assert kernel == exact, (
        f"kernel B-W differs from the exact Delaunay "
        f"({len(kernel)} vs {len(exact)} triangles)")
    assert fl == exact, (
        f"float emptiness rule differs from the exact Delaunay "
        f"({len(fl)} vs {len(exact)} triangles)")
    return len(exact)


def test_tin_exact_fixture_sf001():
    """48-point sub-fixture (record_num % 211 == 1) at sf0.01."""
    n = _audit([e for e in range(10000) if e % 211 == 1])
    assert n == 83


def test_normalize_lidar_ground_fixture_sf001():
    """21 ground points (record_num % 59 == 0, classification 2)."""
    n = _audit([e for e in range(10000) if e % 59 == 0 and e % 8 == 2])
    assert n == 30


def _audit_points(pts):
    """Three-way Delaunay audit on an explicit (x, y, z) point list
    (the lidar_dsm twin's TIN runs over DERIVED points — the
    block-max cell centers — not a sub-slice of the raw fixture)."""
    assert len({(x, y) for x, y, _ in pts}) == len(pts)
    P = np.array([(x, y) for x, y, _ in pts])
    kernel = {tuple(sorted((pts[a], pts[b], pts[c])))
              for a, b, c in delaunay(P)}
    exact = _exact_delaunay(pts)
    fl = _float_emptiness(pts)
    assert kernel == exact, (
        f"kernel B-W differs from the exact Delaunay "
        f"({len(kernel)} vs {len(exact)} triangles)")
    assert fl == exact, (
        f"float emptiness rule differs from the exact Delaunay "
        f"({len(fl)} vs {len(exact)} triangles)")
    return len(exact)


def test_lidar_dsm_fixture_sf001():
    """lidar_dsm_exact's TIN input: block-max cell centers of the
    record_num % 175 == 0 sub-fixture at _META40 (40x40, res 25).
    Cell centers are lattice multiples of 12.5 (exact doubles, exact
    integers after the 2^60 scale); lattice sets normally carry
    co-circular quads (any cell rectangle breaks the order-free
    replay), so this audit is the twin's soundness certificate —
    these 58 occupied cells happen to admit a unique float-exact
    Delaunay (101 triangles, verified three ways)."""
    import math

    ids = [e for e in range(10000) if e % 175 == 0]
    cells = {}
    for x, y, z in _fixture_points(ids):
        r = math.floor((1000.0 - y) / 25.0)
        c = math.floor((x - 0.0) / 25.0)
        if 0 <= r < 40 and 0 <= c < 40:
            k = (r, c)
            cells[k] = max(cells.get(k, float("-inf")), z)
    assert len(ids) == 58 and len(cells) == 58
    pts = sorted((0.0 + (c + 0.5) * 25.0, 1000.0 - (r + 0.5) * 25.0, z)
                 for (r, c), z in cells.items())
    n = _audit_points(pts)
    assert n == 101


def _r2v_fixture_cells():
    """The junction-free raster-lines fixture from __spark_entry__
    (_R2V_FIX_SPARK), rebuilt in plain Python."""
    cells = {
        1.0: {(10, c) for c in range(5, 26)} | {(14, c) for c in range(40, 56)},
        2.0: {(r, r) for r in range(30, 51)},
        3.0: ({(60, c) for c in range(60, 71)} | {(70, c) for c in range(60, 71)}
              | {(r, 60) for r in range(61, 70)} | {(r, 70) for r in range(61, 70)}),
    }
    return cells


def test_r2v_exact_fixture_is_junction_free():
    """r2v_lines_exact's oracle is a canonical chain-decomposition
    replay — sound only while every vertex of the fixture's edge graph
    (after the elbow rule) has degree <= 2 and no foreground cell is
    isolated. Re-derive the graph with the operator's own edge rules
    and assert both properties."""
    from collections import defaultdict

    offs = [(0, 1), (1, 0), (1, 1), (1, -1)]
    for v, fg in _r2v_fixture_cells().items():
        edges = []
        for (r, c) in fg:
            for dr, dc in offs:
                n = (r + dr, c + dc)
                if n in fg:
                    edges.append(((r, c), n))
        kept = []
        for (p, q) in edges:
            if abs(p[0] - q[0]) == 1 and abs(p[1] - q[1]) == 1:
                if (p[0], q[1]) in fg or (q[0], p[1]) in fg:
                    continue  # the elbow-thinning rule
            kept.append((p, q))
        deg = defaultdict(int)
        for p, q in kept:
            deg[p] += 1
            deg[q] += 1
        assert max(deg.values()) <= 2, f"value {v}: junction present"
        assert all(c in deg for c in fg), f"value {v}: isolated cell"
