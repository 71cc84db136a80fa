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
