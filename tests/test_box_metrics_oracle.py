"""Audit of the box_metrics_exact oracle twin's pentagon fixture.

The twin (__spark_entry__._q_box_metrics_exact) gates box_metrics —
ElongationRatio / PatchOrientation / RelatedCircumscribingCircle —
against an order-free DuckDB restatement: strict min over the five
edge-flush boxes (projection arithmetic) and MEC = min radius over the
twenty candidate circles containing all vertices. The restatement
equals the kernel's rotating-calipers + deterministic-Welzl output
only when the fixture carries real margins everywhere a float
comparison decides something. The rect/diamond layer fails that (its
caliper candidates tie EXACTLY — the reason box_metrics itself stays
rows-only), and QUADRILATERALS carry a geometric identity making
adjacent edge-flush boxes exactly equal-area on ~25% of random shapes
(verified in exact rational arithmetic during fixture selection —
that scan is why the twin uses pentagons). This test certifies the
event_id % 173 == 1 pentagon fixture shape by shape:

1. convex with margin, all five vertices on the hull (the oracle
   enumerates POLYGON edges; a reflex vertex would make kernel hull
   edges differ);
2. the min-area box is either >= 1e-6 separated from every other
   candidate, or tied only with candidates whose (elongation,
   orientation) agree to 1e-9 (parallel edges — the same box);
3. du/dv separated (the long-axis CASE picks the same branch in both
   engines) and azimuth >= 1e-3 away from the 0/180 wrap;
4. kernel output vs a pure-Python replica of the oracle's expression
   text agree after ROUND(6/4/6), with every value >= 1e-4 from its
   rounding half-grid (so last-ulp hypot/BLAS/atan2 divergence between
   numpy, libm and DuckDB cannot flip a rounded digit);
5. MEC decided with margin: non-defining vertices of the winning
   circle are >= 1e-6 inside, every smaller-radius candidate is
   >= 1e-6 infeasible, and the winning radius is >= 1e-9 separated
   from distinct feasible radii (or tied bitwise).

Pure Python/numpy — no Spark session.
"""

import math
from itertools import combinations

from whitebox_tools_spark.operators.vector_ops import (_min_area_box,
                                                       _welzl_mec)

EPS = 1e-9
N = 5
DIRS = [(1.0, 0.0), (0.31, 0.95), (-0.81, 0.59), (-0.81, -0.59),
        (0.31, -0.95)]
PRIMES_R = (7919, 104729, 12553, 30011, 65537)
PRIMES_J = (131, 257, 389, 521, 641)


def _pentagons(n_events=10000, k=173, r=1):
    """The __spark_entry__._bmx_verts_sql layer rebuilt in Python —
    every arithmetic step in the same order as the SQL text."""
    out = []
    for e in range(n_events):
        if e % k != r:
            continue
        cx = (e * 48271) % 100000 / 100.0 + 0.005
        cy = (e * 69621) % 100000 / 100.0 + 0.005
        v = []
        for i in range(N):
            rad = 8.0 + (e * PRIMES_R[i]) % 400 / 100.0
            jx = (e * PRIMES_J[i]) % 100 / 100.0 * 0.6 - 0.3
            jy = (e * (PRIMES_J[i] + 6)) % 100 / 100.0 * 0.6 - 0.3
            v.append((cx + rad * DIRS[i][0] + jx,
                      cy + rad * DIRS[i][1] + jy))
        out.append((e, v))
    return out


def _edge_boxes(v):
    """The oracle's per-edge flush boxes (sqrt/projection text)."""
    boxes = []
    for i in range(N):
        a, b = v[i], v[(i + 1) % N]
        dx, dy = b[0] - a[0], b[1] - a[1]
        n = math.sqrt(dx * dx + dy * dy)
        ux, uy = dx / n, dy / n
        pu = [p[0] * ux + p[1] * uy for p in v]
        pv = [p[0] * (-uy) + p[1] * ux for p in v]
        du = max(pu) - min(pu)
        dv = max(pv) - min(pv)
        boxes.append((du * dv, du, dv, ux, uy))
    return boxes


def _metrics_of(box):
    _, du, dv, ux, uy = box
    long_, short_ = (du, dv) if du >= dv else (dv, du)
    ang = math.degrees(math.atan2(uy, ux) if du >= dv
                       else math.atan2(ux, -uy))
    return 1.0 - short_ / long_, (90.0 - ang) % 180.0


def _mec_candidates(v):
    cands = []
    for a, b in combinations(v, 2):
        cx, cy = (a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0
        cands.append((cx, cy,
                      math.sqrt((a[0] - cx) ** 2 + (a[1] - cy) ** 2),
                      (a, b)))
    for a, b, c in combinations(v, 3):
        ax, ay = a
        bx, by = b
        cx, cy = c
        d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if d == 0.0:
            continue
        ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by)
              * (cy - ay) + (cx * cx + cy * cy) * (ay - by)) / d
        uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by)
              * (ax - cx) + (cx * cx + cy * cy) * (bx - ax)) / d
        cands.append((ux, uy,
                      math.sqrt((ax - ux) ** 2 + (ay - uy) ** 2),
                      (a, b, c)))
    return cands


def _half_margin(x, nd):
    f = abs(x) * 10 ** nd
    return abs(f - math.floor(f) - 0.5)


def test_box_metrics_pentagon_fixture_sf001():
    pents = _pentagons()
    assert len(pents) == 58
    for e, v in pents:
        # 1. convex with margin (cross products of consecutive edges)
        for i in range(N):
            a, b, c = v[i], v[(i + 1) % N], v[(i + 2) % N]
            cr = ((b[0] - a[0]) * (c[1] - a[1])
                  - (b[1] - a[1]) * (c[0] - a[0]))
            assert cr > 0.1, f"e={e}: reflex/degenerate vertex"

        boxes = _edge_boxes(v)
        order = sorted(range(N), key=lambda i: boxes[i][0])
        amin = boxes[order[0]][0]
        elo_o, azi_o = _metrics_of(boxes[order[0]])

        # 2. separated min, or bitwise-benign parallel-edge ties
        for i in order[1:]:
            rel = (boxes[i][0] - amin) / amin
            if rel < 1e-6:
                elo_i, azi_i = _metrics_of(boxes[i])
                assert abs(elo_i - elo_o) < 1e-9, f"e={e}: harmful tie"
                assert abs(azi_i - azi_o) < 1e-9, f"e={e}: harmful tie"

        # 3. long-axis branch + azimuth wrap margins
        _, du, dv, _, _ = boxes[order[0]]
        assert abs(du - dv) / max(du, dv) > 1e-6, f"e={e}: square box"
        assert 1e-3 < azi_o < 180.0 - 1e-3, f"e={e}: azimuth on the wrap"

        # 4. kernel vs replica, rounded-equal with half-grid margins
        ring = v + [v[0]]
        s, l, az = _min_area_box(ring)
        r_k = _welzl_mec(ring)
        area = 0.0
        for i in range(N):
            area = area + (v[i][0] * v[(i + 1) % N][1]
                           - v[(i + 1) % N][0] * v[i][1])
        area = abs(area) / 2.0
        elo_k = 1.0 - s / l
        rc_k = 1.0 - area / (math.pi * r_k * r_k)

        feas = []
        for ccx, ccy, r, definers in _mec_candidates(v):
            worst = min((r + EPS) - math.sqrt((p[0] - ccx) ** 2
                                              + (p[1] - ccy) ** 2)
                        for p in v)
            if worst >= 0:
                feas.append((r, ccx, ccy, definers))
            elif not feas or r < min(f[0] for f in feas):
                # 5b. smaller-radius infeasible candidates must be
                # robustly infeasible
                assert worst < -1e-6, f"e={e}: borderline candidate"
        feas.sort()
        r_o, ccx, ccy, definers = feas[0]
        # 5a. non-defining vertices of the winner robustly inside
        for p in v:
            if p in definers:
                continue
            slack = (r_o + EPS) - math.sqrt((p[0] - ccx) ** 2
                                            + (p[1] - ccy) ** 2)
            assert slack > 1e-6, f"e={e}: MEC decided at the eps edge"
        for r2 in [f[0] for f in feas[1:]]:
            assert r2 == r_o or r2 - r_o > 1e-9, f"e={e}: MEC radius tie"
        rc_o = 1.0 - area / (math.pi * r_o * r_o)

        for kv, ov, nd in ((elo_k, elo_o, 6), (az, azi_o, 4),
                           (rc_k, rc_o, 6)):
            assert round(kv * 10 ** nd) == round(ov * 10 ** nd), (
                f"e={e}: kernel and replica round apart "
                f"({kv!r} vs {ov!r} at {nd} dp)")
            assert _half_margin(kv, nd) > 1e-4, f"e={e}: half-grid risk"
            assert _half_margin(ov, nd) > 1e-4, f"e={e}: half-grid risk"
