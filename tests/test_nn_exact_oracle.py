"""Audit of the natural_neighbour_exact oracle twin.

The twin (__spark_entry__._q_natural_neighbour_exact) gates Sibson
natural-neighbour gridding over the audited 48-point sub-fixture
(record_num % 211 == 1, the same fixture certified sliver-free by
tests/test_tin_exact_oracle.py) against a full DuckDB replay of the
kernel pipeline. The replay is sound because:

- every DISCRETE decision uses expression text shared with the kernel
  and is therefore bitwise-identical — PROVIDED the comparisons carry
  real margins under both triangle-vertex orders (the kernel computes
  circumcenters in Bowyer-Watson vertex order, the oracle in canonical
  pid order; the formulas agree exactly only in real arithmetic);
- the CONTINUOUS outputs (polygon centroid, shoelace, weight sums)
  differ between engines only in float summation order; the twin
  rounds to 7 decimals, which must dominate that noise.

This test certifies both on the actual sf0.01 fixture and all 1600
query cells:

1. cavity membership (d2 < r2) decides identically under kernel-order
   and canonical-order circumcenters, with relative margin >= 1e-6;
2. barycentric containment decides identically under both vertex
   orders, with margin >= 1e-6 from the -1e-12 eps;
3. no degenerate new circumcenter (|d| >= 1, vs == 0.0 in the guard);
4. polygon angle sort is stable: minimum angular gap >= 1e-6 rad and
   members are >= 1e-3 from the centroid (so ulp-level centroid/atan2
   divergence cannot reorder);
5. the kernel output and a pure-Python replica of the oracle's text
   agree after ROUND(7), with the rounding half-grid margin at least
   100x the observed kernel-replica difference per cell, and live/NaN
   masks identical.

Pure Python/numpy — no Spark session.
"""

import math
from collections import defaultdict

import numpy as np

from whitebox_tools_spark.operators.tin import (circumcenters, delaunay,
                                                natural_neighbour_values)

from test_tin_exact_oracle import _fixture_points


def _containing(P, tris, m, qx, qy):
    qi, ti = np.nonzero(m)
    A, B, C = P[tris[ti, 0]], P[tris[ti, 1]], P[tris[ti, 2]]
    px, py = qx[qi], qy[qi]
    det = (B[:, 1] - C[:, 1]) * (A[:, 0] - C[:, 0]) \
        + (C[:, 0] - B[:, 0]) * (A[:, 1] - C[:, 1])
    l1 = ((B[:, 1] - C[:, 1]) * (px - C[:, 0])
          + (C[:, 0] - B[:, 0]) * (py - C[:, 1])) / det
    l2 = ((C[:, 1] - A[:, 1]) * (px - C[:, 0])
          + (A[:, 0] - C[:, 0]) * (py - C[:, 1])) / det
    l3 = 1.0 - l1 - l2
    ok = (det != 0.0) & (l1 >= -1e-12) & (l2 >= -1e-12) & (l3 >= -1e-12)
    marg = np.minimum(np.minimum(np.abs(l1 + 1e-12), np.abs(l2 + 1e-12)),
                      np.abs(l3 + 1e-12))
    return ok, marg


def test_natural_neighbour_exact_fixture_sf001():
    ids = [e for e in range(10000) if e % 211 == 1]
    pts = _fixture_points(ids)
    P = np.array([(x, y) for x, y, _ in pts])
    Z = np.array([z for _, _, z in pts])
    assert len(P) == 48

    tris_k = delaunay(P)               # kernel vertex order
    tri_c = np.sort(tris_k, axis=1)    # oracle canonical pid order
    cc_k = circumcenters(P, tris_k)
    cc_c = circumcenters(P, tri_c)

    cols, rows = np.meshgrid(np.arange(40), np.arange(40))
    qx = 0.0 + (cols.ravel() + 0.5) * 25.0
    qy = 1000.0 - (rows.ravel() + 0.5) * 25.0
    nq = len(qx)

    out_kernel = natural_neighbour_values(P, Z, tris_k, qx, qy)

    # 1. cavity membership under both circumcenter variants
    def membership(cc):
        dx = cc[None, :, 0] - qx[:, None]
        dy = cc[None, :, 1] - qy[:, None]
        d2 = dx * dx + dy * dy
        return d2 < cc[None, :, 2], d2

    m_k, d2_k = membership(cc_k)
    m_c, d2_c = membership(cc_c)
    assert (m_k == m_c).all(), "cavity membership differs by vertex order"
    for d2, cc in ((d2_k, cc_k), (d2_c, cc_c)):
        rel = np.abs(d2 - cc[None, :, 2]) / np.maximum(cc[None, :, 2], 1e-300)
        assert rel.min() > 1e-6, "circumcircle test without margin"

    # 2. containment under both vertex orders
    ok_k, mg_k = _containing(P, tris_k, m_k, qx, qy)
    ok_c, mg_c = _containing(P, tri_c, m_k, qx, qy)
    assert (ok_k == ok_c).all(), "containment differs by vertex order"
    assert min(mg_k.min(), mg_c.min()) > 1e-6, "containment at the eps edge"

    # ---- replica of the oracle text (canonical order, sqrt-free) ----
    qi2, ti2 = np.nonzero(m_c)
    keepq = np.zeros(nq, bool)
    keepq[qi2[ok_c]] = True
    sel = keepq[qi2]
    qi2, ti2 = qi2[sel], ti2[sel]

    edges = defaultdict(int)
    for q, t in zip(qi2, ti2):
        a, b, c = tri_c[t]
        for u, v in ((a, b), (b, c), (a, c)):
            edges[(q, min(u, v), max(u, v))] += 1
    bedge = [k for k, n in edges.items() if n == 1]
    deg = defaultdict(int)
    for q, u, v in bedge:
        deg[(q, u)] += 1
        deg[(q, v)] += 1
    bad = {q for (q, _u), dg in deg.items() if dg != 2}
    live = {q for q, _, _ in bedge if q not in bad}

    # 3. new circumcenters: degeneracy margin
    newc = {}
    for (q, u, v) in bedge:
        ax, ay = P[u]
        bx, by = P[v]
        px, py = qx[q], qy[q]
        d = 2.0 * (ax * (by - py) + bx * (py - ay) + px * (ay - by))
        assert abs(d) > 1.0, "near-degenerate new circumcenter"
        a2 = ax * ax + ay * ay
        b2 = bx * bx + by * by
        q2 = px * px + py * py
        newc[(q, u, v)] = (
            (a2 * (by - py) + b2 * (py - ay) + q2 * (ay - by)) / d,
            (a2 * (px - bx) + b2 * (ax - px) + q2 * (bx - ax)) / d)

    memb = defaultdict(list)
    bset = {(q, u) for q, u, _ in bedge} | {(q, v) for q, _, v in bedge}
    for q, t in zip(qi2, ti2):
        if q not in live:
            continue
        for v in tri_c[t]:
            if (q, v) in bset:
                memb[(q, v)].append((cc_c[t, 0], cc_c[t, 1]))
    for (q, u, v), c in newc.items():
        if q in live:
            memb[(q, u)].append(c)
            memb[(q, v)].append(c)

    # 4. angle-sort stability + 5. weighted output
    wsum = np.zeros(nq)
    zsum = np.zeros(nq)
    for (q, v), ms in memb.items():
        X = np.array([m[0] for m in ms])
        Y = np.array([m[1] for m in ms])
        cx0, cy0 = X.mean(), Y.mean()
        r = np.sqrt((X - cx0) ** 2 + (Y - cy0) ** 2)
        assert r.min() > 1e-3, "polygon member on the centroid"
        ang = np.arctan2(Y - cy0, X - cx0)
        s = np.sort(ang)
        gaps = np.r_[np.diff(s), 2 * math.pi - (s[-1] - s[0])]
        assert gaps.min() > 1e-6, "angle tie in the polygon sort"
        o = np.argsort(ang)
        X2, Y2 = X[o], Y[o]
        a2s = np.sum(X2 * np.roll(Y2, -1) - np.roll(X2, -1) * Y2)
        w = 0.5 * abs(a2s)
        wsum[q] += w
        zsum[q] += w * Z[v]

    out_rep = np.full(nq, np.nan)
    lv = np.zeros(nq, bool)
    lv[list(live)] = True
    okf = lv & (wsum > 0)
    out_rep[okf] = zsum[okf] / wsum[okf]

    kmask = np.isfinite(out_kernel)
    assert (kmask == np.isfinite(out_rep)).all(), "live masks differ"
    assert kmask.sum() == 1249
    vals, vr = out_kernel[kmask], out_rep[kmask]
    nd = 7
    assert (np.round(vals * 10 ** nd) == np.round(vr * 10 ** nd)).all(), (
        "kernel and replica round apart at 7 dp")

    def half_margin(x):
        f = np.abs(x) * 10 ** nd
        return np.abs(f - np.floor(f) - 0.5) * 10.0 ** (-nd)

    hm = np.minimum(half_margin(vals), half_margin(vr))
    noise = np.abs(vals - vr)
    assert (hm > 100.0 * np.maximum(noise, 1e-16)).all(), (
        "rounding half-grid margin under 100x the engine noise")
