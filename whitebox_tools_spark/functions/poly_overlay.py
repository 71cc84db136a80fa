"""General (concave x concave, holes-aware) polygon overlay kernel.

The reference implements vector overlay by splitting both boundaries at
their mutual intersections, classifying each boundary fragment against
the other region, selecting fragments per operation, and reassembling
rings (gis_analysis/intersect.rs:941,1326-1408, union.rs, clip.rs,
erase.rs, symmetrical_difference.rs — semantics only; this kernel is an
independent implementation of the same classical decomposition).

Regions are even-odd over their ring sets (shells CCW, holes CW after
normalization). Per pair (A, B):

  1. split every boundary segment of A at its intersections with B's
     segments (and vice versa) — each crossing point is computed ONCE
     and reused on both sides, so stitching uses exact float equality;
  2. classify each fragment midpoint against the other region:
     'in' / 'out' / 'on' (collinear shared boundary; for 'on', the
     side-relation of the two interiors decides);
  3. select + orient fragments per op:
        intersect : A-in (keep) + B-in (keep) + on/same-side once
        union     : A-out (keep) + B-out (keep) + on/same-side once
        difference: A-out (keep) + B-in (REVERSED) + on/opposite once
        symdiff   : A-out + A-in(rev) + B-out + B-in(rev), all 'on' drop
  4. stitch fragments end-to-end into closed rings (most-counter-
     clockwise turn at multi-way junctions); signed area < 0 -> hole.

Pure-Python lists in, lists out — the Spark operators batch pairs
through this kernel inside mapInPandas (overlay_vector.overlay_features).
"""

from __future__ import annotations

import math

EPS = 1e-9


def ring_signed_area2(ring: list) -> float:
    """Twice the signed area of a closed or open ring."""
    r = ring[:-1] if len(ring) > 1 and ring[0] == ring[-1] else ring
    n = len(r)
    return sum(r[i][0] * r[(i + 1) % n][1] - r[(i + 1) % n][0] * r[i][1]
               for i in range(n))


def normalize_rings(parts: list) -> list:
    """[(is_hole, closed_ring)] with shells CCW and holes CW."""
    out = []
    for is_hole, ring in parts:
        r = list(ring)
        if r[0] != r[-1]:
            r = r + [r[0]]
        a2 = ring_signed_area2(r)
        if (not is_hole and a2 < 0) or (is_hole and a2 > 0):
            r = r[::-1]
        out.append((is_hole, r))
    return out


def _segments(rings: list) -> list:
    """Directed segments [(p, q)] over all closed rings."""
    segs = []
    for _h, r in rings:
        for i in range(len(r) - 1):
            if r[i] != r[i + 1]:
                segs.append((r[i], r[i + 1]))
    return segs


def _seg_params(p, q, a, b, collinear_only=False):
    """Intersection of segment p->q with a->b.
    Returns list of (t, point) split params for p->q (0 < t < 1 only
    handled by caller), covering proper crossings, T-touches and
    collinear overlaps (where a/b endpoints project inside p->q).
    collinear_only skips the crossing branch — the reverse-direction
    call must NOT recompute a crossing point parametrized on the other
    segment (it lands 1 ulp off the forward-computed point and breaks
    exact-equality stitching); crossings cut the other side via
    _param_on over the SAME point instead."""
    px, py = p
    qx, qy = q
    ax, ay = a
    bx, by = b
    rx, ry = qx - px, qy - py
    sx, sy = bx - ax, by - ay
    denom = rx * sy - ry * sx
    acx, acy = ax - px, ay - py
    if abs(denom) > EPS:
        if collinear_only:
            return []
        t = (acx * sy - acy * sx) / denom
        u = (acx * ry - acy * rx) / denom
        if -EPS <= t <= 1 + EPS and -EPS <= u <= 1 + EPS:
            pt = (px + t * rx, py + t * ry)
            return [(t, pt)]
        return []
    # parallel: collinear?
    cross = acx * ry - acy * rx
    if abs(cross) > EPS * max(1.0, abs(rx) + abs(ry)):
        return []
    # collinear: project a, b onto p->q
    rr = rx * rx + ry * ry
    if rr <= EPS:
        return []
    out = []
    for cx, cy in (a, b):
        t = ((cx - px) * rx + (cy - py) * ry) / rr
        if EPS < t < 1 - EPS:
            out.append((t, (cx, cy)))
    return out


def _split_all(rings_a: list, rings_b: list):
    """Split A's segments at intersections with B's segments (and the
    reverse), computing every crossing point once. Returns (frags_a,
    frags_b): lists of (p, q) sub-segments."""
    segs_a = _segments(rings_a)
    segs_b = _segments(rings_b)
    cuts_a: dict[int, list] = {i: [] for i in range(len(segs_a))}
    cuts_b: dict[int, list] = {j: [] for j in range(len(segs_b))}
    for i, (p, q) in enumerate(segs_a):
        for j, (a, b) in enumerate(segs_b):
            hits = _seg_params(p, q, a, b)
            for t, pt in hits:
                if EPS < t < 1 - EPS:
                    cuts_a[i].append((t, pt))
            # the same geometric point must cut B's segment too — derive
            # u from the SAME pt so both sides stitch on exact floats
            for _t, pt in hits:
                u = _param_on(a, b, pt)
                if u is not None and EPS < u < 1 - EPS:
                    cuts_b[j].append((u, pt))
            # collinear overlap only: p/q endpoints may cut a->b (exact
            # original vertices — crossings are handled above via the
            # shared forward-computed point)
            for u, pt in _seg_params(a, b, p, q, collinear_only=True):
                if EPS < u < 1 - EPS:
                    cuts_b[j].append((u, pt))

    def emit(segs, cuts):
        frags = []
        for i, (p, q) in enumerate(segs):
            pts = sorted(set(cuts[i]), key=lambda tp: tp[0])
            prev = p
            for _t, pt in pts:
                if pt != prev:
                    frags.append((prev, pt))
                    prev = pt
            if q != prev:
                frags.append((prev, q))
        return frags

    return emit(segs_a, cuts_a), emit(segs_b, cuts_b)


def _param_on(a, b, pt) -> float | None:
    """Parameter of pt along a->b if pt lies on the segment."""
    ax, ay = a
    bx, by = b
    dx, dy = bx - ax, by - ay
    dd = dx * dx + dy * dy
    if dd <= EPS:
        return None
    t = ((pt[0] - ax) * dx + (pt[1] - ay) * dy) / dd
    if t < -EPS or t > 1 + EPS:
        return None
    # perpendicular distance check
    px = ax + t * dx - pt[0]
    py = ay + t * dy - pt[1]
    if px * px + py * py > EPS:
        return None
    return t


def point_in_region(pt, rings: list) -> str:
    """'in' / 'out' / 'on' of pt vs the even-odd region over rings."""
    x, y = pt
    inside = False
    for _h, r in rings:
        for i in range(len(r) - 1):
            (x1, y1), (x2, y2) = r[i], r[i + 1]
            # on-boundary check (distance to segment)
            dx, dy = x2 - x1, y2 - y1
            dd = dx * dx + dy * dy
            if dd > 0:
                t = max(0.0, min(1.0, ((x - x1) * dx + (y - y1) * dy) / dd))
                ex, ey = x1 + t * dx - x, y1 + t * dy - y
                if ex * ex + ey * ey < EPS:
                    return "on"
            if (y1 > y) != (y2 > y):
                xi = x1 + (y - y1) / (y2 - y1) * (x2 - x1)
                if x < xi:
                    inside = not inside
    return "in" if inside else "out"


def _classify(frags: list, other_rings: list, own_rings: list):
    """[(p, q, cls)] with cls in 'in'/'out'/'on_same'/'on_opp'.
    For 'on' fragments the interiors' side-relation decides: sample a
    point slightly left of the fragment; if it is inside BOTH regions
    the interiors are on the same side ('on_same'), else back-to-back
    ('on_opp')."""
    out = []
    for p, q in frags:
        mx, my = (p[0] + q[0]) / 2.0, (p[1] + q[1]) / 2.0
        cls = point_in_region((mx, my), other_rings)
        if cls == "on":
            dx, dy = q[0] - p[0], q[1] - p[1]
            d = math.hypot(dx, dy)
            if d <= EPS:
                continue
            # the probe must clear point_in_region's on-boundary
            # tolerance (sqrt(EPS) ~ 3e-5) or both probes read 'on'
            # and every shared edge would classify as same-side
            off = max(d * 1e-7, 1e-4)
            nx, ny = -dy / d * off, dx / d * off   # left normal
            left = (mx + nx, my + ny)
            lo = point_in_region(left, other_rings)
            li = point_in_region(left, own_rings)
            cls = "on_same" if (lo == li) else "on_opp"
        out.append((p, q, cls))
    return out


def _stitch(frags: list) -> list:
    """Assemble directed fragments into closed rings. At junctions with
    several outgoing fragments, take the most counter-clockwise turn
    relative to the incoming direction (keeps rings simple)."""
    from collections import defaultdict

    by_start = defaultdict(list)
    for idx, (p, q) in enumerate(frags):
        by_start[p].append(idx)
    used = [False] * len(frags)
    rings = []
    for start_idx in range(len(frags)):
        if used[start_idx]:
            continue
        ring = [frags[start_idx][0]]
        cur = start_idx
        for _guard in range(len(frags) + 1):
            used[cur] = True
            p, q = frags[cur]
            ring.append(q)
            if q == ring[0]:
                break
            cands = [i for i in by_start[q] if not used[i]]
            if not cands:
                ring = None
                break
            if len(cands) == 1:
                cur = cands[0]
            else:
                inx, iny = q[0] - p[0], q[1] - p[1]
                ang_in = math.atan2(iny, inx)

                def turn(i):
                    op, oq = frags[i]
                    a = math.atan2(oq[1] - op[1], oq[0] - op[0])
                    # CCW turn angle in (-pi, pi]; pick the largest
                    d = a - (ang_in + math.pi)
                    while d <= -math.pi:
                        d += 2 * math.pi
                    while d > math.pi:
                        d -= 2 * math.pi
                    return d

                cur = max(cands, key=turn)
        else:
            ring = None
        if ring and len(ring) >= 4:
            if abs(ring_signed_area2(ring)) > EPS:
                rings.append(ring)
    return rings


def overlay_rings(parts_a: list, parts_b: list, mode: str) -> list:
    """Overlay two polygons. parts_*: [(is_hole, ring)] (rings open or
    closed). Returns [(is_hole, closed_ring)] of the result region.
    mode: 'intersect' | 'union' | 'difference' | 'symmetric_difference'.
    """
    a = normalize_rings(parts_a)
    b = normalize_rings(parts_b)
    fa, fb = _split_all(a, b)
    ca = _classify(fa, b, a)
    cb = _classify(fb, a, b)
    sel = []
    if mode == "intersect":
        sel += [(p, q) for p, q, c in ca if c == "in" or c == "on_same"]
        sel += [(p, q) for p, q, c in cb if c == "in"]
    elif mode == "union":
        sel += [(p, q) for p, q, c in ca if c == "out" or c == "on_same"]
        sel += [(p, q) for p, q, c in cb if c == "out"]
    elif mode == "difference":
        sel += [(p, q) for p, q, c in ca if c == "out" or c == "on_opp"]
        sel += [(q, p) for p, q, c in cb if c == "in"]
    elif mode == "symmetric_difference":
        sel += [(p, q) for p, q, c in ca if c == "out"]
        sel += [(q, p) for p, q, c in ca if c == "in"]
        sel += [(p, q) for p, q, c in cb if c == "out"]
        sel += [(q, p) for p, q, c in cb if c == "in"]
    else:
        raise ValueError(mode)
    # drop exact duplicate directed fragments (shared-boundary double copies)
    sel = list(dict.fromkeys(sel))
    rings = _stitch(sel)
    return [(ring_signed_area2(r) < 0, r) for r in rings]


def region_area(parts: list) -> float:
    """Even-odd area of [(is_hole, ring)]: sum of |shell| - |hole| via
    signed areas after normalization."""
    total = 0.0
    for _h, r in normalize_rings(parts):
        total += ring_signed_area2(r) / 2.0
    return total
