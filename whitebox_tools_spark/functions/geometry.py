"""Vectorized (numpy) computational-geometry kernels.

Bit-for-bit parity targets in the reference (transcribed math, not code):

- ``is_left`` cross product and even-odd winding-number PIP:
  whitebox-common/src/algorithms/poly_ops.rs:21-72. Points exactly ON a
  polygon edge are OUTSIDE (poly_ops.rs:27; unit test at :207).
- shoelace polygon area: whitebox-common/src/algorithms/poly_area.rs:12-24.
- sequential shell-then-hole record scan of the clip semantics:
  whitebox-tools-app/src/tools/lidar_analysis/clip_lidar_to_polygon.rs:274-317.

All kernels are batch-over-points (one numpy pass per polygon ring), for
use inside mapInPandas / pandas UDFs. IEEE-754 double ops in the same
expression order as the Rust reference give identical results.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "winding_number",
    "points_in_polygon",
    "points_in_feature",
    "shoelace_area",
    "is_clockwise",
    "ring_is_hole",
]


_WN_CHUNK = 16384  # keep (chunk x edges) temporaries L2-resident


def winding_number(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd winding number of each point w.r.t. one closed ring.

    ring: (M, 2) float64 with ring[0] == ring[-1] (closed).
    Returns int32 winding numbers; inside iff wn % 2 != 0.
    Parity: poly_ops.rs:42-72 — upward crossing needs strictly-left
    (is_left > 0), downward crossing strictly-right (is_left < 0), so
    boundary points accumulate wn == 0 (outside).

    Points are processed in cache-sized chunks: the naive vectorization
    allocates (n_points, n_edges) f64 temporaries, which saturates DRAM
    bandwidth when 32 executor threads run the kernel concurrently
    (observed 3.4x CPU inflation at local[32]); chunking keeps every
    temporary L2-resident and restores thread scaling. The arithmetic
    (expression order, comparisons) is unchanged — results are
    bit-identical to the unchunked form.
    """
    x0 = ring[:-1, 0][None, :]
    y0 = ring[:-1, 1][None, :]
    x1 = ring[1:, 0][None, :]
    y1 = ring[1:, 1][None, :]
    pxa = np.ascontiguousarray(px, dtype=np.float64)
    pya = np.ascontiguousarray(py, dtype=np.float64)
    n = len(pxa)
    out = np.empty(n, dtype=np.int32)
    for s in range(0, n, _WN_CHUNK):
        e = min(s + _WN_CHUNK, n)
        pxc = pxa[s:e, None]
        pyc = pya[s:e, None]
        # is_left(p0, p1, p) = (p1.x-p0.x)*(p.y-p0.y) - (p.x-p0.x)*(p1.y-p0.y)
        is_left = (x1 - x0) * (pyc - y0) - (pxc - x0) * (y1 - y0)
        up = (y0 <= pyc) & (y1 > pyc) & (is_left > 0.0)
        down = (y0 > pyc) & (y1 <= pyc) & (is_left < 0.0)
        out[s:e] = up.sum(axis=1) - down.sum(axis=1)
    return out


def points_in_polygon(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Boolean inside-mask for one ring (even-odd, boundary outside)."""
    return winding_number(px, py, ring) % 2 != 0


def points_in_feature(
    px: np.ndarray,
    py: np.ndarray,
    shells: list[np.ndarray],
    holes: list[np.ndarray],
    bbox: tuple[float, float, float, float] | None = None,
    state: np.ndarray | None = None,
) -> np.ndarray:
    """One record of the WBT clip scan, applied to a point batch.

    Mirrors clip_lidar_to_polygon.rs:274-317 for a single record: points
    inside any shell ring set their verdict True, then points inside any
    hole ring override to False. `state` carries the verdict across
    records (the reference's per-point `point_in_poly` variable persists
    over the sequential record loop — a later record's hole can override
    an earlier record's shell).
    """
    n = len(px)
    verdict = np.zeros(n, dtype=bool) if state is None else state
    if bbox is not None:
        xmin, ymin, xmax, ymax = bbox
        # is_point_in_box (bounding_box.rs:217): strict interior test
        in_box = (px > xmin) & (px < xmax) & (py > ymin) & (py < ymax)
    else:
        in_box = np.ones(n, dtype=bool)
    if not in_box.any():
        return verdict
    idx = np.nonzero(in_box)[0]
    sx, sy = px[idx], py[idx]
    in_shell = np.zeros(len(idx), dtype=bool)
    for ring in shells:
        in_shell |= points_in_polygon(sx, sy, ring)
    verdict[idx[in_shell]] = True
    in_hole = np.zeros(len(idx), dtype=bool)
    for ring in holes:
        in_hole |= points_in_polygon(sx, sy, ring)
    verdict[idx[in_hole]] = False
    return verdict


def shoelace_area(ring: np.ndarray) -> float:
    """Signed polygon area, summed in vertex order (poly_area.rs:12-24).

    Sequential accumulation order matches the reference loop so the f64
    result is bit-identical.
    """
    x = ring[:, 0]
    y = ring[:, 1]
    n = len(ring)
    total = 0.0
    for i in range(n - 1):
        total += x[i] * y[i + 1] - x[i + 1] * y[i]
    return total / 2.0


def is_clockwise(ring: np.ndarray) -> bool:
    """Paul Bourke orientation test (is_clockwise_order.rs:4 semantics):
    negative signed area => clockwise."""
    return shoelace_area(ring) < 0.0


def ring_is_hole(ring: np.ndarray) -> bool:
    """WBT convention: holes are counter-clockwise rings
    (shapefile geometry.rs:307-345)."""
    return not is_clockwise(ring)


def thin_mask(m: "np.ndarray") -> "np.ndarray":
    """Zhang-Suen skeletonization of a boolean mask (numpy twin of
    operators.focal.line_thinning's SQL plan — same two sub-iterations,
    used by per-patch kernels that already hold the patch locally).

    Out-of-grid neighbours are absent (zero), matching the SQL plan: the
    mask is padded with a 1-pixel zero ring internally so the np.roll
    neighbour shifts never wrap toroidally across opposite borders."""
    import numpy as np

    orig_shape = m.shape
    m = np.pad(m.astype(bool), 1, mode="constant", constant_values=False)
    def nbrs(a):
        # P2..P9 = N, NE, E, SE, S, SW, W, NW
        shifts = [(-1, 0), (-1, 1), (0, 1), (1, 1),
                  (1, 0), (1, -1), (0, -1), (-1, -1)]
        out = []
        for dr, dc in shifts:
            out.append(np.roll(np.roll(a, -dr, axis=0), -dc, axis=1))
        return out

    changed = True
    while changed:
        changed = False
        for phase in (0, 1):
            p = [x.astype(np.int8) for x in nbrs(m)]
            bsum = sum(p)
            trans = sum(((p[i] == 0) & (p[(i + 1) % 8] == 1)).astype(np.int8)
                        for i in range(8))
            if phase == 0:
                c1 = (p[0] * p[2] * p[4]) == 0
                c2 = (p[2] * p[4] * p[6]) == 0
            else:
                c1 = (p[0] * p[2] * p[6]) == 0
                c2 = (p[0] * p[4] * p[6]) == 0
            rem = m & (bsum >= 2) & (bsum <= 6) & (trans == 1) & c1 & c2
            if rem.any():
                m[rem] = False
                changed = True
    assert m.shape == (orig_shape[0] + 2, orig_shape[1] + 2)
    return m[1:-1, 1:-1]
