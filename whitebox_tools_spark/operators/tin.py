"""TIN gridding — Delaunay-based interpolation (M5 family).

Reference anchors:
- TINGridding / LidarTINGridding: gis_analysis/tin_gridding.rs,
  lidar_analysis/lidar_tin_gridding.rs
- Delaunay kernel: whitebox-common/src/algorithms/delaunay_triangulation.rs:510
- ConstructVectorTIN: gis_analysis/construct_vector_tin.rs

Spark plan (SURVEY §2.3 "per-tile Delaunay with halo points"): points
scatter to their tile plus every tile whose halo reaches them; one
applyInPandas kernel per tile triangulates its local point set
(Bowyer-Watson, pure numpy — no scipy in this container) and
barycentric-interpolates the tile's own cell centers. With a halo of a
few mean point spacings, local triangles near the tile interior match
the global triangulation almost everywhere; the exact-parity contract
for TIN is property-based (a TIN reproduces any LINEAR surface exactly,
regardless of triangulation choice), not bit-based.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..functions.raster_math import GridMeta


def _circumcircle(P: np.ndarray, a: int, b: int, c: int) -> tuple[float, float, float]:
    ax, ay = P[a]
    bx, by = P[b]
    cx, cy = P[c]
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return (0.0, 0.0, np.inf)  # degenerate: always invalidated
    a2, b2, c2 = ax * ax + ay * ay, bx * bx + by * by, cx * cx + cy * cy
    ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
    uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
    return (ux, uy, (ax - ux) ** 2 + (ay - uy) ** 2)


def delaunay(pts: np.ndarray) -> np.ndarray:
    """Bowyer-Watson incremental Delaunay with vectorized circumcircle
    tests (cached centers/radii). pts: (n, 2) float64. Returns (m, 3)
    int32 triangle vertex indices — sized for per-tile point counts."""
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=np.int32)
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    r = max(np.abs(pts - [cx, cy]).max(), 1.0) * 16.0
    sup = np.array([[cx - 2 * r, cy - r], [cx + 2 * r, cy - r], [cx, cy + 2 * r]])
    P = np.vstack([pts, sup])

    cap = 8 * n + 16
    tri = np.empty((cap, 3), dtype=np.int32)
    cc = np.empty((cap, 3), dtype=np.float64)  # (ux, uy, r2)
    alive = np.zeros(cap, dtype=bool)
    tri[0] = (n, n + 1, n + 2)
    cc[0] = _circumcircle(P, n, n + 1, n + 2)
    alive[0] = True
    m = 1  # high-water mark

    for i in range(n):
        px, py = P[i]
        dx = cc[:m, 0] - px
        dy = cc[:m, 1] - py
        bad = alive[:m] & (dx * dx + dy * dy < cc[:m, 2])
        bad_idx = np.nonzero(bad)[0]
        if len(bad_idx) == 0:
            continue  # duplicate/degenerate point: skip
        edge_count: dict[tuple[int, int], int] = {}
        for ti in bad_idx:
            t0, t1, t2 = tri[ti]
            for u, v in ((t0, t1), (t1, t2), (t2, t0)):
                k = (u, v) if u < v else (v, u)
                edge_count[k] = edge_count.get(k, 0) + 1
        alive[bad_idx] = False
        free = list(bad_idx)  # reuse dead slots first
        for (u, v), cnt in edge_count.items():
            if cnt != 1:
                continue
            slot = free.pop() if free else m
            if slot == m:
                if m >= cap:
                    cap *= 2
                    tri = np.resize(tri, (cap, 3))
                    cc = np.resize(cc, (cap, 3))
                    alive = np.resize(alive, cap)
                    alive[m:] = False
                m += 1
            tri[slot] = (u, v, i)
            cc[slot] = _circumcircle(P, u, v, i)
            alive[slot] = True

    keep = alive[:m] & (tri[:m].max(axis=1) < n)
    return tri[:m][keep].copy()


def interpolate_tin(pts: np.ndarray, z: np.ndarray, tris: np.ndarray,
                    qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
    """Barycentric interpolation; NaN outside the triangulation."""
    out = np.full(len(qx), np.nan)
    if len(tris) == 0:
        return out
    todo = np.ones(len(qx), dtype=bool)
    for t in tris:
        if not todo.any():
            break
        a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
        det = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if det == 0:
            continue
        idx = np.nonzero(todo)[0]
        l1 = ((b[1] - c[1]) * (qx[idx] - c[0]) + (c[0] - b[0]) * (qy[idx] - c[1])) / det
        l2 = ((c[1] - a[1]) * (qx[idx] - c[0]) + (a[0] - c[0]) * (qy[idx] - c[1])) / det
        l3 = 1.0 - l1 - l2
        eps = -1e-12
        inside = (l1 >= eps) & (l2 >= eps) & (l3 >= eps)
        hit = idx[inside]
        out[hit] = (l1[inside] * z[t[0]] + l2[inside] * z[t[1]] + l3[inside] * z[t[2]])
        todo[hit] = False
    return out


def tin_gridding(points: DataFrame, meta: GridMeta, tile: int = 32,
                 halo: float | None = None,
                 value_col: str = "value") -> DataFrame:
    """Grid cell values by TIN interpolation over the point layer.
    Output: (row, col, value) for cells inside the (local) hull."""
    if halo is None:
        n = max(points.count(), 1)
        area = (meta.east - meta.west) * (meta.north - meta.south)
        halo = 4.0 * (area / n) ** 0.5
    tw_x = tile * meta.resolution_x
    tw_y = tile * meta.resolution_y
    n_tx = -(-meta.columns // tile)
    n_ty = -(-meta.rows // tile)
    # a point reaches every tile whose halo-expanded box contains it
    pts = points.selectExpr(f"x", "y", f"{value_col} AS z").selectExpr(
        "x", "y", "z",
        f"CAST(FLOOR((x - {meta.west!r} - {halo!r}) / {tw_x!r}) AS INT) AS tx0",
        f"CAST(FLOOR((x - {meta.west!r} + {halo!r}) / {tw_x!r}) AS INT) AS tx1",
        f"CAST(FLOOR(({meta.north!r} - y - {halo!r}) / {tw_y!r}) AS INT) AS ty0",
        f"CAST(FLOOR(({meta.north!r} - y + {halo!r}) / {tw_y!r}) AS INT) AS ty1",
    )
    scattered = pts.selectExpr(
        "x", "y", "z",
        f"EXPLODE(FILTER(FLATTEN(TRANSFORM(SEQUENCE(tx0, tx1), tx -> "
        f"TRANSFORM(SEQUENCE(ty0, ty1), ty -> STRUCT(tx, ty)))), "
        f"t -> t.tx >= 0 AND t.tx < {n_tx} AND t.ty >= 0 AND t.ty < {n_ty})) AS t",
    ).selectExpr("t.tx AS tx", "t.ty AS ty", "x", "y", "z")

    schema = StructType([
        StructField("row", LongType(), False),
        StructField("col", LongType(), False),
        StructField("value", DoubleType(), False),
    ])
    west, north = meta.west, meta.north
    resx, resy = meta.resolution_x, meta.resolution_y
    rows_total, cols_total = meta.rows, meta.columns

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        P = pdf[["x", "y"]].to_numpy(dtype=np.float64)
        Z = pdf["z"].to_numpy(dtype=np.float64)
        tris = delaunay(P)
        r0, r1 = ty * tile, min((ty + 1) * tile, rows_total)
        c0, c1 = tx * tile, min((tx + 1) * tile, cols_total)
        rr, cc = np.meshgrid(np.arange(r0, r1), np.arange(c0, c1), indexing="ij")
        qx = west + (cc.ravel() + 0.5) * resx
        qy = north - (rr.ravel() + 0.5) * resy
        vals = interpolate_tin(P, Z, tris, qx, qy)
        ok = ~np.isnan(vals)
        return pd.DataFrame({
            "row": rr.ravel()[ok], "col": cc.ravel()[ok], "value": vals[ok],
        })

    return scattered.groupBy("tx", "ty").applyInPandas(kernel, schema=schema)
