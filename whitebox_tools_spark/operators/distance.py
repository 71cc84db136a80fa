"""Distance-transform operators — separable two-pass exact EDT.

Reference anchors:
- EuclideanDistance / EuclideanAllocation (Shih & Wu two-scan transform):
  gis_analysis/euclidean_distance.rs:23-33, euclidean_allocation.rs
- BufferRaster (distance threshold): gis_analysis/buffer_raster.rs

Spark plan (round 2 — replaces the 1-NN shell-expansion join, which
spent one full join + count per expansion round and degraded badly on
sparse-target grids): the exact Euclidean distance transform is
SEPARABLE (Felzenszwalb & Huttenlocher 2012, "Distance Transforms of
Sampled Functions"):

  pass 1 — per COLUMN: nearest target ROW for every row of the column
           (vectorized searchsorted over the sorted target rows);
  pass 2 — per ROW: lower envelope of one parabola per column,
           d2(c) = min over c' of (dy2[c'] + (c - c')^2).

Each pass is one groupBy + applyInPandas over the raster — two shuffles
total, no iteration, no driver collect. Work is O(n) (envelope) or
O(rows * cols^2 / chunk) vectorized (brute path for narrow grids), and
every column/row strip is independent, so the plan scales linearly with
executors at any raster width.

Tie-break parity: the oracle orders candidates by (dist2, tid) with
tid = trow * columns + tcol and dist2 from float cell-center
coordinates. Pass 2 minimizes the integer key

    K(c') = M * (dy2 + dc^2) + tid,   M = rows * columns

which is exactly lexicographic (d2_index, tid) — int64-exact, no float
ambiguity. On isotropic grids (resolution_x == resolution_y) with
exactly-representable cell centers (the reference's own fixtures) the
index-space order equals the float map-space order bit-for-bit; for
anisotropic grids the operators fall back to the exact 1-NN grid join,
whose float ordering matches the oracle on any metadata.

The returned VALUE is always computed by the same float expression the
oracle uses (center coords -> dist2 -> SQRT), so values are bit-stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..functions.raster_math import GridMeta
from .knn import knn_join_exact, wbt_default_radius

_BRUTE_MAX_COLS = 2048  # vectorized O(W^2/chunk) beats the Python envelope here


def _phase1_nearest_row(targets: DataFrame, meta: GridMeta) -> DataFrame:
    """Per column: (row, col, trow) for every row 0..rows-1 of each
    column holding >= 1 target; trow = target row minimizing
    (|row - trow|, trow)."""
    rows = meta.rows
    schema = StructType([
        StructField("row", LongType(), False),
        StructField("col", LongType(), False),
        StructField("trow", LongType(), False),
    ])

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        col = int(key[0])
        tr = np.unique(pdf["row"].to_numpy(dtype=np.int64))
        r = np.arange(rows, dtype=np.int64)
        idx = np.searchsorted(tr, r)
        lo = tr[np.clip(idx - 1, 0, len(tr) - 1)]   # nearest at or below
        hi = tr[np.clip(idx, 0, len(tr) - 1)]       # nearest at or above
        # tie (equal |dr|) -> smaller trow (= smaller tid within the column)
        pick_lo = (idx == len(tr)) | ((idx > 0) & (np.abs(r - lo) <= np.abs(hi - r)))
        nr = np.where(pick_lo, lo, hi)
        return pd.DataFrame({"row": r, "col": np.full(rows, col, dtype=np.int64),
                             "trow": nr})

    return targets.select("row", "col").groupBy("col").applyInPandas(kernel, schema)


def _phase2_argmin(phase1: DataFrame, meta: GridMeta,
                   brute_max_cols: int = _BRUTE_MAX_COLS) -> DataFrame:
    """Per row: full-width argmin over the per-column parabolas.
    Output (row, col, trow, tcol) for every cell, minimizing
    K = M*(dy^2 + dc^2) + tid (lexicographic (d2, tid))."""
    rows, cols = meta.rows, meta.columns
    m = rows * cols
    schema = StructType([
        StructField("row", LongType(), False),
        StructField("col", LongType(), False),
        StructField("trow", LongType(), False),
        StructField("tcol", LongType(), False),
    ])

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        r = int(key[0])
        cp = pdf["col"].to_numpy(dtype=np.int64)     # columns with targets
        nr = pdf["trow"].to_numpy(dtype=np.int64)
        order = np.argsort(cp)
        cp, nr = cp[order], nr[order]
        dy2 = (nr - r) ** 2
        tid = nr * cols + cp
        const = m * dy2 + tid                        # parabola offset, int64
        out_c = np.arange(cols, dtype=np.int64)
        if cols <= brute_max_cols:
            best_j = np.zeros(cols, dtype=np.int64)
            best_k = np.full(cols, np.iinfo(np.int64).max, dtype=np.int64)
            chunk = max(1, (1 << 21) // max(len(cp), 1))
            for s in range(0, cols, chunk):
                cc = out_c[s:s + chunk]
                k = m * (cc[None, :] - cp[:, None]) ** 2 + const[:, None]
                j = np.argmin(k, axis=0)
                best_j[s:s + chunk] = j
                best_k[s:s + chunk] = k[j, np.arange(len(cc))]
            jstar = best_j
        else:
            # exact integer lower envelope (FH with rational intersections
            # compared in exact Python ints — no float boundary ambiguity)
            v = [0]                                   # indices of envelope parabolas
            # intersection abscissa of parabolas j, k (cp[j] < cp[k]) as a
            # rational A/B with B > 0: c >= A/B  <=>  c*B >= A
            zn = [None]                               # numerators   (z[0] = -inf)
            zd = [None]                               # denominators
            for j in range(1, len(cp)):
                while True:
                    k0 = v[-1]
                    a = (int(const[j]) + m * int(cp[j]) ** 2) \
                        - (int(const[k0]) + m * int(cp[k0]) ** 2)
                    b = 2 * m * (int(cp[j]) - int(cp[k0]))
                    if len(v) > 1 and a * zd[-1] <= zn[-1] * b:
                        v.pop(); zn.pop(); zd.pop()
                        continue
                    break
                v.append(j); zn.append(a); zd.append(b)
            jstar = np.empty(cols, dtype=np.int64)
            ptr = 0
            for c in range(cols):
                while ptr + 1 < len(v) and c * zd[ptr + 1] >= zn[ptr + 1]:
                    ptr += 1
                jstar[c] = v[ptr]
        return pd.DataFrame({
            "row": np.full(cols, r, dtype=np.int64),
            "col": out_c,
            "trow": nr[jstar],
            "tcol": cp[jstar],
        })

    return phase1.groupBy("row").applyInPandas(kernel, schema)


def _nearest_target_edt(cells: DataFrame, meta: GridMeta, target_pred: str) -> DataFrame:
    """(row, col, trow, tcol, target_value, dist2) — exact nearest target
    by (d2, tid) via the two-pass EDT; dist2 evaluated with the oracle's
    float center expressions."""
    targets = cells.where(F.expr(target_pred))
    edt = _phase2_argmin(_phase1_nearest_row(targets, meta), meta)
    tv = targets.selectExpr("row AS trow", "col AS tcol", "value AS target_value")
    qx = meta.x_center_expr("col")
    qy = meta.y_center_expr("row")
    tx = meta.x_center_expr("tcol")
    ty = meta.y_center_expr("trow")
    return edt.join(tv, ["trow", "tcol"], "inner").selectExpr(
        "row", "col", "trow", "tcol", "target_value",
        f"(({qx}) - ({tx})) * (({qx}) - ({tx})) "
        f"+ (({qy}) - ({ty})) * (({qy}) - ({ty})) AS dist2",
    )


def _nearest_target_knn(cells: DataFrame, meta: GridMeta, target_pred: str,
                        radius: float | None = None) -> DataFrame:
    """Anisotropic-grid fallback: exact 1-NN grid join (float ordering,
    matches the oracle on any metadata)."""
    def centers(df: DataFrame, id_col: str) -> DataFrame:
        return df.selectExpr(
            f"(row * {meta.columns}L + col) AS {id_col}",
            "row", "col",
            f"{meta.x_center_expr('col')} AS x",
            f"{meta.y_center_expr('row')} AS y",
            "value",
        )

    q = centers(cells, "cell_idx")
    t = centers(cells.where(F.expr(target_pred)), "target_idx")
    if radius is None:
        n_t = max(t.count(), 1)
        area = (meta.east - meta.west) * (meta.north - meta.south)
        radius = wbt_default_radius(area, n_t)
    # target_value rides the join as carry payload and row/col re-derive
    # from cell_idx = row*columns + col — no re-attach joins
    nn = knn_join_exact(
        q.select("cell_idx", "x", "y"),
        t.selectExpr("target_idx", "x", "y", "value AS target_value"),
        k=1, radius=radius, qid="cell_idx", tid="target_idx",
        carry=("target_value",),
    )
    return nn.selectExpr(
        f"cell_idx DIV {meta.columns}L AS row",
        f"cell_idx % {meta.columns}L AS col",
        "target_value", "dist2",
    )


def _nearest_target(cells: DataFrame, meta: GridMeta, target_pred: str,
                    radius: float | None = None) -> DataFrame:
    if meta.resolution_x == meta.resolution_y:
        return _nearest_target_edt(cells, meta, target_pred)
    return _nearest_target_knn(cells, meta, target_pred, radius)


def euclidean_distance(cells: DataFrame, meta: GridMeta,
                       target_pred: str = "value <> 0.0",
                       radius: float | None = None) -> DataFrame:
    """Map-unit distance from every cell to the nearest target cell
    (EuclideanDistance semantics; targets = cells matching target_pred,
    their own distance is 0)."""
    nn = _nearest_target(cells, meta, target_pred, radius)
    return nn.selectExpr("row", "col", "SQRT(dist2) AS value")


def euclidean_allocation(cells: DataFrame, meta: GridMeta,
                         target_pred: str = "value <> 0.0",
                         radius: float | None = None) -> DataFrame:
    """Value of the nearest target cell (EuclideanAllocation); ties
    resolve by (dist2, target linear index) — deterministic."""
    nn = _nearest_target(cells, meta, target_pred, radius)
    return nn.selectExpr("row", "col", "target_value AS value")


def buffer_raster(cells: DataFrame, meta: GridMeta, size: float,
                  target_pred: str = "value <> 0.0",
                  radius: float | None = None) -> DataFrame:
    """BufferRaster: 1.0 within `size` map units of a target, else 0.0."""
    nn = _nearest_target(cells, meta, target_pred, radius)
    return nn.selectExpr(
        "row", "col",
        f"CAST(CASE WHEN SQRT(dist2) <= {size!r} THEN 1.0 ELSE 0.0 END AS DOUBLE) AS value",
    )
