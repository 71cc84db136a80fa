"""Round-2 continuation focal filters: numpy reference parity."""

import math
import numpy as np

from whitebox_tools_spark.operators import focal as FO


def _cells(spark, seed=21, n=20):
    rng = np.random.RandomState(seed)
    vals = rng.randint(0, 100, size=(n, n)).astype(float)
    rows = [(int(r), int(c), float(vals[r, c]))
            for r in range(n) for c in range(n)]
    return spark.createDataFrame(rows, "row long, col long, value double"), vals


def _grid(df, n=20):
    out = np.full((n, n), np.nan)
    for r in df.collect():
        if 0 <= r["row"] < n and 0 <= r["col"] < n:
            out[int(r["row"]), int(r["col"])] = r["value"]
    return out


def _win(vals, r, c, rad=1):
    n = vals.shape[0]
    return vals[max(0, r - rad):min(n, r + rad + 1),
                max(0, c - rad):min(n, c + rad + 1)].ravel()


def test_stdev_filter(spark):
    df, vals = _cells(spark)
    got = _grid(FO.stdev_filter(df))
    for r, c in [(0, 0), (5, 7), (19, 19), (10, 0)]:
        w = _win(vals, r, c)
        exp = np.sqrt(((w * w).sum() - w.sum() ** 2 / len(w)) / len(w))
        assert abs(got[r, c] - exp) < 1e-9


def test_highpass_and_median(spark):
    df, vals = _cells(spark, seed=22)
    hp = _grid(FO.highpass_filter(df))
    hm = _grid(FO.highpass_median_filter(df))
    for r, c in [(3, 3), (0, 5), (19, 0)]:
        w = _win(vals, r, c)
        assert abs(hp[r, c] - (vals[r, c] - w.mean())) < 1e-9
        med = np.sort(w)[(len(w) + 1) // 2 - 1]  # lower median
        assert abs(hm[r, c] - (vals[r, c] - med)) < 1e-9


def test_adaptive_filter(spark):
    df, vals = _cells(spark, seed=23)
    got = _grid(FO.adaptive_filter(df, threshold=1.0))
    for r, c in [(4, 4), (9, 2), (0, 0)]:
        w = _win(vals, r, c)
        v = ((w * w).sum() - w.sum() ** 2 / len(w)) / len(w)
        z = vals[r, c]
        exp = w.mean() if v > 0 and abs((z - w.mean()) / np.sqrt(v)) > 1.0 else z
        assert abs(got[r, c] - exp) < 1e-9


def test_lee_filter(spark):
    df, vals = _cells(spark, seed=24)
    got = _grid(FO.lee_filter(df, sigma=20.0, m=5.0))
    for r, c in [(5, 5), (10, 10)]:
        z = vals[r, c]
        w = _win(vals, r, c)
        sel = w[(w >= z - 20.0) & (w <= z + 20.0)]
        if len(sel) > 5:
            exp = sel.mean()
        else:
            ring = [vals[r + dr, c + dc] for dr in (-1, 0, 1) for dc in (-1, 0, 1)
                    if not (dr == 0 and dc == 0)]
            exp = np.mean(ring)
        assert abs(got[r, c] - exp) < 1e-9


def test_knearest_mean(spark):
    df, vals = _cells(spark, seed=25)
    got = _grid(FO.k_nearest_mean_filter(df, k=5))
    r, c = 8, 8
    z = vals[r, c]
    w = np.sort(_win(vals, r, c))
    order = sorted(w, key=lambda v: ((v - z) ** 2, v))
    exp = np.mean(order[:5])
    assert abs(got[r, c] - exp) < 1e-9


def test_roberts_cross(spark):
    df, vals = _cells(spark, seed=26)
    got = _grid(FO.roberts_cross_filter(df))
    r, c = 5, 6
    exp = abs(vals[r, c] - vals[r + 1, c + 1]) + abs(vals[r, c + 1] - vals[r + 1, c])
    assert abs(got[r, c] - exp) < 1e-9


def test_fast_almost_gaussian_matches_box_passes(spark):
    df, vals = _cells(spark, seed=27)
    got = _grid(FO.fast_almost_gaussian_filter(df, sigma=1.8))
    widths = [w for w in FO.fag_box_widths(1.8) if w > 1]
    cur = vals.copy()
    for w in widths:
        r = w // 2
        n = cur.shape[0]
        nxt = np.full_like(cur, np.nan)
        for i in range(n):
            for j in range(n):
                if i - r < 0 or j - r < 0 or i + r >= n or j + r >= n:
                    continue
                win = cur[i - r:i + r + 1, j - r:j + r + 1]
                if np.isnan(win).any():
                    continue
                nxt[i, j] = win.sum()
        cur = nxt
    denom = float(np.prod([w * w for w in widths]))
    exp = cur / denom
    mask = ~np.isnan(exp)
    assert np.isnan(got[~mask]).all()
    assert np.allclose(got[mask], exp[mask])


def test_line_detection_45(spark):
    df, vals = _cells(spark, seed=28)
    got = _grid(FO.line_detection_filter(df, variant="45", absvals=True))
    k = np.array(FO.LINE_DETECTION["45"])
    r, c = 7, 9
    exp = abs((vals[r - 1:r + 2, c - 1:c + 2] * k).sum())
    assert abs(got[r, c] - exp) < 1e-9


def _jenness_sar(vals, resx=10.0, resy=10.0):
    """Numpy transcription of surface_area_ratio.rs:227-330 (Jenness
    facets): out-of-grid neighbors are nodata -> zero-length half edges
    and an eighth-cell planar deficit per missing facet."""
    n = vals.shape[0]
    diag = math.hypot(resx, resy)
    dist_pairs = [(0, 1), (1, 2), (3, 4), (4, 5), (6, 7), (7, 8),
                  (0, 3), (1, 4), (2, 5), (3, 6), (4, 7), (5, 8),
                  (4, 0), (4, 2), (4, 6), (4, 8)]
    dist_planar = [resx] * 6 + [resy] * 6 + [diag] * 4
    tri = [(0, 7, 12), (1, 7, 13), (2, 6, 12), (3, 8, 13),
           (2, 9, 14), (3, 11, 15), (4, 10, 14), (5, 10, 15)]
    cell_area = resx * resy
    out = np.full((n, n), np.nan)
    for r in range(n):
        for c in range(n):
            z = []
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    rr, cc = r + dr, c + dc
                    z.append(vals[rr, cc] if 0 <= rr < n and 0 <= cc < n
                             else None)
            d = []
            for k, (i, j) in enumerate(dist_pairs):
                if z[i] is not None and z[j] is not None:
                    d.append(math.sqrt(dist_planar[k] ** 2
                                       + (z[i] - z[j]) ** 2) / 2.0)
                else:
                    d.append(0.0)
            area, deficit = 0.0, 0.0
            for (a, b, c3) in tri:
                p, q, rr2 = d[a], d[b], d[c3]
                if p * q * rr2 != 0.0:
                    s = (p + q + rr2) / 2.0
                    area += math.sqrt(max(0.0, s * (s - p) * (s - q) * (s - rr2)))
                else:
                    deficit += cell_area / 8.0
            adj = cell_area - deficit
            if adj > 0.0:
                out[r, c] = area / adj
    return out


def test_surface_area_ratio(spark):
    import math as _m  # noqa: F401
    from whitebox_tools_spark.functions.raster_math import GridMeta
    df, vals = _cells(spark, seed=31)
    meta = GridMeta(rows=20, columns=20, north=200.0, south=0.0, east=200.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    got = _grid(FO.surface_area_ratio(df, meta))
    exp = _jenness_sar(vals)
    assert np.allclose(got, exp, atol=1e-9, equal_nan=True)
    # flat terrain -> ratio exactly 1 on interior cells
    flat = spark.createDataFrame(
        [(r, c, 5.0) for r in range(6) for c in range(6)],
        "row long, col long, value double")
    fmeta = GridMeta(rows=6, columns=6, north=60.0, south=0.0, east=60.0,
                     west=0.0, resolution_x=10.0, resolution_y=10.0)
    fgrid = _grid(FO.surface_area_ratio(flat, fmeta), n=6)
    assert np.allclose(fgrid[1:-1, 1:-1], 1.0, atol=1e-12)


def test_stdev_of_slope(spark):
    from whitebox_tools_spark.functions.raster_math import GridMeta
    df, vals = _cells(spark, seed=32)
    meta = GridMeta(rows=20, columns=20, north=200.0, south=0.0, east=200.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    sl = _grid(FO.slope(df, meta, units="degrees"))
    got = _grid(FO.standard_deviation_of_slope(df, meta))
    for r, c in [(0, 0), (5, 7), (19, 19), (10, 0), (3, 14)]:
        w = _win(sl, r, c)
        w = w[~np.isnan(w)]
        exp = np.sqrt(max(0.0, ((w * w).sum() - w.sum() ** 2 / len(w)) / len(w)))
        assert abs(got[r, c] - exp) < 1e-9
