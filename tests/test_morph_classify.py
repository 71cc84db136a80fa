"""Morphology utilities + k-means: crafted-image parity."""

import numpy as np

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators import focal as FO
from whitebox_tools_spark.operators import raster as R
from whitebox_tools_spark.operators.classify import k_means

META = GridMeta(rows=12, columns=12, north=120.0, south=0.0, east=120.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)


def _img(spark, arr):
    n, m = arr.shape
    rows = [(int(r), int(c), float(arr[r, c])) for r in range(n) for c in range(m)]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _grid(df, n, m):
    out = np.zeros((n, m))
    for r in df.collect():
        if 0 <= r["row"] < n and 0 <= r["col"] < m:
            out[int(r["row"]), int(r["col"])] = r["value"]
    return out


def test_corner_detection_square(spark):
    a = np.zeros((10, 10))
    a[3:7, 3:7] = 1.0  # filled square: its 4 corners match the templates
    got = _grid(FO.corner_detection(_img(spark, a)), 10, 10)
    assert got[3, 3] == 1 and got[3, 6] == 1 and got[6, 3] == 1 and got[6, 6] == 1
    # edge (non-corner) cells do not match
    assert got[3, 4] == 0 and got[5, 3] == 0
    # interior cells do not match
    assert got[4, 4] == 0


def test_remove_spurs_prunes_tail(spark):
    a = np.zeros((10, 10))
    a[5, 2:8] = 1.0       # horizontal line
    a[3, 5] = 1.0         # an isolated-endpoint spur above the line
    got = _grid(FO.remove_spurs(_img(spark, a), iterations=2), 10, 10)
    assert got[3, 5] == 0                     # spur endpoint pruned
    # the line's free ends erode one cell per round...
    assert got[5, 2] == 0 and got[5, 3] == 0
    # ...but the interior survives
    assert got[5, 4] == 1 and got[5, 5] == 1


def test_thicken_line_breaks_diagonal(spark):
    a = np.zeros((8, 8))
    for i in range(1, 7):
        a[i, i] = 1.0  # pure diagonal line
    got = _grid(FO.thicken_line(_img(spark, a)), 8, 8)
    # every diagonal step now has a rook connection
    for i in range(1, 6):
        assert got[i, i + 1] == 1 or got[i + 1, i] == 1
    assert got[3, 3] == 1  # original cells kept


def test_line_thinning_skeleton(spark):
    a = np.zeros((10, 12))
    a[4:7, 2:10] = 1.0  # 3-cell-thick bar
    got = _grid(FO.line_thinning(_img(spark, a), max_iters=8), 10, 12)
    # thinned to (at most) a 1-cell-thick skeleton: no 2x2 block remains
    for r in range(9):
        for c in range(11):
            assert got[r:r + 2, c:c + 2].sum() < 4
    assert got.sum() > 0  # something survives


def test_kmeans_separates_two_blobs(spark):
    rng = np.random.RandomState(9)
    n = 200
    b1 = np.concatenate([rng.normal(10, 1, n), rng.normal(100, 1, n)])
    b2 = np.concatenate([rng.normal(10, 1, n), rng.normal(100, 1, n)])
    rows = [(i // 20, i % 20, float(b1[i]), float(b2[i])) for i in range(2 * n)]
    df = spark.createDataFrame(rows, "row long, col long, b1 double, b2 double")
    out = k_means(df, ["b1", "b2"], k=2, max_iters=15).collect()
    lab = {(r["row"], r["col"]): r["cluster"] for r in out}
    g1 = {lab[(i // 20, i % 20)] for i in range(n)}
    g2 = {lab[(i // 20, i % 20)] for i in range(n, 2 * n)}
    assert len(g1) == 1 and len(g2) == 1 and g1 != g2
    # deterministic: re-run gives identical labels
    out2 = k_means(df, ["b1", "b2"], k=2, max_iters=15).collect()
    lab2 = {(r["row"], r["col"]): r["cluster"] for r in out2}
    assert lab == lab2


def test_mosaic_feathering_blends(spark):
    a = np.full((12, 12), 10.0)
    b = np.full((12, 12), 30.0)
    da = _img(spark, a).where("col < 8")
    db = _img(spark, b).where("col >= 4")
    out = {(r["row"], r["col"]): r["value"]
           for r in R.mosaic_with_feathering(da, db, META, power=4.0).collect()}
    assert out[(5, 1)] == 10.0          # a-only region
    assert out[(5, 11)] == 30.0         # b-only region
    mid = out[(5, 5)]
    assert 10.0 < mid < 30.0            # blended in the overlap
    # weight shifts toward b as we approach b's interior
    assert out[(5, 4)] <= out[(5, 5)] <= out[(5, 6)] <= out[(5, 7)]
