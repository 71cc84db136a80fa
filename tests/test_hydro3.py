"""Round-2 continuation hydro utilities: numpy reference parity."""

import numpy as np

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators import hydro as HY

META = GridMeta(rows=12, columns=12, north=120.0, south=0.0, east=120.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)


def _dem(spark, seed=5, n=12):
    rng = np.random.RandomState(seed)
    vals = (rng.randint(0, 50, size=(n, n)) + np.arange(n)[:, None] * 2).astype(float)
    rows = [(int(r), int(c), float(vals[r, c])) for r in range(n) for c in range(n)]
    return spark.createDataFrame(rows, "row long, col long, value double"), vals


def _grid(df, n=12):
    out = np.full((n, n), np.nan)
    for r in df.collect():
        out[int(r["row"]), int(r["col"])] = r["value"]
    return out


def test_fill_pits_numpy(spark):
    df, vals = _dem(spark)
    got = _grid(HY.fill_pits(df, META))
    n = vals.shape[0]
    for r in range(n):
        for c in range(n):
            nbrs = [vals[r + dr, c + dc]
                    for dr in (-1, 0, 1) for dc in (-1, 0, 1)
                    if not (dr == 0 and dc == 0)
                    and 0 <= r + dr < n and 0 <= c + dc < n]
            if min(nbrs) >= vals[r, c]:
                exp = min(nbrs) + 0.0001
            else:
                exp = vals[r, c]
            assert abs(got[r, c] - exp) < 1e-12, (r, c)


def test_num_inflowing_sums_to_edges(spark):
    df, _ = _dem(spark, seed=6)
    got = _grid(HY.num_inflowing_neighbours(df, META))
    ptr = _grid(HY.d8_pointer(df, META))
    # total inflows == number of flowing cells
    assert got.sum() == (ptr > 0).sum()


def test_noflow_cells_matches_pointer(spark):
    df, _ = _dem(spark, seed=7)
    nf = _grid(HY.find_noflow_cells(df, META))
    ptr = _grid(HY.d8_pointer(df, META))
    assert np.array_equal(nf == 1.0, ptr == 0.0)


def test_dist_and_hand_consistency(spark):
    df, vals = _dem(spark, seed=8)
    thr = 4.0
    dist = HY.downslope_distance_to_stream(df, META, thr)
    hand = HY.elevation_above_stream(df, META, thr)
    dg, hg = _grid(dist), _grid(hand)
    acc = _grid(HY.d8_flow_accumulation_tiled(df, META))
    streams = acc >= thr
    # stream cells are 0 in both outputs
    assert (dg[streams & ~np.isnan(dg)] == 0.0).all()
    assert (hg[streams & ~np.isnan(hg)] == 0.0).all()
    # every cell with a defined distance also has a defined HAND value
    assert np.array_equal(np.isnan(dg), np.isnan(hg))
    # distances are positive multiples of the step lengths off-stream
    off = ~streams & ~np.isnan(dg)
    assert (dg[off] > 0).all()


def test_sink_and_depth(spark):
    # a bowl: ring of 9s with a 1 in the middle, on a tilted plane
    n = 12
    vals = np.tile(np.arange(n, dtype=float)[None, :] + 10.0, (n, 1))
    vals[5, 5] = 1.0
    vals[5, 6] = 2.0
    rows = [(int(r), int(c), float(vals[r, c])) for r in range(n) for c in range(n)]
    df = spark.createDataFrame(rows, "row long, col long, value double")
    depth = _grid(HY.depth_in_sink(df, META))
    sinks = _grid(HY.sink(df, META))
    assert depth[5, 5] > 0  # the pit got filled
    assert not np.isnan(sinks[5, 5])  # and identified as a sink
    # cells outside the depression have zero depth
    assert depth[0, 0] == 0.0 and depth[11, 11] == 0.0
