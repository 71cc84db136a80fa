"""D8 hydrology tests against hand-computed flow graphs."""

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators import hydro as HY

META = GridMeta(rows=5, columns=5, north=50.0, south=0.0, east=50.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)


def _df(spark, vals):
    rows = [(r, c, float(vals[r][c])) for r in range(len(vals)) for c in range(len(vals[0]))]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _grid(df, col="value"):
    return {(r["row"], r["col"]): r[col] for r in df.collect()}


def test_d8_pointer_tilted_plane(spark):
    # z increases with row -> flow points north (up); D8 code for N is
    # 2^7 = 128 (d_x[7]=0, d_y[7]=-1)
    vals = [[r * 1.0] * 5 for r in range(5)]
    got = _grid(HY.d8_pointer(_df(spark, vals), META))
    assert got[(2, 2)] == 128.0
    # top row has no uphill... no DOWNslope neighbor with lower z -> all
    # z equal in row 0's north? row 0 IS the lowest -> pointer 0
    assert got[(0, 2)] == 0.0


def test_d8_pointer_diagonal_steepest_and_tie_break(spark):
    # pit at center NE diagonal lower: steepest descent to NE (code 1)
    vals = [
        [5.0, 5.0, 0.0],
        [5.0, 9.0, 5.0],
        [5.0, 5.0, 5.0],
    ]
    got = _grid(HY.d8_pointer(_df(spark, vals),
                              GridMeta(rows=3, columns=3, north=30.0, south=0.0,
                                       east=30.0, west=0.0, resolution_x=10.0,
                                       resolution_y=10.0)))
    assert got[(1, 1)] == 1.0  # NE is i=0 -> 2^0


def test_d8_accum_line(spark):
    # strictly decreasing ramp along one row: flow W->... wait z falls
    # with col -> flow East; accumulation grows along the line
    meta = GridMeta(rows=1, columns=5, north=10.0, south=0.0, east=50.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    vals = [[4.0, 3.0, 2.0, 1.0, 0.0]]
    got = _grid(HY.d8_flow_accumulation(_df(spark, vals), meta))
    assert got == {(0, 0): 1.0, (0, 1): 2.0, (0, 2): 3.0, (0, 3): 4.0, (0, 4): 5.0}


def test_d8_basins_two_outlets(spark):
    meta = GridMeta(rows=1, columns=6, north=10.0, south=0.0, east=60.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    # two opposite ramps -> two basins with outlets at the ends
    vals = [[0.0, 1.0, 2.0, 2.0, 1.0, 0.0]]
    got = _grid(HY.basins(_df(spark, vals), meta))
    assert got[(0, 0)] == got[(0, 1)] == got[(0, 2)]
    assert got[(0, 3)] == got[(0, 4)] == got[(0, 5)]
    assert got[(0, 0)] != got[(0, 5)]
    assert got[(0, 0)] == 1.0  # outlet (0,0) is row-major first


def test_extract_streams_threshold(spark):
    meta = GridMeta(rows=1, columns=5, north=10.0, south=0.0, east=50.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    vals = [[4.0, 3.0, 2.0, 1.0, 0.0]]
    got = _grid(HY.extract_streams(_df(spark, vals), meta, 3.0))
    assert got == {(0, 0): 0.0, (0, 1): 0.0, (0, 2): 1.0, (0, 3): 1.0, (0, 4): 1.0}


def test_d8_accum_matches_bruteforce_random(spark):
    rng = np.random.RandomState(3)
    vals = rng.rand(8, 8) * 100
    meta = GridMeta(rows=8, columns=8, north=80.0, south=0.0, east=80.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    df = _df(spark, vals.tolist())
    got = _grid(HY.d8_flow_accumulation(df, meta))
    # brute force: follow pointers
    ptr = _grid(HY.d8_pointer(df, meta))
    nxt = {}
    for (r, c), v in ptr.items():
        if v > 0:
            i = int(np.log2(v))
            nxt[(r, c)] = (r + HY.D8_DY[i], c + HY.D8_DX[i])
    expect = {k: 0.0 for k in ptr}
    for start in ptr:
        cur = start
        seen = set()
        while cur is not None and cur not in seen:
            expect[cur] += 1.0
            seen.add(cur)
            cur = nxt.get(cur)
    assert got == expect
