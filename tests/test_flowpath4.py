"""Round-4c flowpath family: ElevAbovePit, FlowLengthDiff,
AverageFlowpathSlope, TraceDownslopeFlowpaths, LongestFlowpath — each
checked against a direct numpy walk of the D8 pointer (the reference's
sequential traversal)."""

import math

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators import hydro as HY

META = GridMeta(rows=8, columns=8, north=80.0, south=0.0, east=80.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)
DIAG = math.sqrt(200.0)
LEN = [DIAG, 10.0, DIAG, 10.0, DIAG, 10.0, DIAG, 10.0]


def _grid(seed=13, n=8):
    rng = np.random.RandomState(seed)
    return np.round(rng.uniform(0, 100, size=(n, n)), 1)


def _cells(spark, z):
    rows = [(r, c, float(z[r, c]))
            for r in range(z.shape[0]) for c in range(z.shape[1])]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _asmap(df):
    return {(r["row"], r["col"]): r["value"] for r in df.collect()}


def _d8_next(z, r, c):
    """Reference pointer rule: steepest positive downslope, first max
    wins in D8 scan order."""
    best, arg = 0.0, None
    for i in range(8):
        rr, cc = r + HY.D8_DY[i], c + HY.D8_DX[i]
        if 0 <= rr < z.shape[0] and 0 <= cc < z.shape[1]:
            s = (z[r, c] - z[rr, cc]) / LEN[i]
            if s > best:
                best, arg = s, (rr, cc, LEN[i])
    return arg


def _walk(z, r, c):
    """Path from (r, c) to its terminal: list of (cell, steplen)."""
    path = [(r, c)]
    lens = []
    while True:
        nxt = _d8_next(z, *path[-1])
        if nxt is None:
            return path, lens
        path.append((nxt[0], nxt[1]))
        lens.append(nxt[2])


def test_elev_above_pit(spark):
    z = _grid()
    out = _asmap(HY.elev_above_pit(_cells(spark, z), META))
    for r in range(8):
        for c in range(8):
            path, _ = _walk(z, r, c)
            assert out[(r, c)] == pytest.approx(
                z[r, c] - z[path[-1]], abs=1e-12), (r, c)


def test_flow_length_diff(spark):
    z = _grid(17)
    dfl = np.zeros((8, 8))
    for r in range(8):
        for c in range(8):
            _, lens = _walk(z, r, c)
            dfl[r, c] = sum(lens)
    out = _asmap(HY.flow_length_diff(_cells(spark, z), META))
    for r in range(8):
        for c in range(8):
            diffs = []
            for dr, dc in ((0, 1), (1, 0), (0, -1), (-1, 0)):
                rr, cc = r + dr, c + dc
                if 0 <= rr < 8 and 0 <= cc < 8:
                    diffs.append(abs(dfl[r, c] - dfl[rr, cc]))
            assert out[(r, c)] == pytest.approx(max(diffs), abs=1e-9), (r, c)


def test_trace_downslope_flowpaths(spark):
    z = _grid(19)
    seeds = [(1, 1), (5, 6), (7, 0)]
    sdf = spark.createDataFrame(seeds, "row long, col long")
    out = _asmap(HY.trace_downslope_flowpaths(_cells(spark, z), META, sdf))
    want = {}
    for (r, c) in seeds:
        path, _ = _walk(z, r, c)
        for cell in path:
            want[cell] = want.get(cell, 0) + 1
    assert out == {k: float(v) for k, v in want.items()}


def test_average_flowpath_slope(spark):
    """Brute force: enumerate every divide cell's full path; per cell
    accumulate the reference's NF / TDE / TFL propagation."""
    z = _grid(29)
    nxt = {}
    indeg = np.zeros((8, 8), dtype=int)
    for r in range(8):
        for c in range(8):
            n = _d8_next(z, r, c)
            nxt[(r, c)] = n
            if n is not None:
                indeg[n[0], n[1]] += 1
    upstream = {(r, c): [] for r in range(8) for c in range(8)}
    for r in range(8):
        for c in range(8):
            path, _ = _walk(z, r, c)
            for cell in path:
                upstream[cell].append((r, c))
    out = _asmap(HY.average_flowpath_slope(_cells(spark, z), META))
    for r in range(8):
        for c in range(8):
            ups = upstream[(r, c)]
            divs = [u for u in ups if indeg[u] == 0]
            tfl = sum(nxt[u][2] for u in ups if u != (r, c))
            if tfl == 0.0:
                assert (r, c) not in out  # divide cells omitted (NaN in ref)
                continue
            nf = len(divs)
            tde = sum(z[u] for u in divs)
            want = math.degrees(math.atan(
                (tde / nf - z[r, c]) / (tfl / nf)))
            assert out[(r, c)] == pytest.approx(want, abs=1e-9), (r, c)


def test_longest_flowpath(spark):
    z = _grid(37)
    df = HY.longest_flowpath(_cells(spark, z), META)
    rows = df.collect()
    by_basin = {}
    for r in rows:
        by_basin.setdefault(r["basin_id"], []).append(r)
    # per basin: seq is contiguous from 0, length equals the walked
    # length of the head cell, and the path follows the D8 pointer
    for bid, cells in by_basin.items():
        cells.sort(key=lambda r: r["seq"])
        assert cells[0]["seq"] == 0
        head = (cells[0]["row"], cells[0]["col"])
        path, lens = _walk(z, *head)
        assert [(c["row"], c["col"]) for c in cells] == path
        assert cells[0]["length"] == pytest.approx(sum(lens), abs=1e-9)
    # every terminal cell's longest path is at least as long as any
    # other cell draining to it
    for r in range(8):
        for c in range(8):
            path, lens = _walk(z, r, c)
            term = path[-1]
            blen = next(cs[0]["length"] for cs in by_basin.values()
                        if (cs[0]["row"], cs[0]["col"]) and
                        (cs[-1]["row"], cs[-1]["col"]) == term)
            assert blen >= sum(lens) - 1e-9
