"""BreachDepressionsLeastCost gates: sequential numpy transcription
parity (pits with disjoint windows) + the drainage property (filling a
breached DEM is a no-op)."""

import heapq
import math

import numpy as np
import pytest

import whitebox_tools_spark.operators.hydro as HY
from whitebox_tools_spark.functions.raster_math import GridMeta

N = 20
META = GridMeta(rows=N, columns=N, north=N * 10.0, south=0.0, east=N * 10.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)

DX = [1, 1, 1, 0, -1, -1, -1, 0]
DY = [-1, 0, 1, 1, 1, 0, -1, -1]
BACK = [4, 5, 6, 7, 0, 1, 2, 3]


def _ref_breach(g, small_num, max_dist=20):
    """Parallel-independent transcription of the operator's documented
    semantics: every pit solves against the raised (uncarved) DEM and
    carves min-combine (the reference's sequential lowest-first reuse of
    earlier channels is the documented deviation)."""
    rows, cols = g.shape
    raised = g.astype(np.float64).copy()
    pits = []
    for r in range(1, rows - 1):
        for c in range(1, cols - 1):
            z = g[r, c]
            nb = [g[r + DY[n], c + DX[n]] for n in range(8)]
            if all(v >= z for v in nb):
                raised[r, c] = min(nb) - small_num
                pits.append((r, c, z))
    out = raised.copy()
    for prow, pcol, z_pit in pits:
        encountered = {(prow, pcol)}
        plen = {(prow, pcol): 0}
        backlink = {}
        heap = [(0.0, 0, prow, pcol)]
        cnt = 1
        while heap:
            accum, _c, r, c = heapq.heappop(heap)
            length = plen[(r, c)]
            done = False
            for n in range(8):
                rn, cn = r + DY[n], c + DX[n]
                if (rn, cn) in encountered:
                    continue
                ln = length + 1
                plen[(rn, cn)] = ln
                backlink[(rn, cn)] = BACK[n]
                zout = z_pit - ln * small_num
                zn = (raised[rn, cn]
                      if 0 <= rn < rows and 0 <= cn < cols
                      and abs(rn - prow) <= max_dist + 1
                      and abs(cn - pcol) <= max_dist + 1 else None)
                if zn is not None and zn > zout:
                    encountered.add((rn, cn))
                    if ln <= max_dist:
                        heapq.heappush(heap, (accum + (zn - zout), cnt, rn, cn))
                        cnt += 1
                else:
                    while (rn, cn) in backlink:
                        b = backlink[(rn, cn)]
                        rn, cn = rn + DY[b], cn + DX[b]
                        lp = plen[(rn, cn)]
                        zo = z_pit - lp * small_num
                        if raised[rn, cn] > zo:
                            out[rn, cn] = min(out[rn, cn], zo)
                    done = True
                    break
            if done:
                break
    return out


@pytest.fixture(scope="module")
def dem(spark):
    rng = np.random.default_rng(23)
    g = np.floor(np.add.outer(np.arange(N) * 1.0, np.arange(N) * 1.0)
                 + rng.random((N, N)) * 4.0) + 10.0
    # two well-separated pits
    g[4, 4] = 1.0
    g[15, 14] = 2.0
    return g


def test_breach_matches_sequential_reference(spark, dem):
    g = dem
    df = spark.createDataFrame(
        [(r, c, float(g[r, c])) for r in range(N) for c in range(N)],
        "row long, col long, value double",
    )
    out = HY.breach_depressions_least_cost(df, META, max_dist=8, max_rounds=1)
    got = {(r["row"], r["col"]): r["value"] for r in out.collect()}
    small_num = 1.0 / (10.0 ** (9 - len(str(int(g.max()))))) * math.ceil(math.sqrt(200.0))
    want = _ref_breach(g, small_num, max_dist=8)
    assert len(got) == N * N
    for r in range(N):
        for c in range(N):
            assert got[(r, c)] == pytest.approx(want[r, c], abs=1e-12), (r, c)


def test_breached_dem_drains(spark, dem):
    """Every real depression is resolved: the only residual non-drainage
    after breaching is micro-flats of depth O(small_num) where equal-
    elevation pits breach into each other — the same residue the
    reference cleans with its --fill option (tool doc: 'combined with
    subsequent depression filling'). Gate: fill raises nothing by more
    than 10 * small_num, while the RAW dem has metre-deep depressions."""
    g = dem
    df = spark.createDataFrame(
        [(r, c, float(g[r, c])) for r in range(N) for c in range(N)],
        "row long, col long, value double",
    )
    small_num = 1.0 / (10.0 ** (9 - len(str(int(g.max()))))) * math.ceil(math.sqrt(200.0))
    breached = HY.breach_depressions_least_cost(df, META, max_dist=8) \
                 .localCheckpoint(eager=True)
    filled = HY.fill_depressions(breached, META)
    b = {(r["row"], r["col"]): r["value"] for r in breached.collect()}
    f = {(r["row"], r["col"]): r["value"] for r in filled.collect()}
    worst = max(abs(b[k] - f[k]) for k in b)
    assert worst <= 10.0 * small_num, worst
    # contrast: the unbreached DEM needs real filling
    filled_raw = HY.fill_depressions(df, META)
    fr = {(r["row"], r["col"]): r["value"] for r in filled_raw.collect()}
    gmap = {(r, c): g[r, c] for r in range(N) for c in range(N)}
    assert max(fr[k] - gmap[k] for k in gmap) > 1.0
