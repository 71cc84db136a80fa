"""fd8 pointer, upslope lengths, mass flux, euclidean HAND: parity."""

import math

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators import hydro as HY

N = 10
META = GridMeta(rows=N, columns=N, north=100.0, south=0.0, east=100.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)
DIAG = math.sqrt(200.0)


def _dem(spark, seed=41):
    rng = np.random.RandomState(seed)
    vals = (rng.randint(0, 40, size=(N, N)) + np.arange(N)[:, None] * 3.0)
    rows = [(int(r), int(c), float(vals[r, c])) for r in range(N) for c in range(N)]
    return spark.createDataFrame(rows, "row long, col long, value double"), vals


def _grid(df):
    out = np.full((N, N), np.nan)
    for r in df.collect():
        out[int(r["row"]), int(r["col"])] = r["value"]
    return out


def _nxt_map(spark, df):
    ptr = {(r["row"], r["col"]): r["value"] for r in HY.d8_pointer(df, META).collect()}
    nxt = {}
    for (r, c), p in ptr.items():
        if p > 0:
            i = int(math.log2(p))
            nxt[(r, c)] = (r + HY.D8_DY[i], c + HY.D8_DX[i])
    return nxt


def test_fd8_pointer_codes(spark):
    df, vals = _dem(spark)
    got = _grid(HY.fd8_pointer(df, META))
    for r, c in [(4, 4), (0, 0), (9, 9)]:
        exp = 0
        for i in range(8):
            nr, nc = r + HY.D8_DY[i], c + HY.D8_DX[i]
            if 0 <= nr < N and 0 <= nc < N and vals[nr, nc] < vals[r, c]:
                exp += 1 << i
        assert got[r, c] == exp


def test_upslope_lengths_brute(spark):
    df, vals = _dem(spark, seed=42)
    nxt = _nxt_map(spark, df)
    # brute force: for every source, walk down accumulating distance
    best = {}
    sums = {}
    for src in [(r, c) for r in range(N) for c in range(N)]:
        cur, d = src, 0.0
        best.setdefault(cur, 0.0)
        sums.setdefault(cur, []).append(0.0)
        while cur in nxt:
            step = DIAG if (abs(nxt[cur][0] - cur[0]) and abs(nxt[cur][1] - cur[1])) else 10.0
            d += step
            cur = nxt[cur]
            best[cur] = max(best.get(cur, 0.0), d)
            sums.setdefault(cur, []).append(d)
    mx = _grid(HY.max_upslope_flowpath_length(df, META))
    av = _grid(HY.average_upslope_flowpath_length(df, META))
    for cell in [(5, 5), (9, 4), (0, 0)]:
        assert abs(mx[cell] - best[cell]) < 1e-9
        assert abs(av[cell] - np.mean(sums[cell])) < 1e-9


def test_mass_flux_conservation_rules(spark):
    df, vals = _dem(spark, seed=43)
    one = df.selectExpr("row", "col", "1.0 AS value")
    eff = df.selectExpr("row", "col", "1.0 AS value")
    zero = df.selectExpr("row", "col", "0.0 AS value")
    out = _grid(HY.d8_mass_flux(df, META, one, eff, zero))
    acc = _grid(HY.d8_flow_accumulation_tiled(df, META))
    # with unit loading, full efficiency and no absorption, mass flux
    # equals D8 flow accumulation (cells count)
    assert np.allclose(out, acc)
    # with efficiency 0.5 the flux is strictly below accumulation on
    # cells with upstream area
    half = df.selectExpr("row", "col", "0.5 AS value")
    out2 = _grid(HY.d8_mass_flux(df, META, one, half, zero))
    assert (out2 <= acc / 2.0 + 1e-9).all()


def test_eas_euclidean_zero_on_stream(spark):
    df, vals = _dem(spark, seed=44)
    thr = 4.0
    out = _grid(HY.elevation_above_stream_euclidean(df, META, thr))
    acc = _grid(HY.d8_flow_accumulation_tiled(df, META))
    streams = acc >= thr
    assert (out[streams] == 0.0).all()
    # every value is z - (some stream z): bounded by the z range
    rng = vals.max() - vals.min()
    assert np.nanmax(np.abs(out)) <= rng + 1e-9


def test_parallel_flow_flags_subset_of_streams(spark):
    df, vals = _dem(spark, seed=45)
    out = HY.find_parallel_flow(df, META, 4.0).collect()
    acc = _grid(HY.d8_flow_accumulation_tiled(df, META))
    for r in out:
        assert acc[r["row"], r["col"]] >= 4.0
        assert r["value"] in (0.0, 1.0)


def test_cost_allocation_matches_dijkstra(spark):
    import heapq

    df, vals = _dem(spark, seed=46)
    cost = df.selectExpr("row", "col", "value + 1.0 AS value")
    cg = _grid(cost)
    sources = [(r, c) for r in range(N) for c in range(N) if (r * N + c) % 37 == 0]
    # brute-force multi-source Dijkstra with (cost, source) tie-break
    best = {}
    pq = []
    for s in sources:
        sid = s[0] * N + s[1]
        best[s] = (0.0, sid)
        heapq.heappush(pq, (0.0, sid, s))
    while pq:
        d, sid, (r, c) = heapq.heappop(pq)
        if best.get((r, c), (1e18, -1)) < (d, sid):
            continue
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                nr, nc = r + dr, c + dc
                if not (0 <= nr < N and 0 <= nc < N):
                    continue
                step = DIAG if dr and dc else 10.0
                nd = d + (cg[r, c] + cg[nr, nc]) / 2.0 * step
                cand = (nd, sid)
                if cand < best.get((nr, nc), (1e18, -1)):
                    best[(nr, nc)] = cand
                    heapq.heappush(pq, (nd, sid, (nr, nc)))
    got = {(r["row"], r["col"]): r["value"]
           for r in HY.cost_allocation(cost, META, f"(row * {N} + col) % 37 = 0").collect()}
    for cell, (d, sid) in best.items():
        assert got[cell] == float(sid), (cell, got[cell], sid)


def test_cost_allocation_uniform_cost_ties(spark):
    """Uniform cost => pervasive exact-cost ties; the smaller source id
    must win everywhere on the bisector even though late rounds change
    only `src` (regression test for the acc-only convergence check)."""
    import heapq

    rows = [(r, c, 1.0) for r in range(N) for c in range(N)]
    cost = spark.createDataFrame(rows, "row long, col long, value double")
    sources = [(0, 0), (0, N - 1), (N - 1, 0), (N - 1, N - 1), (4, 4)]
    pred = " OR ".join(f"(row = {r} AND col = {c})" for r, c in sources)
    best = {}
    pq = []
    for s in sources:
        sid = s[0] * N + s[1]
        best[s] = (0.0, sid)
        heapq.heappush(pq, (0.0, sid, s))
    while pq:
        d, sid, (r, c) = heapq.heappop(pq)
        if best.get((r, c), (1e18, -1)) < (d, sid):
            continue
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                nr, nc = r + dr, c + dc
                if not (0 <= nr < N and 0 <= nc < N):
                    continue
                step = DIAG if dr and dc else 10.0
                nd = d + step  # (1+1)/2 * step
                cand = (nd, sid)
                if cand < best.get((nr, nc), (1e18, -1)):
                    best[(nr, nc)] = cand
                    heapq.heappush(pq, (nd, sid, (nr, nc)))
    got = {(r["row"], r["col"]): r["value"]
           for r in HY.cost_allocation(cost, META, pred).collect()}
    for cell, (d, sid) in best.items():
        assert got[cell] == float(sid), (cell, got[cell], sid)
