"""UpslopeDepressionStorage + DInfMassFlux gates.

dinf_mass_flux(load=1, eff=1, ab=0) must equal dinf_flow_accumulation —
with unit efficiency the eff-scaled edge weights and source terms
degenerate to the plain path-weight closure, so any defect in the
scaling/b-term algebra shows up against the accumulation baseline.
(Plan-shape independence is provided by the DuckDB oracle, a 64-round
Jacobi replay of the same recurrence.)"""

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators import hydro as HY

META = GridMeta(rows=8, columns=8, north=80.0, south=0.0, east=80.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)


def _cells(spark, z):
    rows = [(r, c, float(z[r, c]))
            for r in range(z.shape[0]) for c in range(z.shape[1])]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _asmap(df):
    return {(r["row"], r["col"]): r["value"] for r in df.collect()}


def test_dinf_mass_flux_equals_accumulation(spark):
    rng = np.random.RandomState(8)
    z = np.round(rng.uniform(10, 90, size=(8, 8)), 1)
    cells = _cells(spark, z)
    ones = cells.selectExpr("row", "col", "CAST(1.0 AS DOUBLE) AS value")
    eff1 = ones
    ab0 = cells.selectExpr("row", "col", "CAST(0.0 AS DOUBLE) AS value")
    flux = _asmap(HY.dinf_mass_flux(cells, META, ones, eff1, ab0))
    accum = _asmap(HY.dinf_flow_accumulation(cells, META))
    assert set(flux) == set(accum)
    for k in accum:
        assert flux[k] == pytest.approx(accum[k], rel=1e-9), k


def test_dinf_mass_flux_plane(spark):
    # plane sloping due south: dinf routes everything to the S neighbor;
    # with eff e and no absorption: f_0 = e, f_{i+1} = (1 + f_i) * e
    z = np.tile((np.arange(8, dtype=float)[::-1] * 10.0)[:, None], (1, 8))
    cells = _cells(spark, z)
    load = cells.selectExpr("row", "col", "CAST(1.0 AS DOUBLE) AS value")
    eff = cells.selectExpr("row", "col", "CAST(0.5 AS DOUBLE) AS value")
    ab = cells.selectExpr("row", "col", "CAST(0.0 AS DOUBLE) AS value")
    out = _asmap(HY.dinf_mass_flux(cells, META, load, eff, ab))
    want = 0.5
    for r in range(8):
        for c in range(2, 6):  # interior columns, no edge effects
            assert out[(r, c)] == pytest.approx(want, rel=1e-9), (r, c)
        want = (1.0 + want) * 0.5


def test_upslope_depression_storage(spark):
    # depression-free ramp -> zero storage everywhere
    ramp = np.add.outer(np.arange(8) * 5.0, np.arange(8) * 3.0) + 10.0
    out = _asmap(HY.upslope_depression_storage(_cells(spark, ramp), META))
    assert all(v == pytest.approx(0.0, abs=1e-12) for v in out.values())

    # one interior pit: its fill depth shows up at the pit, scaled by
    # the upslope area; everything stays within [0, max depth]
    z = ramp.copy()
    z[4, 4] = z[4, 4] - 20.0
    out2 = _asmap(HY.upslope_depression_storage(_cells(spark, z), META))
    filled = _asmap(HY.fill_depressions(_cells(spark, z), META))
    depth = {k: filled[k] - v for k, v in
             _asmap(_cells(spark, z).selectExpr(
                 "row", "col", "value")).items()}
    maxd = max(depth.values())
    assert maxd > 0
    assert out2[(4, 4)] > 0.0
    for v in out2.values():
        assert -1e-9 <= v <= maxd + 1e-9


def test_lidar_tophat_transform(spark):
    import itertools
    from whitebox_tools_spark.operators import lidar as LI

    rng = np.random.RandomState(12)
    pts = [(i, float(x), float(y), float(z)) for i, (x, y, z) in
           enumerate(rng.uniform(0, 50, size=(30, 3)))]
    df = spark.createDataFrame(
        pts, "record_num long, x double, y double, value double")
    out = {r["record_num"]: r["value"]
           for r in LI.lidar_tophat_transform(df, radius=15.0).collect()}
    r2 = 15.0 ** 2
    ero = {}
    for i, xi, yi, zi in pts:
        ero[i] = min(z for j, x, y, z in pts
                     if (x - xi) ** 2 + (y - yi) ** 2 <= r2)
    for i, xi, yi, zi in pts:
        dil = max(ero[j] for j, x, y, z in pts
                  if (x - xi) ** 2 + (y - yi) ** 2 <= r2)
        assert out[i] == pytest.approx(zi - dil, abs=1e-12), i


def test_modified_k_means(spark):
    from whitebox_tools_spark.operators.classify import modified_k_means

    # two tight blobs far apart: start with 6 clusters, merge_dist wide
    # enough that surviving centroids collapse to the two blobs
    rng = np.random.RandomState(15)
    rows = []
    i = 0
    for cx, cy in ((10.0, 10.0), (90.0, 90.0)):
        for _ in range(30):
            rows.append((i // 8, i % 8, cx + rng.uniform(-1, 1),
                         cy + rng.uniform(-1, 1)))
            i += 1
    bands = spark.createDataFrame(
        rows, "row long, col long, b1 double, b2 double")
    out = modified_k_means(bands, ["b1", "b2"], start_clusters=6,
                           merge_dist=30.0, max_iters=10)
    got = out.join(bands, ["row", "col"]).collect()
    labels_low = {r["cluster"] for r in got if r["b1"] < 50.0}
    labels_high = {r["cluster"] for r in got if r["b1"] >= 50.0}
    assert len(labels_low) == 1 and len(labels_high) == 1
    assert labels_low != labels_high


def test_insert_dams(spark):
    # a V-shaped valley running north-south; a dam at the valley floor
    # raises the crest to the lower of the two shoulder heights
    z = np.zeros((9, 9))
    for c in range(9):
        z[:, c] = 30.0 - 5.0 * min(c, 8 - c)  # valley floor at col 4
    dams = spark.createDataFrame([(1, 45.0, 45.0)],
                                 "dam_id long, x double, y double")
    out = _asmap(HY.insert_dams(_cells9(spark, z), META9, dams, 7.0))
    # never lowers
    for k, v in out.items():
        assert v >= z[k] - 1e-12
    # the dam cell itself is raised above the valley floor
    assert out[(4, 4)] > z[4, 4]


META9 = GridMeta(rows=9, columns=9, north=90.0, south=0.0, east=90.0,
                 west=0.0, resolution_x=10.0, resolution_y=10.0)


def _cells9(spark, z):
    rows = [(r, c, float(z[r, c]))
            for r in range(z.shape[0]) for c in range(z.shape[1])]
    return spark.createDataFrame(rows, "row long, col long, value double")


def test_impoundment_size_index(spark):
    """Brute-force numpy transcription on a 9x9 valley: crest raster +
    flooded upstream sets."""
    z = np.zeros((9, 9))
    for col in range(9):
        z[:, col] = 30.0 - 5.0 * min(col, 8 - col)
    for row in range(9):
        z[row, :] += row * 0.5  # gentle southward... northward tilt
    out = {(r["row"], r["col"]): r for r in
           HY.impoundment_size_index(_cells9(spark, z), META9, 5.0)
           .collect()}
    h = 2
    dxs, dys = HY.D8_DX, HY.D8_DY
    perp1, perp2 = [2, 3, 4, 1], [6, 7, 0, 5]
    L = 2 * h + 1
    crest = np.full((9, 9), -np.inf)
    for r in range(9):
        for c in range(9):
            for d in range(4):
                prof = np.full(L, -np.inf)
                pos = [(r, c)] * L
                prof[h] = z[r, c]
                rn, cn, rn2, cn2 = r, c, r, c
                for i in range(1, h + 1):
                    rn += dys[perp1[d]]
                    cn += dxs[perp1[d]]
                    if 0 <= rn < 9 and 0 <= cn < 9:
                        prof[h + i] = z[rn, cn]
                    pos[h + i] = (rn, cn)
                    rn2 += dys[perp2[d]]
                    cn2 += dxs[perp2[d]]
                    if 0 <= rn2 < 9 and 0 <= cn2 < 9:
                        prof[h - i] = z[rn2, cn2]
                    pos[h - i] = (rn2, cn2)
                filled = prof.copy()
                for i in range(1, L - 1):
                    filled[i] = filled[i - 1] if filled[i - 1] > prof[i] \
                        else prof[i]
                filled[L - 1] = prof[L - 1]
                for i in range(L - 2, 0, -1):
                    if filled[i + 1] > prof[i]:
                        if filled[i + 1] < filled[i]:
                            filled[i] = filled[i + 1]
                    else:
                        filled[i] = prof[i]
                for i in range(L):
                    pr, pc = pos[i]
                    if 0 <= pr < 9 and 0 <= pc < 9 and np.isfinite(filled[i]):
                        crest[pr, pc] = max(crest[pr, pc], filled[i])
    for r in range(9):
        for c in range(9):
            assert out[(r, c)]["dam_height"] == pytest.approx(
                crest[r, c], abs=1e-12), (r, c)
    # flooded set via brute-force D8 walks
    LEN = [np.hypot(10.0, 10.0), 10.0] * 4
    ups = {(r, c): [] for r in range(9) for c in range(9)}
    for r in range(9):
        for c in range(9):
            rr, cc = r, c
            path = [(rr, cc)]
            while True:
                # steepest descent
                bslope, nxt = 0.0, None
                for i in range(8):
                    r2, c2 = rr + HY.D8_DY[i], cc + HY.D8_DX[i]
                    if 0 <= r2 < 9 and 0 <= c2 < 9:
                        dist = np.hypot(10.0, 10.0) if (HY.D8_DY[i] and
                                                        HY.D8_DX[i]) else 10.0
                        s = (z[rr, cc] - z[r2, c2]) / dist
                        if s > bslope:
                            bslope, nxt = s, (r2, c2)
                if nxt is None:
                    break
                rr, cc = nxt
                path.append((rr, cc))
            for cell in path:
                ups[cell].append((r, c))
    for r in range(9):
        for c in range(9):
            want_n = sum(1 for u in ups[(r, c)] if z[u] < crest[r, c])
            assert out[(r, c)]["flooded_cells"] == float(want_n), (r, c)


def test_burn_streams_at_roads(spark):
    # stream along row 4 (y = 45), road along col 4 (x = 45): crossing
    # at (4, 4); the stream under the road embankment gets clamped to
    # the min of nearby stream cells
    z = np.full((9, 9), 50.0)
    z[4, :] = [20.0, 19.0, 18.0, 25.0, 30.0, 24.0, 17.0, 16.0, 15.0]
    streams = spark.createDataFrame(
        [(1, 1.0, 2.0, 45.0, 88.0, 45.0)],
        "record_num long, value double, x1 double, y1 double, "
        "x2 double, y2 double")
    roads = spark.createDataFrame(
        [(1, 1.0, 45.0, 2.0, 45.0, 88.0)],
        "record_num long, value double, x1 double, y1 double, "
        "x2 double, y2 double")
    out = _asmap(HY.burn_streams_at_roads(_cells9(spark, z), META9,
                                          streams, roads, road_width=40.0))
    # k = ceil(40/10)//2 = 2 hops: stream cells cols 2..6 around the
    # crossing; min z among them = 17.0 at col 6
    assert out[(4, 4)] == pytest.approx(17.0)
    for c in (2, 3, 5, 6):
        assert out[(4, c)] == pytest.approx(min(z[4, c], 17.0)), c
    # untouched cells pass through
    assert out[(0, 0)] == 50.0
    assert out[(4, 8)] == 15.0


def test_embankment_mapping(spark):
    # flat plain at 10 with a raised east-west road embankment (rows
    # 4, height +3 over a 1-cell crest); the road line runs along y=45
    z = np.full((9, 9), 10.0)
    z[4, :] = 13.0
    z[3, :] = 11.5
    z[5, :] = 11.5
    roads = spark.createDataFrame(
        [(1, 1.0, 2.0, 45.0, 88.0, 45.0)],
        "record_num long, value double, x1 double, y1 double, "
        "x2 double, y2 double")
    out = _asmap(HY.embankment_mapping(_cells9(spark, z), META9, roads,
                                       search_dist=20.0,
                                       min_road_width=12.0,
                                       typical_width=30.0,
                                       max_height=4.0,
                                       max_width=60.0))
    # the crest row is mapped as embankment
    assert all(out.get((4, c)) == 1.0 for c in range(9))
    # the flat plain far from the road is not
    assert (0, 0) not in out and (8, 8) not in out
