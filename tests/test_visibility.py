"""Viewshed / horizon angle tests."""

import math

import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators.visibility import horizon_angle, viewshed


def _df(spark, vals):
    rows = [(r, c, float(vals[r][c])) for r in range(len(vals)) for c in range(len(vals[0]))]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _grid(df):
    return {(r["row"], r["col"]): r["value"] for r in df.collect()}


def test_viewshed_wall_blocks(spark):
    # flat plain with a wall at col 2; viewpoint at col 0
    vals = [[0.0, 0.0, 50.0, 0.0, 0.0, 0.0]]
    meta = GridMeta(rows=1, columns=6, north=10.0, south=0.0, east=60.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    got = _grid(viewshed(_df(spark, vals), meta, 0, 0, vp_height=2.0))
    assert got[(0, 0)] == 1.0 and got[(0, 1)] == 1.0
    assert got[(0, 2)] == 1.0  # the wall top itself is visible
    for c in (3, 4, 5):
        assert got[(0, c)] == 0.0  # shadowed behind the wall


def test_viewshed_open_plain_all_visible(spark):
    vals = [[0.0] * 5 for _ in range(5)]
    meta = GridMeta(rows=5, columns=5, north=50.0, south=0.0, east=50.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    got = _grid(viewshed(_df(spark, vals), meta, 2, 2))
    assert all(v == 1.0 for v in got.values())


def test_horizon_angle_east_wall(spark):
    vals = [[0.0, 0.0, 0.0, 30.0]]
    meta = GridMeta(rows=1, columns=4, north=10.0, south=0.0, east=40.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    got = _grid(horizon_angle(_df(spark, vals), meta, azimuth=90.0))
    # from col 0 the wall at distance 30 rises 30 -> angle atan(1)
    assert got[(0, 0)] == pytest.approx(math.atan(1.0))
    # from col 2 the wall at distance 10 rises 30 -> atan(3)
    assert got[(0, 2)] == pytest.approx(math.atan(3.0))
    # nothing east of the wall
    assert got[(0, 3)] == 0.0


def test_geomorphons_vs_reference_loop(spark):
    """Geomorphons vs a direct transcription of the reference per-cell
    walk (forms mode), with tile=7 forcing rays across tile halos."""
    import math

    import numpy as np

    from whitebox_tools_spark.functions.raster_math import GridMeta
    from whitebox_tools_spark.operators.visibility import (_GEO_CLASSES,
                                                           _GEO_DX, _GEO_DY,
                                                           geomorphons)

    N = 20
    META = GridMeta(rows=N, columns=N, north=N * 10.0, south=0.0,
                    east=N * 10.0, west=0.0, resolution_x=10.0,
                    resolution_y=10.0)
    rng = np.random.default_rng(47)
    g = np.floor(np.add.outer(np.arange(N) * 3.0, np.arange(N) * -2.0)
                 + rng.random((N, N)) * 25.0)
    df = spark.createDataFrame(
        [(r, c, float(g[r, c])) for r in range(N) for c in range(N)],
        "row long, col long, value double",
    )
    R = 6
    got = {(r["row"], r["col"]): r["value"]
           for r in geomorphons(df, META, search_radius=R, tile=7).collect()}
    flat_thresh = math.radians(1.0)
    search_len = R * 10.0
    want = {}
    for r in range(1, N - 1):
        for c in range(1, N - 1):
            z0 = g[r, c]
            cp = cn = 0
            for di in range(8):
                dy, dx = _GEO_DY[di], _GEO_DX[di]
                step = math.hypot(dx * 10.0, dy * 10.0)
                zen, nad = -math.pi / 2, math.pi / 2
                d = 1
                flat = False
                while d * step < search_len:
                    pr, pc = r + d * dy, c + d * dx
                    if not (0 <= pr < N and 0 <= pc < N):
                        flat = True
                        break
                    ang = math.atan2(g[pr, pc] - z0, d * step)
                    zen = max(zen, ang)
                    nad = min(nad, ang)
                    d += 1
                if flat:
                    continue
                az, an = abs(zen), abs(nad)
                if az > flat_thresh or an > flat_thresh:
                    if an < az:
                        cp += 1
                    elif an > az:
                        cn += 1
            want[(r, c)] = float(_GEO_CLASSES[cn, cp])
    assert got == want
    assert set(want.values()) - {0.0}, "expected non-error classes"
    assert len(set(want.values())) >= 3, "fixture should span several landforms"


def test_viewshed_numpy_transcription_parity(spark):
    """Random rough terrain vs a direct numpy transcription of the R3
    reference walk (same rint rounding, same comparison order)."""
    import numpy as np

    rng = np.random.RandomState(11)
    N = 24
    vals = (rng.rand(N, N) * 40.0).round(1)
    meta = GridMeta(rows=N, columns=N, north=N * 10.0, south=0.0,
                    east=N * 10.0, west=0.0,
                    resolution_x=10.0, resolution_y=10.0)
    vr, vc, h = 5, 7, 2.0
    got = _grid(viewshed(_df(spark, vals.tolist()), meta, vr, vc, vp_height=h))
    z0 = vals[vr, vc] + h
    for r in range(N):
        for c in range(N):
            dr, dc = r - vr, c - vc
            n = max(abs(dr), abs(dc))
            dist = math.hypot(dr * 10.0, dc * 10.0)
            if dist == 0.0:
                assert got[(r, c)] == 1.0
                continue
            tgt = (vals[r, c] - z0) / dist
            vis = 1.0
            for s in range(1, n):
                t = s / n
                ir = int(np.rint(vr + dr * t))
                ic = int(np.rint(vc + dc * t))
                d = math.hypot((ir - vr) * 10.0, (ic - vc) * 10.0)
                if d > 0 and (vals[ir, ic] - z0) / d >= tgt:
                    vis = 0.0
                    break
            assert got[(r, c)] == vis, (r, c)


@pytest.mark.parametrize("azim,md", [(37.0, None), (211.0, 90.0)])
def test_horizon_angle_numpy_transcription_parity(spark, azim, md):
    """Arbitrary azimuth (and a max_dist variant) vs a transcription of
    the reference ray walk with stop-at-first-failure semantics."""
    import numpy as np

    rng = np.random.RandomState(7)
    N = 20
    vals = (rng.rand(N, N) * 30.0).round(1)
    meta = GridMeta(rows=N, columns=N, north=N * 10.0, south=0.0,
                    east=N * 10.0, west=0.0,
                    resolution_x=10.0, resolution_y=10.0)
    got = _grid(horizon_angle(_df(spark, vals.tolist()), meta,
                              azimuth=azim, max_dist=md))
    az = math.radians(azim)
    sr, sc = -math.cos(az), math.sin(az)
    smax = (int(md / 10.0) + 2) if md is not None else int(math.hypot(N, N)) + 2
    limit = md if md is not None else float("inf")
    for r in range(N):
        for c in range(N):
            best = -np.inf
            for s in range(1, smax + 1):
                ir = int(np.rint(r + sr * s))
                ic = int(np.rint(c + sc * s))
                if not (0 <= ir < N and 0 <= ic < N):
                    break
                d = math.hypot((ir - r) * 10.0, (ic - c) * 10.0)
                if d > limit:
                    break
                if d > 0:
                    best = max(best, (vals[ir, ic] - vals[r, c]) / d)
            want = math.atan(best) if np.isfinite(best) else 0.0
            assert got[(r, c)] == pytest.approx(want, abs=1e-12), (r, c)
