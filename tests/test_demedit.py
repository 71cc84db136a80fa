"""DEM-editing tools: RaiseWalls / FlattenLakes / FillBurn. The
epsilon-fill kernel is checked against a numpy priority-flood with the
same epsilon rule (fill_burn.rs's filling stage)."""

import heapq
import math

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators import hydro as HY

META = GridMeta(rows=10, columns=10, north=100.0, south=0.0, east=100.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)


def _cells(spark, z):
    rows = [(r, c, float(z[r, c]))
            for r in range(z.shape[0]) for c in range(z.shape[1])]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _asmap(df):
    return {(r["row"], r["col"]): r["value"] for r in df.collect()}


def _pflood_eps(z, eps):
    """Priority flood with constant epsilon (fill_burn.rs:~500): border
    seeds, pop lowest, raise unvisited neighbors below zout + eps."""
    n, m = z.shape
    w = z.copy()
    seen = np.zeros_like(z, dtype=bool)
    heap = []
    for r in range(n):
        for c in range(m):
            if r in (0, n - 1) or c in (0, m - 1):
                heapq.heappush(heap, (z[r, c], r, c))
                seen[r, c] = True
    while heap:
        zout, r, c = heapq.heappop(heap)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                rr, cc = r + dr, c + dc
                if 0 <= rr < n and 0 <= cc < m and not seen[rr, cc]:
                    seen[rr, cc] = True
                    w[rr, cc] = max(w[rr, cc], zout + eps)
                    heapq.heappush(heap, (w[rr, cc], rr, cc))
    return w


def test_fill_eps_kernel(spark):
    rng = np.random.RandomState(5)
    z = np.round(rng.uniform(10, 50, size=(10, 10)), 1)
    # carve a depression
    z[4:7, 4:7] = 5.0
    eps = 0.001
    out = _asmap(HY._fill_depressions_eps(_cells(spark, z), META, eps))
    want = _pflood_eps(z, eps)
    for r in range(10):
        for c in range(10):
            assert out[(r, c)] == pytest.approx(want[r, c], abs=1e-9), (r, c)


def test_fill_eps_tiled_matches_sequential(spark):
    """The Barnes tiled priority-flood with eps (fill_burn's scale path)
    is bit-exact vs the sequential epsilon priority-flood — both
    single-tile and forced multi-tile (tile=4 over 10x10 = 9 tiles,
    exercising the halo exchange rounds)."""
    rng = np.random.RandomState(13)
    z = np.round(rng.uniform(10, 50, size=(10, 10)), 1)
    z[2:9, 5] = -20.0  # a deep burned trench crossing tile boundaries
    eps = 0.001
    want = _pflood_eps(z, eps)
    for tile in (256, 4):
        out = _asmap(HY.fill_depressions(_cells(spark, z), META, tile=tile,
                                         eps=eps))
        for r in range(10):
            for c in range(10):
                assert out[(r, c)] == want[r, c], (tile, r, c)


def test_raise_walls_and_flatten_lakes(spark):
    rng = np.random.RandomState(9)
    z = np.round(rng.uniform(10, 50, size=(10, 10)), 1)
    # a single square lake polygon covering cell centers (25..75)^2
    ring = [(22.0, 22.0), (78.0, 22.0), (78.0, 78.0), (22.0, 78.0),
            (22.0, 22.0)]
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    polys = spark.createDataFrame(
        [(1, {"xmin": min(xs), "ymin": min(ys), "xmax": max(xs),
              "ymax": max(ys)},
          [(0, False, [{"x": x, "y": y} for x, y in ring])])],
        "polygon_id long, "
        "bbox struct<xmin double, ymin double, xmax double, ymax double>, "
        "parts array<struct<part_idx int, is_hole boolean, "
        "ring array<struct<x double, y double>>>>")

    walls = _asmap(HY.raise_walls(_cells(spark, z), META, polys, height=7.0))
    raised = {k for k, v in walls.items()
              if v != pytest.approx(z[k], abs=0)}
    assert raised  # boundary cells got +7
    for k in raised:
        assert walls[k] == pytest.approx(z[k] + 7.0, abs=1e-12)
    # boundary cells must lie on the outline band (rows/cols 2..7 edges)
    for (r, c) in raised:
        assert 2 <= r <= 7 and 2 <= c <= 7
        assert r in (2, 7) or c in (2, 7)

    flat = _asmap(HY.flatten_lakes(_cells(spark, z), META, polys))
    # interior cells (centers strictly inside) take the outline minimum
    outline = [(r, c) for r in range(2, 8) for c in range(2, 8)
               if r in (2, 7) or c in (2, 7)]
    minz = min(z[k] for k in outline)
    for r in range(10):
        for c in range(10):
            # center of (r, c): x = 5 + 10c, y = 95 - 10r
            x, y = 5.0 + 10.0 * c, 95.0 - 10.0 * r
            inside = 22.0 < x < 78.0 and 22.0 < y < 78.0
            if inside:
                assert flat[(r, c)] == pytest.approx(minz, abs=1e-12), (r, c)
            else:
                assert flat[(r, c)] == pytest.approx(z[r, c], abs=1e-12)


def test_fill_burn_streams_lowered(spark):
    rng = np.random.RandomState(21)
    z = np.round(rng.uniform(20, 60, size=(10, 10)), 1)
    # one horizontal stream across the middle
    segs = spark.createDataFrame(
        [(1, 1.0, 2.0, 55.0, 98.0, 55.0)],
        "record_num long, value double, x1 double, y1 double, "
        "x2 double, y2 double")
    out = _asmap(HY.fill_burn(_cells(spark, z), META, segs))
    assert len(out) == 100
    # stream row cells sit strictly below their original elevation and
    # the deepest-cut stream cell is exactly 1 below the original
    stream_row = 4  # y = 55 -> row = floor((100 - 55) / 10) = 4
    diffs = [z[stream_row, c] - out[(stream_row, c)] for c in range(10)]
    assert min(diffs) == pytest.approx(1.0, abs=1e-6)
    assert all(d > 0 for d in diffs)
    # non-stream cells are fill results of the burned DEM: >= original
    # only where depressions were filled; spot-check passthrough summits
    peak = np.unravel_index(np.argmax(z), z.shape)
    if peak[0] != stream_row:
        assert out[peak] == pytest.approx(z[peak], abs=1e-6)
