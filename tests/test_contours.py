"""Contour + raster->vector-line gates: marching-squares segments vs a
numpy reference, chain validity, and line-tracing round trips."""

import numpy as np
import pytest

import whitebox_tools_spark.operators.contours as CO
from whitebox_tools_spark.functions.raster_math import GridMeta

N = 16
META = GridMeta(rows=N, columns=N, north=N * 10.0, south=0.0, east=N * 10.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)


def _ref_segments(g, level, meta):
    """Direct marching-squares transcription (same case table)."""
    west, north = meta.west, meta.north
    rx, ry = meta.resolution_x, meta.resolution_y
    segs = set()

    def xy(r, c):
        return (west + (c + 0.5) * rx, north - (r + 0.5) * ry)

    rows, cols = g.shape
    for r in range(rows - 1):
        for c in range(cols - 1):
            tl, tr = g[r, c], g[r, c + 1]
            bl, br = g[r + 1, c], g[r + 1, c + 1]
            case = ((8 if tl >= level else 0) | (4 if tr >= level else 0)
                    | (2 if br >= level else 0) | (1 if bl >= level else 0))

            def pt(e):
                if e == 0:
                    a, b, (xa, ya), (xb, yb) = tl, tr, xy(r, c), xy(r, c + 1)
                elif e == 2:
                    a, b, (xa, ya), (xb, yb) = bl, br, xy(r + 1, c), xy(r + 1, c + 1)
                elif e == 3:
                    a, b, (xa, ya), (xb, yb) = tl, bl, xy(r, c), xy(r + 1, c)
                else:
                    a, b, (xa, ya), (xb, yb) = tr, br, xy(r, c + 1), xy(r + 1, c + 1)
                t = (level - a) / (b - a)
                return (xa + t * (xb - xa), ya + t * (yb - ya))

            for ea, eb in CO._MS_CASES[case]:
                p, q = pt(ea), pt(eb)
                if p != q:
                    segs.add((min(p, q), max(p, q)))
    return segs


@pytest.fixture(scope="module")
def dem(spark):
    rng = np.random.default_rng(31)
    g = np.floor(np.add.outer(np.arange(N) * 3.0, np.arange(N) * 2.0)
                 + rng.random((N, N)) * 12.0)
    df = spark.createDataFrame(
        [(r, c, float(g[r, c])) for r in range(N) for c in range(N)],
        "row long, col long, value double",
    )
    return df, g


def test_contour_segments_match_reference_across_tiles(spark, dem):
    """tile=5 forces quads to straddle tile boundaries; the segment
    multiset must still equal the global marching-squares reference."""
    df, g = dem
    out = CO.contour_segments(df, META, base=0.0, interval=15.0, tile=5).collect()
    by_level = {}
    for r in out:
        p = (r["x1"], r["y1"])
        q = (r["x2"], r["y2"])
        by_level.setdefault(r["level"], set()).add((min(p, q), max(p, q)))
    levels = sorted(by_level)
    assert levels, "expected contour levels in range"
    for level in levels:
        want = _ref_segments(g, level, META)
        assert by_level[level] == want, level


def test_contours_chain_into_valid_polylines(spark, dem):
    df, g = dem
    segs = CO.contour_segments(df, META, base=0.0, interval=15.0, tile=5).collect()
    lines = CO.contours_from_raster(df, META, base=0.0, interval=15.0, tile=5).collect()
    seg_count = {}
    for r in segs:
        seg_count[r["level"]] = seg_count.get(r["level"], 0) + 1
    # every consecutive vertex pair of a chained line is one original
    # segment, and all segments are used exactly once
    by_line = {}
    for r in lines:
        by_line.setdefault((r["level"], r["line_id"]), []).append(
            (r["vertex_idx"], r["x"], r["y"]))
    used = {}
    for (level, _li), verts in by_line.items():
        verts.sort()
        for (i1, x1, y1), (i2, x2, y2) in zip(verts, verts[1:]):
            assert i2 == i1 + 1
            used[level] = used.get(level, 0) + 1
    assert used == seg_count


def test_raster_to_vector_lines_traces_paths(spark):
    # an L-shaped line of value 7 and a diagonal line of value 3
    cells = []
    for c in range(2, 9):
        cells.append((4, c, 7.0))
    for r in range(5, 10):
        cells.append((r, 8, 7.0))
    for i in range(5):
        cells.append((10 + i, 1 + i, 3.0))
    grid = {(r, c) for r, c, _v in cells}
    rows = [(r, c, v) for r, c, v in cells]
    # fill background zeros
    for r in range(N):
        for c in range(N):
            if (r, c) not in grid:
                rows.append((r, c, 0.0))
    df = spark.createDataFrame(rows, "row long, col long, value double")
    out = CO.raster_to_vector_lines(df, META).collect()
    by_val = {}
    for r in out:
        by_val.setdefault(r["value"], {}).setdefault(r["line_id"], []).append(
            (r["vertex_idx"], r["x"], r["y"]))
    assert set(by_val) == {7.0, 3.0}
    assert len(by_val[7.0]) == 1  # the L is one polyline
    assert len(by_val[3.0]) == 1  # the diagonal is one polyline
    l7 = sorted(by_val[7.0][0])
    assert len(l7) == 12  # 7 horizontal + 5 vertical cells
    l3 = sorted(by_val[3.0][0])
    assert len(l3) == 5
