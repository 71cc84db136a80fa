"""Strahler order + stream link identification on a crafted network."""

import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators.hydro import strahler_order, stream_link_id


def _df(spark, vals):
    rows = [(r, c, float(vals[r][c])) for r in range(len(vals)) for c in range(len(vals[0]))]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _grid(df):
    return {(r["row"], r["col"]): r["value"] for r in df.collect()}


# a Y-shaped valley: two headwater branches (rows 0 and 2) meeting at
# col 2 of row 1, then a trunk flowing east. Elevations force D8 flow
# along the branches into the junction and down the trunk.
VALS = [
    [9.0, 8.0, 9.9, 9.9, 9.9, 9.9],
    [9.9, 9.9, 7.0, 3.0, 2.0, 1.0],
    [9.0, 8.0, 9.9, 9.9, 9.9, 9.9],
]
META = GridMeta(rows=3, columns=6, north=30.0, south=0.0, east=60.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)


def test_strahler_y_network(spark):
    df = _df(spark, VALS)
    # threshold 1: every cell is a "stream" cell; orders still follow
    # the junction rule
    got = _grid(strahler_order(df, META, threshold=1.0))
    # the two branch heads are order 1
    assert got[(0, 0)] == 1.0 and got[(2, 0)] == 1.0
    # the junction cell receives two order-k max inflows -> bumps
    junction = got[(1, 2)]
    trunk_end = got[(1, 5)]
    assert trunk_end >= junction >= 2.0


def test_strahler_no_junction_stays_one(spark):
    vals = [[5.0, 4.0, 3.0, 2.0, 1.0]]
    meta = GridMeta(rows=1, columns=5, north=10.0, south=0.0, east=50.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    got = _grid(strahler_order(_df(spark, vals), meta, threshold=1.0))
    assert set(got.values()) == {1.0}


def test_stream_link_id_breaks_at_junction(spark):
    df = _df(spark, VALS)
    # threshold 2 isolates the actual network: the two second-branch
    # cells + the trunk (heads and hillslope cells have accumulation 1)
    got = _grid(stream_link_id(df, META, threshold=2.0))
    assert set(got) == {(0, 1), (2, 1), (1, 2), (1, 3), (1, 4), (1, 5)}
    # the two branches are distinct links; the trunk from the junction
    # down is one link
    assert got[(0, 1)] != got[(2, 1)]
    trunk = {got[(1, c)] for c in (2, 3, 4, 5)}
    assert len(trunk) == 1
    assert got[(0, 1)] not in trunk and got[(2, 1)] not in trunk


def test_strahler_threshold_network(spark):
    got = _grid(strahler_order(_df(spark, VALS), META, threshold=2.0))
    assert got[(0, 1)] == 1.0 and got[(2, 1)] == 1.0
    assert got[(1, 2)] == 2.0 and got[(1, 5)] == 2.0


def test_shreve_magnitude_y_network(spark):
    from whitebox_tools_spark.operators.hydro import shreve_order

    df = _df(spark, VALS)
    got = _grid(shreve_order(df, META, threshold=2.0))
    # two head links (magnitude 1) merging -> trunk magnitude 2
    assert got[(0, 1)] == 1.0 and got[(2, 1)] == 1.0
    assert got[(1, 3)] == 2.0 and got[(1, 5)] == 2.0


def test_stream_link_metrics_and_nodes(spark):
    import math

    from whitebox_tools_spark.operators.hydro import (stream_link_metrics,
                                                      stream_nodes)

    df = _df(spark, VALS)
    m = {r["link_id"]: r for r in stream_link_metrics(df, META, threshold=2.0).collect()}
    assert len(m) == 3  # two branch links + the trunk
    # trunk: 4 cells (1,2..5), 3 axial steps of 10 m; z from 7 to 1
    trunk = [r for r in m.values() if r["n_cells"] == 4][0]
    assert trunk["length"] == pytest.approx(30.0)
    assert trunk["slope_pct"] == pytest.approx((7.0 - 1.0) / 30.0 * 100.0)
    # branch links: single cells, zero in-link length and slope
    singles = [r for r in m.values() if r["n_cells"] == 1]
    assert len(singles) == 2
    assert all(r["length"] == 0.0 and r["slope_pct"] == 0.0 for r in singles)

    nodes = {(r["row"], r["col"]): r["kind"]
             for r in stream_nodes(df, META, threshold=2.0).collect()}
    assert nodes[(0, 1)] == 1 and nodes[(2, 1)] == 1      # heads
    assert nodes[(1, 2)] == 2                              # junction
    assert nodes[(1, 5)] == 3                              # outlet
