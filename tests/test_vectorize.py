"""RasterToVectorPolygons tests: topology + round-trip rasterization."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.functions import geometry as G
from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators.vectorize import raster_to_polygons


def _df(spark, vals):
    rows = [(r, c, float(vals[r][c])) for r in range(len(vals)) for c in range(len(vals[0]))]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _meta(rows, cols):
    return GridMeta(rows=rows, columns=cols, north=float(rows * 10), south=0.0,
                    east=float(cols * 10), west=0.0, resolution_x=10.0, resolution_y=10.0)


def _features(df):
    return {r["clump_id"]: r for r in df.collect()}


def test_single_square(spark):
    vals = [[1.0]]
    feats = _features(raster_to_polygons(_df(spark, vals), _meta(1, 1)))
    assert len(feats) == 1
    (f,) = feats.values()
    assert len(f["parts"]) == 1
    ring = [(p["x"], p["y"]) for p in f["parts"][0]["ring"]]
    assert not f["parts"][0]["is_hole"]
    assert set(ring) == {(0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)}
    assert ring[0] == ring[-1]


def test_donut_shell_and_hole(spark):
    vals = [
        [1, 1, 1, 1, 1],
        [1, 1, 1, 1, 1],
        [1, 1, 0, 1, 1],
        [1, 1, 1, 1, 1],
        [1, 1, 1, 1, 1],
    ]
    feats = _features(raster_to_polygons(_df(spark, vals), _meta(5, 5)))
    assert len(feats) == 2
    ring_feat = [f for f in feats.values() if f["value"] == 1.0][0]
    holes = [p for p in ring_feat["parts"] if p["is_hole"]]
    shells = [p for p in ring_feat["parts"] if not p["is_hole"]]
    assert len(shells) == 1 and len(holes) == 1
    # shell is the 50x50 outer square, hole the 10x10 center
    hole_ring = np.array([(p["x"], p["y"]) for p in holes[0]["ring"]])
    assert hole_ring[:, 0].min() == 20.0 and hole_ring[:, 0].max() == 30.0
    # the inner 0-cell is its own polygon too
    zero_feat = [f for f in feats.values() if f["value"] == 0.0][0]
    assert len(zero_feat["parts"]) == 1


def _roundtrip_cells(feats, meta):
    """Rasterize features back via PIP at cell centers (numpy)."""
    got = {}
    for f in feats.values():
        shells = [np.array([(p["x"], p["y"]) for p in part["ring"]])
                  for part in f["parts"] if not part["is_hole"]]
        holes = [np.array([(p["x"], p["y"]) for p in part["ring"]])
                 for part in f["parts"] if part["is_hole"]]
        for r in range(meta.rows):
            for c in range(meta.columns):
                cx = meta.west + (c + 0.5) * meta.resolution_x
                cy = meta.north - (r + 0.5) * meta.resolution_y
                inside = any(G.points_in_polygon(np.array([cx]), np.array([cy]), s)[0]
                             for s in shells)
                in_hole = any(G.points_in_polygon(np.array([cx]), np.array([cy]), h)[0]
                              for h in holes)
                if inside and not in_hole:
                    assert (r, c) not in got, "overlapping polygons"
                    got[(r, c)] = f["value"]
    return got


def test_roundtrip_random_raster(spark):
    rng = np.random.RandomState(11)
    vals = rng.randint(0, 3, size=(10, 10)).astype(float).tolist()
    meta = _meta(10, 10)
    feats = _features(raster_to_polygons(_df(spark, vals), meta))
    got = _roundtrip_cells(feats, meta)
    want = {(r, c): float(vals[r][c]) for r in range(10) for c in range(10)}
    assert got == want


def test_l_shape_and_diagonal_saddle(spark):
    # two value-1 cells touching only diagonally: 4-connectivity gives
    # two separate polygons (the saddle case)
    vals = [
        [1, 0],
        [0, 1],
    ]
    meta = _meta(2, 2)
    feats = _features(raster_to_polygons(_df(spark, vals), meta))
    ones = [f for f in feats.values() if f["value"] == 1.0]
    assert len(ones) == 2
    got = _roundtrip_cells(feats, meta)
    assert got == {(0, 0): 1.0, (0, 1): 0.0, (1, 0): 0.0, (1, 1): 1.0}
