"""GeoTIFF + Shapefile connector round-trips (strips/tiles-by-directory,
DEFLATE, ESRI ring-orientation conventions, DBF typing)."""

import os
import shutil
import tempfile

import numpy as np
import pytest

import whitebox_tools_spark.sources.formats as FF
from whitebox_tools_spark.functions.raster_math import GridMeta

META = GridMeta(rows=12, columns=10, north=120.0, south=0.0, east=100.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0, nodata=-9999.0)


@pytest.fixture()
def tmpd():
    d = tempfile.mkdtemp(prefix="wbt_fmt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _vals():
    rng = np.random.default_rng(5)
    return np.floor(rng.random((12, 10)) * 100.0)


def _cells_df(spark, vals):
    return spark.createDataFrame(
        [(r, c, float(vals[r, c])) for r in range(12) for c in range(10)],
        "row long, col long, value double",
    )


@pytest.mark.parametrize("compress", [False, True])
def test_geotiff_roundtrip(spark, tmpd, compress):
    vals = _vals()
    pth = os.path.join(tmpd, "t.tif")
    FF.write_geotiff(_cells_df(spark, vals), META, pth, compress=compress)
    cells, meta = FF.read_geotiff(spark, pth)
    assert meta == META
    got = {(r["row"], r["col"]): r["value"] for r in cells.collect()}
    assert len(got) == 120
    for r in range(12):
        for c in range(10):
            assert got[(r, c)] == vals[r, c]


def test_geotiff_tile_directory_mosaic(spark, tmpd):
    """Two adjacent tiles written separately read back as one raster with
    global indices."""
    vals = _vals()
    left = GridMeta(rows=12, columns=5, north=120.0, south=0.0, east=50.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0, nodata=-9999.0)
    right = GridMeta(rows=12, columns=5, north=120.0, south=0.0, east=100.0,
                     west=50.0, resolution_x=10.0, resolution_y=10.0, nodata=-9999.0)
    df = _cells_df(spark, vals)
    FF.write_geotiff(df.where("col < 5"), left, os.path.join(tmpd, "a.tif"))
    FF.write_geotiff(df.where("col >= 5").selectExpr("row", "col - 5 AS col", "value"),
                     right, os.path.join(tmpd, "b.tif"))
    cells, meta = FF.read_geotiff(spark, tmpd)
    assert (meta.rows, meta.columns, meta.west, meta.east) == (12, 10, 0.0, 100.0)
    got = {(r["row"], r["col"]): r["value"] for r in cells.collect()}
    assert len(got) == 120
    for r in range(12):
        for c in range(10):
            assert got[(r, c)] == vals[r, c]


def test_shapefile_roundtrip_orientation_and_dbf(spark, tmpd):
    feats = [
        {"record_num": 1,
         "parts": [(False, [(0, 0), (4, 0), (4, 4), (0, 4)]),
                   (True, [(1, 1), (1, 2), (2, 2), (2, 1)])],
         "attrs": {"name": "sq", "area": 15.0}},
        {"record_num": 2,
         "parts": [(False, [(10, 10), (14, 10), (12, 14)])],
         "attrs": {"name": "tri", "area": 8.0}},
    ]
    shp = os.path.join(tmpd, "t.shp")
    FF.write_shapefile(feats, shp, shape_type=5)
    geo = {r["record_num"]: r for r in FF.read_shapefile(spark, shp).collect()}
    assert geo[1]["shape_type"] == 5
    holes = sorted(p["is_hole"] for p in geo[1]["parts"])
    assert holes == [False, True]
    # ESRI orientation: shell ring reads back clockwise (negative area)
    shell = [p for p in geo[1]["parts"] if not p["is_hole"]][0]["ring"]
    xs = np.array([v["x"] for v in shell])
    ys = np.array([v["y"] for v in shell])
    assert FF._ring_area2(xs, ys) < 0
    attrs = {r["record_num"]: r for r in
             FF.read_dbf(spark, os.path.join(tmpd, "t.dbf")).collect()}
    assert attrs[1]["name"] == "sq" and attrs[1]["area"] == 15.0
    assert attrs[2]["name"] == "tri" and attrs[2]["area"] == 8.0


def test_shapefile_polyline_and_convert_format(spark, tmpd):
    feats = [{"record_num": 1,
              "parts": [(False, [(0.0, 0.0), (5.0, 5.0), (10.0, 0.0)])],
              "attrs": {"name": "line"}}]
    shp = os.path.join(tmpd, "l.shp")
    FF.write_shapefile(feats, shp, shape_type=3)
    geo = FF.read_shapefile(spark, shp).collect()
    assert geo[0]["shape_type"] == 3
    ring = geo[0]["parts"][0]["ring"]
    assert [(v["x"], v["y"]) for v in ring][:3] == [(0.0, 0.0), (5.0, 5.0), (10.0, 0.0)]
    # ConvertRasterFormat composition: arc-ascii -> geotiff
    vals = _vals()
    asc = os.path.join(tmpd, "g.asc")
    FF.write_arc_ascii(_cells_df(spark, vals), META, asc)
    cells, meta = FF.read_arc_ascii(spark, asc)
    tif = os.path.join(tmpd, "g.tif")
    FF.write_geotiff(cells, meta, tif)
    cells2, meta2 = FF.read_geotiff(spark, tif)
    assert meta2.rows == META.rows and meta2.columns == META.columns
    got = {(r["row"], r["col"]): r["value"] for r in cells2.collect()}
    for r in range(12):
        for c in range(10):
            assert got[(r, c)] == vals[r, c]


def test_print_geotiff_tags(spark, tmpd):
    vals = _vals()
    pth = os.path.join(tmpd, "tags.tif")
    FF.write_geotiff(_cells_df(spark, vals), META, pth)
    tags = FF.print_geotiff_tags(pth)
    assert tags["width"] == 10 and tags["height"] == 12
    assert tags["pixel_scale"] == (10.0, 10.0)
    assert tags["nodata"] == -9999.0
    assert (tags["west"], tags["north"]) == (0.0, 120.0)
    assert tags["max_value"] == vals.max()
