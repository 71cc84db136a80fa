"""Round-trip tests for the round-2 continuation grid formats."""

import os
import tempfile

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.sources import formats as FM

META = GridMeta(rows=7, columns=9, north=70.0, south=0.0, east=90.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0, nodata=-32768.0)


@pytest.fixture()
def cells(spark):
    rng = np.random.RandomState(3)
    vals = rng.randint(0, 500, size=(7, 9)).astype(float)
    rows = [(int(r), int(c), float(vals[r, c])) for r in range(7) for c in range(9)]
    return spark.createDataFrame(rows, "row long, col long, value double"), vals


def _collect(df, n=7, m=9):
    out = np.full((n, m), np.nan)
    for r in df.collect():
        out[int(r["row"]), int(r["col"])] = r["value"]
    return out


def test_surfer_ascii_roundtrip(spark, cells):
    df, vals = cells
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g.grd")
        FM.write_surfer_ascii(df, META, p)
        back, meta = FM.read_surfer_ascii(spark, p)
        assert meta.rows == 7 and meta.columns == 9
        assert abs(meta.north - 70.0) < 1e-9
        assert np.array_equal(_collect(back), vals)


def test_grass_ascii_roundtrip(spark, cells):
    df, vals = cells
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g.asc")
        FM.write_grass_ascii(df, META, p)
        back, meta = FM.read_grass_ascii(spark, p)
        assert meta.rows == 7 and meta.columns == 9
        assert np.array_equal(_collect(back), vals)


@pytest.mark.parametrize("dtype", ["double", "float", "i16"])
def test_whitebox_roundtrip(spark, cells, dtype):
    df, vals = cells
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g")
        FM.write_whitebox(df, META, p, data_type=dtype)
        back, meta = FM.read_whitebox(spark, p)
        assert meta.rows == 7 and meta.columns == 9
        assert meta.nodata == -32768.0
        assert np.array_equal(_collect(back), vals)


def test_idrisi_roundtrip(spark, cells):
    df, vals = cells
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g")
        FM.write_idrisi(df, META, p)
        back, meta = FM.read_idrisi(spark, p)
        assert meta.rows == 7 and meta.columns == 9
        assert np.array_equal(_collect(back), vals)


def test_esri_float_roundtrip(spark, cells):
    df, vals = cells
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g")
        FM.write_esri_float(df, META, p)
        back, meta = FM.read_esri_float(spark, p)
        assert meta.rows == 7 and meta.columns == 9
        assert abs(meta.east - 90.0) < 1e-9
        assert np.array_equal(_collect(back), vals)


def test_cross_format_convert(spark, cells):
    """ConvertRasterFormat parity: surfer -> whitebox -> arc ascii keeps
    every value."""
    df, vals = cells
    with tempfile.TemporaryDirectory() as d:
        FM.write_surfer_ascii(df, META, os.path.join(d, "a.grd"))
        mid, meta = FM.read_surfer_ascii(spark, os.path.join(d, "a.grd"))
        FM.write_whitebox(mid, meta, os.path.join(d, "b"), data_type="double")
        mid2, meta2 = FM.read_whitebox(spark, os.path.join(d, "b"))
        FM.write_arc_ascii(mid2, meta2, os.path.join(d, "c.asc"))
        final, _ = FM.read_arc_ascii(spark, os.path.join(d, "c.asc"))
        assert np.array_equal(_collect(final), vals)
