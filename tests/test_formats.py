"""Format connector round-trips: ArcGIS ASCII grids and LAS files."""

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.sources.formats import (read_arc_ascii, read_las,
                                                  write_arc_ascii, write_las)


def test_arc_ascii_roundtrip(spark, tmp_path):
    meta = GridMeta(rows=5, columns=4, north=50.0, south=0.0, east=40.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    rng = np.random.RandomState(1)
    vals = rng.randint(0, 100, size=(5, 4)).astype(float)
    rows = [(r, c, float(vals[r, c])) for r in range(5) for c in range(4)]
    cells = spark.createDataFrame(rows, "row long, col long, value double")
    p = str(tmp_path / "grid.asc")
    write_arc_ascii(cells, meta, p)

    back, meta2 = read_arc_ascii(spark, p)
    assert (meta2.rows, meta2.columns) == (5, 4)
    assert meta2.north == 50.0 and meta2.west == 0.0 and meta2.resolution_x == 10.0
    got = {(r["row"], r["col"]): r["value"] for r in back.collect()}
    for r in range(5):
        for c in range(4):
            assert got[(r, c)] == vals[r, c]


def test_las_roundtrip_scale_offset_parity(spark, tmp_path):
    pts = [
        {"x": 100.13, "y": 200.57, "z": 5.25, "intensity": 42,
         "return_number": 2, "num_returns": 3, "classification": 2,
         "scan_angle": -7, "gps_time": 123.5},
        {"x": -50.02, "y": 0.01, "z": -1.5, "intensity": 7,
         "return_number": 1, "num_returns": 1, "classification": 5,
         "scan_angle": 12, "gps_time": 124.0},
    ]
    d = tmp_path / "las"
    d.mkdir()
    write_las(pts, str(d / "a.las"), fmt=1, scale=(0.01, 0.01, 0.01))
    write_las(pts[:1], str(d / "b.las"), fmt=0, scale=(0.001, 0.001, 0.001))

    df = read_las(spark, str(d)).orderBy("source_file", "point_id")
    rows = df.collect()
    assert len(rows) == 3
    a0 = rows[0]
    # the i32*scale+offset transform must reproduce coordinates exactly
    # at the stored precision: x = round(100.13/0.01) * 0.01
    assert a0["x"] == round(100.13 / 0.01) * 0.01
    assert a0["intensity"] == 42
    assert a0["return_number"] == 2 and a0["num_returns"] == 3
    assert a0["classification"] == 2 and a0["scan_angle"] == -7
    assert a0["gps_time"] == 123.5
    b0 = [r for r in rows if r["source_file"] == "b.las"][0]
    assert b0["x"] == round(100.13 / 0.001) * 0.001
    assert b0["gps_time"] is None or np.isnan(b0["gps_time"])  # fmt 0: no GPS time


def test_las_reader_parallel_files(spark, tmp_path):
    d = tmp_path / "many"
    d.mkdir()
    for i in range(6):
        write_las([{"x": float(i), "y": 0.0, "z": 0.0}], str(d / f"t{i}.las"))
    df = read_las(spark, str(d))
    assert df.count() == 6
    assert df.select("source_file").distinct().count() == 6
