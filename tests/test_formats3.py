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


def test_zlidar_roundtrip_exact(spark, tmp_path):
    import numpy as np

    from whitebox_tools_spark.sources.formats import read_las, read_zlidar
    from whitebox_tools_spark.sources.zlidar import write_zlidar

    rng = np.random.RandomState(17)
    pts = []
    gps = 500.0
    for i in range(2000):
        nret = int(rng.randint(1, 5))
        gps += 0.001
        pts.append({
            "x": float(rng.rand() * 500), "y": float(rng.rand() * 500),
            "value": float(rng.rand() * 80),
            "intensity": int(rng.randint(0, 65536)),
            "return_number": int(rng.randint(1, nret + 1)),
            "num_returns": nret,
            "classification": int(rng.randint(0, 8)),
            "scan_angle": int(rng.randint(-30, 30)),
            "scan_direction": int(rng.randint(0, 2)),
            "edge_flag": int(rng.rand() < 0.1),
            "gps_time": gps,
        })
    p = str(tmp_path / "t.zlidar")
    write_zlidar(pts, p)
    df = read_zlidar(spark, p).orderBy("point_id").toPandas()
    assert len(df) == 2000
    for i in (0, 7, 1999):
        assert abs(df["x"][i] - pts[i]["x"]) <= 0.005
        assert abs(df["z"][i] - pts[i]["value"]) <= 0.005
        assert abs(df["gps_time"][i] - pts[i]["gps_time"]) < 1e-12
    # full-column exactness for every per-point integer field (the flag byte
    # stream regressed once when int64→bytes serialized 8 bytes per point)
    for col in ("classification", "return_number", "num_returns", "intensity",
                "scan_angle", "scan_direction", "edge_flag"):
        assert np.array_equal(
            df[col].to_numpy().astype(np.int64),
            np.array([p[col] for p in pts], dtype=np.int64),
        ), col


def test_zlidar_vs_las_same_points(spark, tmp_path):
    import numpy as np

    from whitebox_tools_spark.sources.formats import read_las, read_zlidar, write_las
    from whitebox_tools_spark.sources.zlidar import write_zlidar

    rng = np.random.RandomState(23)
    pts = [{"x": float(rng.rand() * 100), "y": float(rng.rand() * 100),
            "value": float(rng.rand() * 10) if False else float(rng.rand() * 10),
            "z": 0.0} for _ in range(300)]
    for p in pts:
        p["z"] = p["value"]
    lp = str(tmp_path / "a.las")
    zp = str(tmp_path / "a.zlidar")
    write_las([{**p} for p in pts], lp)
    write_zlidar(pts, zp)
    a = read_las(spark, lp).orderBy("point_id").toPandas()
    b = read_zlidar(spark, zp).orderBy("point_id").toPandas()
    # the quantized coordinates are identical between the two codecs
    assert np.array_equal(a["x"].to_numpy(), b["x"].to_numpy())
    assert np.array_equal(a["y"].to_numpy(), b["y"].to_numpy())
    assert np.array_equal(a["z"].to_numpy(), b["z"].to_numpy())


def test_surfer7_saga_roundtrip(spark):
    import shutil
    import tempfile

    import numpy as np

    from whitebox_tools_spark.functions.raster_math import GridMeta
    from whitebox_tools_spark.sources import formats as FF

    rng = np.random.RandomState(9)
    N = 15
    META = GridMeta(rows=N, columns=N, north=150.0, south=0.0, east=150.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    vals = rng.rand(N, N) * 100.0
    df = spark.createDataFrame(
        [(r, c, float(vals[r, c])) for r in range(N) for c in range(N)],
        "row long, col long, value double")
    d = tempfile.mkdtemp()
    try:
        FF.write_surfer7(df, META, f"{d}/a.grd")
        mid, m1 = FF.read_surfer7(spark, f"{d}/a.grd")
        assert (m1.rows, m1.columns, m1.west, m1.south) == (N, N, 0.0, 0.0)
        FF.write_saga(mid, m1, f"{d}/b")
        fin, m2 = FF.read_saga(spark, f"{d}/b")
        out = {(r["row"], r["col"]): r["value"] for r in fin.collect()}
        for r in range(N):
            for c in range(N):
                assert out[(r, c)] == vals[r, c], (r, c)  # f64 lossless
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("ptype,nbits", [("FLOAT", 32), ("FLOAT", 64),
                                         ("SIGNEDINT", 16),
                                         ("UNSIGNEDINT", 16)])
def test_esri_bil_roundtrip(spark, cells, ptype, nbits):
    df, vals = cells
    # unsigned pixel types can't represent the default -32768 sentinel:
    # the writer refuses (instead of silently wrapping the fill), so the
    # unsigned case carries an in-range nodata.
    meta_in = META
    if ptype == "UNSIGNEDINT":
        import dataclasses
        meta_in = dataclasses.replace(META, nodata=65535.0)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g")
        FM.write_esri_bil(df, meta_in, p, pixel_type=ptype, nbits=nbits)
        back, meta = FM.read_esri_bil(spark, p)
        assert meta.rows == 7 and meta.columns == 9
        assert abs(meta.north - 70.0) < 1e-9 and abs(meta.west - 0.0) < 1e-9
        assert abs(meta.resolution_x - 10.0) < 1e-9
        assert meta.nodata == meta_in.nodata
        assert np.array_equal(_collect(back), vals)


def test_esri_bil_rejects_unrepresentable_nodata(spark, cells):
    df, _vals = cells
    with tempfile.TemporaryDirectory() as d:
        with pytest.raises(ValueError, match="not representable"):
            FM.write_esri_bil(df, META, os.path.join(d, "g"),
                              pixel_type="UNSIGNEDINT", nbits=16)


def test_geotiff_multistrip_roundtrip(spark, cells):
    """block_rows smaller than the raster forces several strips, with and
    without per-strip DEFLATE; sparse input exercises the all-fill block
    synthesis for rows the executors never saw."""
    df, vals = cells
    with tempfile.TemporaryDirectory() as d:
        for compress in (False, True):
            p = os.path.join(d, f"g{int(compress)}.tif")
            FM.write_geotiff(df, META, p, compress=compress, block_rows=2)
            back, meta = FM.read_geotiff(spark, p)
            assert meta.rows == 7 and meta.columns == 9
            assert np.array_equal(_collect(back), vals)
        # sparse: only two rows present -> every other block is synthesized
        sparse = df.where("row IN (0, 6)")
        p = os.path.join(d, "sparse.tif")
        FM.write_geotiff(sparse, META, p, compress=True, block_rows=2)
        back, meta = FM.read_geotiff(spark, p)
        got = _collect(back)
        assert np.array_equal(got[0], vals[0]) and np.array_equal(got[6], vals[6])
        assert np.all(got[1:6] == -32768.0)


def test_write_lidar_tiles_roundtrip(spark, tmp_path):
    """Distributed per-tile egress: points partitioned by tile_id are
    written as one file per tile inside the executors; reading the
    directory back reproduces every point for both codecs."""
    from whitebox_tools_spark.sources.formats import (read_las, read_zlidar,
                                                      write_lidar_tiles)

    rng = np.random.RandomState(23)
    n = 1200
    rows = []
    for i in range(n):
        nret = int(rng.randint(1, 5))
        rows.append((
            i, float(rng.rand() * 500), float(rng.rand() * 500),
            float(rng.rand() * 80), int(rng.randint(0, 65536)),
            int(rng.randint(1, nret + 1)), nret, int(rng.randint(0, 8)),
            int(rng.randint(-30, 30)), int(rng.randint(0, 2)),
            int(rng.rand() < 0.1), 500.0 + i * 0.001, int(i % 4),
        ))
    df = spark.createDataFrame(
        rows, "point_id long, x double, y double, z double, intensity int, "
              "return_number int, num_returns int, classification int, "
              "scan_angle int, scan_direction int, edge_flag int, "
              "gps_time double, tile_id long")
    for codec, reader in (("las", read_las), ("zlidar", read_zlidar)):
        out = str(tmp_path / codec)
        manifest = write_lidar_tiles(df, out, codec=codec).orderBy("tile").toPandas()
        assert list(manifest["tile"]) == [0, 1, 2, 3]
        assert int(manifest["n_points"].sum()) == n
        assert all(os.path.exists(p) for p in manifest["path"])
        back = reader(spark, out).toPandas()
        assert len(back) == n
        want = sorted((round(r[1], 2), round(r[3], 2), r[7]) for r in rows)
        got = sorted(zip(back["x"].round(2), back["z"].round(2),
                         back["classification"]))
        assert want == got, codec


def test_write_shapefile_tiles_roundtrip(spark, tmp_path):
    """Per-tile shapefile egress: rect features split across 3 tiles,
    written executor-side, read back as one directory and every ring
    vertex recovered."""
    feats = []
    for i in range(9):
        x0, y0 = i * 10.0, i * 5.0
        ring = [{"x": x0, "y": y0}, {"x": x0 + 4.0, "y": y0},
                {"x": x0 + 4.0, "y": y0 + 3.0}, {"x": x0, "y": y0 + 3.0},
                {"x": x0, "y": y0}]
        feats.append((i, [(0, False, ring)], i % 3))
    df = spark.createDataFrame(
        feats,
        "shape_id long, parts array<struct<part_idx int, is_hole boolean, "
        "ring array<struct<x double, y double>>>>, tile_id long")
    out = str(tmp_path / "tiles")
    manifest = FM.write_shapefile_tiles(df, out).orderBy("tile").toPandas()
    assert list(manifest["tile"]) == [0, 1, 2]
    assert int(manifest["n_features"].sum()) == 9
    back = FM.read_shapefile(spark, out + "/*.shp").toPandas()
    assert len(back) == 9
    # every feature's ring area survives (orientation may flip to ESRI CW)
    areas = []
    for _, rec in back.iterrows():
        ring = [(v["x"], v["y"]) for v in rec["parts"][0]["ring"]]
        xs = np.array([p[0] for p in ring]); ys = np.array([p[1] for p in ring])
        areas.append(abs(float(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))) / 2.0)
    assert all(abs(a - 12.0) < 1e-9 for a in areas)
