"""Round-4 continuation named ops: CountIf / MultiplyOverlay /
IntegerDivision / ModifyNoDataValue / ShapeComplexityIndex(Raster) /
AttributeHistogram / LidarPointStats / transcodes / ConvertRasterFormat.
Each Spark plan is checked against a direct numpy/pandas transcription
of the reference tool's per-cell rule."""

import math

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators import data_tools as DT
from whitebox_tools_spark.operators import lidar as LI
from whitebox_tools_spark.operators import overlay as OV
from whitebox_tools_spark.operators import raster as R
from whitebox_tools_spark.operators import vector_ops as VO

FEAT_SCHEMA = ("shape_id long, parts array<struct<part_idx int, is_hole boolean, "
               "ring array<struct<x double, y double>>>>")


def _cells(spark, vals):
    rows = [(r, c, float(v)) for r, row in enumerate(vals) for c, v in enumerate(row)]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _asmap(df):
    return {(r["row"], r["col"]): r["value"] for r in df.collect()}


def test_count_if(spark):
    a = _cells(spark, [[5.0, 1.0], [5.0, 5.0]])
    b = _cells(spark, [[5.0, 5.0], [2.0, 5.0]])
    c = _cells(spark, [[0.0, 5.0], [5.0, 3.0]])
    out = _asmap(OV.count_if([a, b, c], 5.0))
    assert out == {(0, 0): 2.0, (0, 1): 2.0, (1, 0): 2.0, (1, 1): 2.0}


def test_multiply_overlay(spark):
    a = _cells(spark, [[2.0, 3.0]])
    b = _cells(spark, [[4.0, -1.0]])
    c = _cells(spark, [[0.5, 2.0]])
    out = _asmap(OV.multiply_overlay([a, b, c]))
    assert out == {(0, 0): 4.0, (0, 1): -6.0}
    # absent cell in one layer -> no output row (nodata semantics)
    d = spark.createDataFrame([(0, 0, 10.0)], "row long, col long, value double")
    out2 = _asmap(OV.multiply_overlay([a, d]))
    assert out2 == {(0, 0): 20.0}


def test_integer_division(spark):
    a = _cells(spark, [[7.0, -7.0, 9.0, 4.0]])
    b = _cells(spark, [[2.0, 2.0, 0.0, -3.0]])
    out = _asmap(R.integer_division(a, b))
    # trunc toward zero; division by zero -> nodata (absent)
    assert out == {(0, 0): 3.0, (0, 1): -3.0, (0, 3): -1.0}


def test_modify_nodata_value(spark):
    a = _cells(spark, [[0.0, 5.0, 0.0]])
    out = _asmap(R.modify_nodata_value(a, 0.0, -999.0))
    assert out == {(0, 0): -999.0, (0, 1): 5.0, (0, 2): -999.0}


def test_shape_complexity_index_raster(spark):
    # a solid 3x4 rectangle of id 1: entries = h + w -> SCI exactly 1.0
    grid = np.zeros((8, 8))
    grid[2:5, 1:5] = 1.0
    # an L-shaped patch of id 2: more transect entries than h + w
    grid[6, 0:5] = 2.0
    grid[5, 4] = 2.0
    df = _cells(spark, grid)
    out = {(r["row"], r["col"]): r["value"]
           for r in R.shape_complexity_index_raster(df).collect()}
    rect_vals = {v for (rr, cc), v in out.items() if grid[rr][cc] == 1.0}
    assert rect_vals == {1.0}
    # L patch: horizontal entries: row6 -> 1, row5 -> 1; vertical:
    # cols 0..4 of row6 -> 5, (5,4) has (4,4)=0 above -> entry, but
    # (6,4) has (5,4)=2 above -> no entry. total = 2 + 5 = 7? recompute:
    # horizontal (west != val): (6,0) yes, (5,4) yes -> 2
    # vertical (north != val): (6,0..3) yes (4), (6,4) north=(5,4)=2 no,
    # (5,4) north=(4,4)=0 yes -> 5. entries=7, h=2, w=5 -> 1.0
    l_vals = {v for (rr, cc), v in out.items() if grid[rr][cc] == 2.0}
    assert l_vals == {7.0 / 7.0}


def test_shape_complexity_index_vector(spark):
    # convex rectangle -> hull == shape -> SCI 0
    rect = [(0.0, 0.0), (10.0, 0.0), (10.0, 6.0), (0.0, 6.0), (0.0, 0.0)]
    # concave L: area 3/4 of its 10x10 hull bounding triangle-cut shape
    ell = [(0.0, 0.0), (10.0, 0.0), (10.0, 5.0), (5.0, 5.0), (5.0, 10.0),
           (0.0, 10.0), (0.0, 0.0)]
    feats = spark.createDataFrame(
        [(1, [{"part_idx": 0, "is_hole": False,
               "ring": [{"x": x, "y": y} for x, y in rect]}]),
         (2, [{"part_idx": 0, "is_hole": False,
               "ring": [{"x": x, "y": y} for x, y in ell]}])],
        FEAT_SCHEMA)
    out = {r["shape_id"]: r["complexity"]
           for r in VO.shape_complexity_index(feats).collect()}
    assert abs(out[1]) < 1e-12
    # L area = 75; hull = rect 10x10 minus triangle ((10,5),(5,10),(10,10))
    # hull vertices: (0,0),(10,0),(10,5),(5,10),(0,10) -> area 87.5
    assert abs(out[2] - (1.0 - 75.0 / 87.5)) < 1e-12


def test_attribute_histogram(spark):
    vals = [float(v) for v in [1, 2, 2, 3, 5, 8, 13, 21, 34, 55]]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r["bin"]: r["n"] for r in DT.attribute_histogram(df, "v").collect()}
    n = len(vals)
    num_bins = int(math.ceil(math.log2(n))) + 1
    width = (max(vals) - min(vals) + 0.00001) / num_bins
    exp = {}
    for v in vals:
        b = int(math.floor((v - min(vals)) / width))
        exp[b] = exp.get(b, 0) + 1
    assert out == exp


META4 = GridMeta(rows=4, columns=4, north=40.0, south=0.0, east=40.0,
                 west=0.0, resolution_x=10.0, resolution_y=10.0)


def _lidar_fixture(spark):
    rows = []
    rng = np.random.RandomState(7)
    for i in range(200):
        x = float(rng.uniform(0.5, 39.5))
        y = float(rng.uniform(0.5, 39.5))
        z = float(rng.uniform(0, 50))
        nr = int(i % 3 + 1)
        rn = int(i % nr + 1)
        rows.append((i, x, y, z, int(i % 256), rn, nr, int(i % 8)))
    return spark.createDataFrame(
        rows, "record_num long, x double, y double, value double, "
        "intensity int, return_number int, num_returns int, "
        "classification int"), rows


def test_lidar_point_stats(spark):
    df, rows = _lidar_fixture(spark)
    out = {(r["row"], r["col"]): r for r in
           LI.lidar_point_stats(df, META4).collect()}
    import collections
    per_cell = collections.defaultdict(list)
    for rec in rows:
        rr = int((40.0 - rec[2]) / 10.0)
        cc = int(rec[1] / 10.0)
        per_cell[(rr, cc)].append(rec)
    assert set(out) == set(per_cell)
    for key, pts in per_cell.items():
        got = out[key]
        assert got["num_points"] == len(pts)
        pulses = sum(1 for p in pts if p[5] == 1)
        assert got["num_pulses"] == pulses
        zs = [p[3] for p in pts]
        assert abs(got["z_range"] - (max(zs) - min(zs))) < 1e-9
        iv = [p[4] for p in pts]
        assert got["intensity_range"] == max(iv) - min(iv)
        if pulses:
            assert abs(got["returns_per_pulse"] - len(pts) / pulses) < 1e-12


def test_predominant_class(spark):
    df, rows = _lidar_fixture(spark)
    out = {(r["row"], r["col"]): r["value"] for r in
           LI.predominant_class(df, META4).collect()}
    import collections
    per_cell = collections.defaultdict(list)
    for rec in rows:
        rr = int((40.0 - rec[2]) / 10.0)
        cc = int(rec[1] / 10.0)
        per_cell[(rr, cc)].append(rec[7])
    for key, classes in per_cell.items():
        cnt = collections.Counter(classes)
        best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        assert out[key] == best


def test_lidar_gridding_wrappers_match_kernel(spark):
    """The named LiDAR wrappers must equal the shared kNN kernels run
    directly on the selected column / filtered returns."""
    from whitebox_tools_spark.operators import knn as K

    df, _rows = _lidar_fixture(spark)
    w = LI.lidar_idw_interpolation(df, META4, parameter="intensity", k=3,
                                   returns="first", radius=30.0)
    direct = K.idw_interpolation(
        df.where("return_number = 1")
          .withColumn("__v", df["intensity"].cast("double")),
        META4, k=3, value_col="__v", radius=30.0)
    got = {(r["row"], r["col"]): r["value"] for r in w.collect()}
    exp = {(r["row"], r["col"]): r["value"] for r in direct.collect()}
    assert got == exp

    w2 = LI.lidar_nearest_neighbour_gridding(df, META4, parameter="class",
                                             radius=30.0)
    direct2 = K.nearest_neighbour_gridding(
        df.withColumn("__v", df["classification"].cast("double")),
        META4, value_col="__v", radius=30.0)
    got2 = {(r["row"], r["col"]): r["value"] for r in w2.collect()}
    exp2 = {(r["row"], r["col"]): r["value"] for r in direct2.collect()}
    assert got2 == exp2


def test_las_ascii_roundtrip(spark, tmp_path):
    from whitebox_tools_spark.sources import formats as FF
    from whitebox_tools_spark.sources import transcode as TC

    pts = [{"point_id": i, "x": round(1.25 * i, 2), "y": round(2.5 * i, 2),
            "z": round(0.33 * i, 2), "intensity": i % 100,
            "return_number": i % 2 + 1, "num_returns": 2,
            "classification": i % 5, "scan_angle": i % 15}
           for i in range(50)]
    FF.write_las(pts, str(tmp_path / "a.las"))
    n = TC.las_to_ascii(spark, str(tmp_path / "a.las"), str(tmp_path / "a.csv"))
    assert n == 50
    header = open(tmp_path / "a.csv").readline().strip()
    assert header == "X,Y,Z,INTENSITY,CLASS,RETURN,NUM_RETURN,SCAN_ANGLE"
    TC.ascii_to_las(spark, str(tmp_path / "a.csv"), str(tmp_path / "b.las"))
    back = {r["point_id"]: r for r in
            FF.read_las(spark, str(tmp_path / "b.las")).collect()}
    assert len(back) == 50
    for p in pts:
        b = back[p["point_id"]]
        # LAS 0.01 scale: 2-decimal coords survive exactly
        assert abs(b["x"] - p["x"]) < 1e-9
        assert abs(b["z"] - p["z"]) < 1e-9
        assert b["intensity"] == p["intensity"]
        assert b["classification"] == p["classification"]
        assert b["return_number"] == p["return_number"]
        assert b["num_returns"] == p["num_returns"]
        assert b["scan_angle"] == p["scan_angle"]


def test_las_to_shapefile_point_and_multipoint(spark, tmp_path):
    from whitebox_tools_spark.sources import formats as FF
    from whitebox_tools_spark.sources import transcode as TC

    pts = [{"point_id": i, "x": 10.0 + i, "y": 20.0 + 2 * i, "z": float(i),
            "intensity": i, "classification": 2} for i in range(10)]
    FF.write_las(pts, str(tmp_path / "a.las"))
    n = TC.las_to_shapefile(spark, str(tmp_path / "a.las"),
                            str(tmp_path / "p.shp"))
    assert n == 10
    feats = FF.read_shapefile(spark, str(tmp_path / "p.shp")).collect()
    assert len(feats) == 10
    assert all(f["shape_type"] == 1 for f in feats)
    got_xy = sorted((f["parts"][0]["ring"][0]["x"],
                     f["parts"][0]["ring"][0]["y"]) for f in feats)
    assert got_xy == sorted((p["x"], p["y"]) for p in pts)
    attrs = FF.read_dbf(spark, str(tmp_path / "p.dbf")).collect()
    assert {r["CLASS"] for r in attrs} == {2}

    nm = TC.las_to_multipoint_shapefile(spark, str(tmp_path / "a.las"),
                                        str(tmp_path / "m.shp"))
    assert nm == 1  # one MultiPoint record per source file
    mfeats = FF.read_shapefile(spark, str(tmp_path / "m.shp")).collect()
    assert len(mfeats) == 1 and mfeats[0]["shape_type"] == 8
    assert len(mfeats[0]["parts"][0]["ring"]) == 10


def test_las_zlidar_directory_transcode(spark, tmp_path):
    from whitebox_tools_spark.sources import formats as FF
    from whitebox_tools_spark.sources import transcode as TC

    for t in range(3):
        pts = [{"point_id": i, "x": 100.0 * t + i, "y": 50.0 + i,
                "z": float(i % 7), "intensity": i % 30,
                "classification": i % 4}
               for i in range(40)]
        FF.write_las(pts, str(tmp_path / f"t{t}.las"))
    man = TC.las_to_zlidar(spark, str(tmp_path / "*.las"),
                           str(tmp_path / "zl")).collect()
    assert len(man) == 3 and all(m["n_points"] == 40 for m in man)
    man2 = TC.zlidar_to_las(spark, str(tmp_path / "zl/*.zlidar"),
                            str(tmp_path / "las2")).collect()
    assert len(man2) == 3
    orig = FF.read_las(spark, str(tmp_path / "*.las")) \
        .selectExpr("x", "y", "z", "intensity", "classification").collect()
    back = FF.read_las(spark, str(tmp_path / "las2/*.las")) \
        .selectExpr("x", "y", "z", "intensity", "classification").collect()
    assert sorted(map(tuple, orig)) == sorted(map(tuple, back))


def test_convert_raster_format_chain(spark, tmp_path):
    from whitebox_tools_spark.sources import formats as FF
    from whitebox_tools_spark.sources import transcode as TC

    vals = np.arange(36, dtype=float).reshape(6, 6) * 1.5
    meta = GridMeta(rows=6, columns=6, north=60.0, south=0.0, east=60.0,
                    west=0.0, resolution_x=10.0, resolution_y=10.0)
    df = _cells(spark, vals)
    FF.write_geotiff(df, meta, str(tmp_path / "a.tif"))
    TC.convert_raster_format(spark, str(tmp_path / "a.tif"),
                             str(tmp_path / "b.grd"))
    TC.convert_raster_format(spark, str(tmp_path / "b.grd"),
                             str(tmp_path / "c.tif"))
    out, m2 = FF.read_geotiff(spark, str(tmp_path / "c.tif"))
    got = _asmap(out)
    assert got == {(r, c): vals[r, c] for r in range(6) for c in range(6)}
    with pytest.raises(ValueError):
        TC.convert_raster_format(spark, str(tmp_path / "a.xyz"),
                                 str(tmp_path / "b.grd"))
