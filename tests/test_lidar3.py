"""Round-3 LiDAR suite gates: normals parity, normalize planar
exactness, DSM fill, overlap classification, tile selection."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators import lidar as LI

N = 20
META = GridMeta(rows=N, columns=N, north=200.0, south=0.0, east=200.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)


@pytest.fixture(scope="module")
def cloud(spark):
    rng = np.random.RandomState(21)
    n = 500
    xs = rng.rand(n) * 200.0
    ys = rng.rand(n) * 200.0
    ground = 5.0 + 0.02 * xs + 0.01 * ys
    is_ground = rng.rand(n) < 0.6
    zs = np.where(is_ground, ground, ground + rng.rand(n) * 20.0 + 2.0)
    cls = np.where(is_ground, 2, 1)
    rows = [(int(i), float(x), float(y), float(z), int(c), int(i % 3),
             int(i % 25 - 12))
            for i, (x, y, z, c) in enumerate(zip(xs, ys, zs, cls))]
    df = spark.createDataFrame(
        rows, "record_num long, x double, y double, value double, "
              "classification int, flightline long, scan_angle int")
    return df, xs, ys, zs, cls


def test_point_normals_numpy_parity(spark, cloud):
    df, xs, ys, zs, _ = cloud
    radius = 30.0
    out = {r["record_num"]: (r["nx"], r["ny"], r["nz"])
           for r in LI.lidar_point_normals(df, radius=radius).collect()}
    P = np.column_stack([xs, ys, zs])
    for i in list(out)[:40]:
        d2 = (xs - xs[i]) ** 2 + (ys - ys[i]) ** 2
        nb = P[(d2 <= radius * radius)]
        cov = np.cov(nb.T, bias=True)
        w, v = np.linalg.eigh(cov)
        n = v[:, 0]
        if n[2] < 0:
            n = -n
        got = np.array(out[i])
        assert np.allclose(got, n, atol=1e-6), (i, got, n)


def test_normalize_lidar_planar_ground(spark, cloud):
    df, xs, ys, zs, cls = cloud
    out = {r["record_num"]: r["hag"]
           for r in LI.normalize_lidar(df, META, tile=10).collect()}
    ground = 5.0 + 0.02 * xs + 0.01 * ys
    # interior points over a planar ground TIN: hag == z - plane exactly
    interior = ((xs > 30) & (xs < 170) & (ys > 30) & (ys < 170))
    checked = 0
    for i in range(len(xs)):
        if not interior[i]:
            continue
        want = zs[i] - ground[i]
        if abs(out[i] - want) < 1e-6:
            checked += 1
    n_int = int(interior.sum())
    assert checked > 0.9 * n_int, (checked, n_int)
    # ground points themselves: hag ~ 0
    gsel = [i for i in range(len(xs)) if cls[i] == 2 and interior[i]]
    assert all(abs(out[i]) < 1e-6 for i in gsel[:50])


def test_lidar_dsm_direct_cells_are_max(spark, cloud):
    df, xs, ys, zs, _ = cloud
    out = {(r["row"], r["col"]): r["value"]
           for r in LI.lidar_dsm(df, META, first_returns_only=False).collect()}
    # per-cell max parity on cells that contain points
    cellmax = {}
    for x, y, z in zip(xs, ys, zs):
        r = int((META.north - y) / META.resolution_y)
        c = int((x - META.west) / META.resolution_x)
        if 0 <= r < N and 0 <= c < N:
            cellmax[(r, c)] = max(cellmax.get((r, c), -1e18), z)
    for k, v in cellmax.items():
        assert abs(out[k] - v) < 1e-9, (k, out[k], v)
    # the DSM covers (nearly) the whole grid incl. pointless cells
    assert len(out) > 0.9 * N * N


def test_classify_overlap_rule(spark, cloud):
    df, *_ = cloud
    out = LI.classify_overlap_points(df, 50.0).collect()
    # every cell keeps at least one non-overlap flightline
    from collections import defaultdict
    bycell = defaultdict(set)
    for r in out:
        cx = int(np.floor(r["x"] / 25.0))
        cy = int(np.floor(r["y"] / 25.0))
        bycell[(cx, cy)].add((r["flightline"], r["classification"] == 12))
    for cell, fls in bycell.items():
        keepers = {fl for fl, ov in fls if not ov}
        assert len(keepers) == 1, (cell, fls)


def test_select_tiles_analytic(spark):
    tiles = spark.range(4).selectExpr(
        "id AS tile_id",
        "CAST(id % 2 AS DOUBLE) * 10.0 AS xmin",
        "CAST(id DIV 2 AS DOUBLE) * 10.0 AS ymin",
        "CAST(id % 2 + 1 AS DOUBLE) * 10.0 AS xmax",
        "CAST(id DIV 2 + 1 AS DOUBLE) * 10.0 AS ymax")
    # triangle fully inside tile 0, crossing into tile 1
    rows = [(0, {"xmin": 2.0, "ymin": 2.0, "xmax": 14.0, "ymax": 8.0},
             [{"part_idx": 0, "is_hole": False,
               "ring": [{"x": 2.0, "y": 2.0}, {"x": 14.0, "y": 2.0},
                        {"x": 2.0, "y": 8.0}, {"x": 2.0, "y": 2.0}]}])]
    polys = spark.createDataFrame(
        rows, "polygon_id long, "
              "bbox struct<xmin:double,ymin:double,xmax:double,ymax:double>, "
              "parts array<struct<part_idx:int,is_hole:boolean,"
              "ring:array<struct<x:double,y:double>>>>")
    got = {r["tile_id"] for r in LI.select_tiles_by_polygon(tiles, polys).collect()}
    assert got == {0, 1}


def test_individual_tree_detection_analytic(spark):
    # two "trees": tall point clusters 30 m apart; each cluster's top is
    # the unique local max within radius 10
    rows = []
    rid = 0
    for cx, topz in ((20.0, 15.0), (50.0, 12.0)):
        for dx, dz in ((0.0, 0.0), (1.0, -3.0), (-1.5, -4.0), (0.5, -2.0)):
            rows.append((rid, cx + dx, 50.0, topz + dz))
            rid += 1
    # low shrubs below min_height
    rows.append((rid, 35.0, 50.0, 0.5))
    df = spark.createDataFrame(rows, "record_num long, x double, y double, value double")
    tops = {r["record_num"]
            for r in LI.individual_tree_detection(df, min_search_radius=10.0,
                                                  min_height=1.0).collect()}
    assert tops == {0, 4}


def test_lidar_classify_subset(spark, cloud):
    df, xs, ys, zs, cls = cloud
    subset = df.where("record_num % 5 = 0").select("x", "y", "value")
    out = {r["record_num"]: r["classification"]
           for r in LI.lidar_classify_subset(df, subset, subset_class=7).collect()}
    for i in range(len(xs)):
        want = 7 if i % 5 == 0 else cls[i]
        assert out[i] == want, i


def test_lidar_rooftop_analysis_shapes(spark):
    import numpy as np
    rng = np.random.RandomState(31)
    # one building footprint with a flat roof at z=10
    rows = []
    for i in range(120):
        x = 10.0 + rng.rand() * 8.0
        y = 10.0 + rng.rand() * 8.0
        rows.append((i, x, y, 10.0 + rng.rand() * 0.05))
    # points outside the footprint
    for i in range(120, 160):
        rows.append((i, 50.0 + rng.rand() * 5.0, 50.0, rng.rand()))
    pts = spark.createDataFrame(rows, "record_num long, x double, y double, value double")
    polys = spark.createDataFrame(
        [(1, {"xmin": 9.0, "ymin": 9.0, "xmax": 19.0, "ymax": 19.0},
          [{"part_idx": 0, "is_hole": False,
            "ring": [{"x": 9.0, "y": 9.0}, {"x": 19.0, "y": 9.0},
                     {"x": 19.0, "y": 19.0}, {"x": 9.0, "y": 19.0},
                     {"x": 9.0, "y": 9.0}]}])],
        "polygon_id long, "
        "bbox struct<xmin:double,ymin:double,xmax:double,ymax:double>, "
        "parts array<struct<part_idx:int,is_hole:boolean,"
        "ring:array<struct<x:double,y:double>>>>")
    out = LI.lidar_rooftop_analysis(pts, polys, radius=3.0).collect()
    ids = {r["record_num"] for r in out}
    assert ids == set(range(120))  # only building points
    facets = {r["facet_id"] for r in out}
    assert len(facets) == 1  # one flat roof facet


def test_lidar_hillshade_numpy_parity(spark, cloud):
    """Hillshade = exact reference formula applied to the (already
    parity-gated) PCA normals, recomputed here in numpy."""
    df, xs, ys, zs, _ = cloud
    radius, azim, alt = 30.0, 315.0, 30.0
    normals = {r["record_num"]: (r["nx"], r["ny"], r["nz"])
               for r in LI.lidar_point_normals(df, radius=radius).collect()}
    out = {r["record_num"]: r["shade"]
           for r in LI.lidar_hillshade(df, azimuth=azim, altitude=alt,
                                       radius=radius).collect()}
    az = np.radians(azim - 90.0)
    st, ct = np.sin(np.radians(alt)), np.cos(np.radians(alt))
    for i in range(len(xs)):
        a, b, c = normals[i]
        if c == 0.0:
            want = 127 * 256
        else:
            fx, fy = -a / c, -b / c
            if fx == 0.0:
                want = int(np.floor(0.5 * 255.0)) * 256
            else:
                tan_slope = np.sqrt(fx * fx + fy * fy)
                aspect = np.radians(180.0 - np.degrees(np.arctan(fy / fx))
                                    + 90.0 * np.sign(fx))
                hs = (tan_slope / np.sqrt(1.0 + tan_slope ** 2)
                      * (st / tan_slope - ct * np.sin(az - aspect)))
                want = int(np.floor(max(hs * 255.0, 0.0))) * 256
        assert out[i] == want, i


def test_lidar_histogram_reference_parity(spark, cloud):
    """The two-pass clip + rebin logic, re-implemented directly from
    lidar_histogram.rs in numpy, bin for bin."""
    df, xs, ys, zs, _ = cloud
    clip = 2.0
    got = {int(r["bin"]): (r["lo"], r["hi"], int(r["n"]))
           for r in LI.lidar_histogram(df, clip_percent=clip).collect()}
    v = zs
    n = len(v)
    vmin, vmax = float(v.min()), float(v.max())
    bw0 = (vmax - vmin + 0.00001) / 1000.0
    freq = np.bincount(np.floor((v - vmin) / bw0).astype(int), minlength=1000)
    thresh = int(n * (clip / 100.0))
    cum, lower = 0, 0
    for b in range(1000):
        cum += freq[b]
        if cum > thresh:
            lower = b
            break
    cum, upper = 0, 0
    for b in range(999, -1, -1):
        cum += freq[b]
        if cum > thresh:
            upper = b
            break
    nmin, nmax = vmin, vmax
    if vmin < vmin + lower * bw0:
        nmin = vmin + lower * bw0
    if vmax > vmin + upper * bw0 + bw0:
        nmax = vmin + upper * bw0 + bw0
    if nmin > nmax:
        nmin, nmax = nmax, nmin
    nbins = int(np.ceil(np.log2(n))) + 1
    bw = (nmax - nmin + 0.00001) / nbins
    bins = np.floor((v - nmin) / bw).astype(int)
    bins = bins[(bins >= 0) & (bins < nbins)]
    want = np.bincount(bins, minlength=nbins)
    assert len(got) == nbins
    for b in range(nbins):
        assert got[b][2] == want[b], b
        assert abs(got[b][0] - (nmin + b * bw)) < 1e-9


def test_segmentation_based_filter_scene(spark):
    """Flat ground + a raised plateau: the top-hat residual isolates the
    plateau, seeds grow across the flat ground, and the plateau points
    classify off-terrain (1) while ground stays 2."""
    rng = np.random.RandomState(5)
    pts = []
    i = 0
    for gx in range(20):
        for gy in range(20):
            x, y = gx * 5.0 + 1.0, gy * 5.0 + 1.0
            on_plateau = 30.0 <= x <= 60.0 and 30.0 <= y <= 60.0
            z = 10.0 + (8.0 if on_plateau else 0.0)
            pts.append((i, float(x), float(y), float(z), on_plateau))
            i += 1
    df = spark.createDataFrame(
        [(p[0], p[1], p[2], p[3]) for p in pts],
        "record_num long, x double, y double, value double")
    out = {r["record_num"]: r["classification"]
           for r in LI.lidar_segmentation_based_filter(
               df, radius=8.0, norm_diff=5.0, maxzdiff=1.0).collect()}
    for pid, _x, _y, _z, plateau in pts:
        assert out[pid] == (1 if plateau else 2), (pid, plateau)
    kept = LI.lidar_segmentation_based_filter(
        df, radius=8.0, norm_diff=5.0, maxzdiff=1.0, classify=False)
    assert kept.count() == sum(1 for p in pts if not p[4])


def test_point_normals_degenerate_isolated_point(spark):
    """An isolated point (cov = 0, p2 = 0) has no preferred plane; the
    closed-form kernel pins the convention (0, 0, 1)."""
    df = spark.createDataFrame(
        [(0, 0.0, 0.0, 5.0), (1, 500.0, 500.0, 9.0)],
        "record_num long, x double, y double, value double")
    out = {r["record_num"]: (r["nx"], r["ny"], r["nz"])
           for r in LI.lidar_point_normals(df, radius=2.0).collect()}
    assert out[0] == (0.0, 0.0, 1.0)
    assert out[1] == (0.0, 0.0, 1.0)
