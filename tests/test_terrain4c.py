"""Round-4c terrain/lidar quick wins."""

import numpy as np
import pytest

from whitebox_tools_spark.functions.raster_math import GridMeta
from whitebox_tools_spark.operators import focal as FO
from whitebox_tools_spark.operators import hydro as HY
from whitebox_tools_spark.operators import lidar as LI
from whitebox_tools_spark.operators import raster as R

META = GridMeta(rows=8, columns=8, north=80.0, south=0.0, east=80.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)


def _cells(spark, z):
    rows = [(r, c, float(z[r, c]))
            for r in range(z.shape[0]) for c in range(z.shape[1])]
    return spark.createDataFrame(rows, "row long, col long, value double")


def _asmap(df):
    return {(r["row"], r["col"]): r["value"] for r in df.collect()}


def test_elev_relative_to_min_max(spark):
    z = np.linspace(10, 90, 64).reshape(8, 8)
    out = _asmap(R.elev_relative_to_min_max(_cells(spark, z)))
    assert out[(0, 0)] == pytest.approx(0.0)
    assert out[(7, 7)] == pytest.approx(100.0)


def test_find_lowest_highest(spark):
    z = np.full((8, 8), 50.0)
    z[3, 4] = 5.0
    z[6, 1] = 95.0
    lo = R.find_lowest_or_highest_points(_cells(spark, z), META,
                                         "lowest").collect()[0]
    hi = R.find_lowest_or_highest_points(_cells(spark, z), META,
                                         "highest").collect()[0]
    assert lo["value"] == 5.0 and (lo["x"], lo["y"]) == (45.0, 45.0)
    assert hi["value"] == 95.0 and (hi["x"], hi["y"]) == (15.0, 15.0)


def test_find_ridges(spark):
    z = np.zeros((8, 8))
    z[4, :] = 10.0  # an east-west ridge line
    out = _asmap(FO.find_ridges(_cells(spark, z), META))
    for c in range(8):
        assert out[(4, c)] == 1.0
    assert out[(2, 2)] == 0.0


def test_elev_relative_to_watershed_minmax(spark):
    rng = np.random.RandomState(6)
    z = np.round(rng.uniform(10, 90, size=(8, 8)), 1)
    out = _asmap(HY.elev_relative_to_watershed_min_max(_cells(spark, z), META))
    assert len(out) == 64
    assert all(-1e-9 <= v <= 100.0 + 1e-9 for v in out.values())


def test_lidar_thin_high_density(spark):
    # 40 points stacked in one small area -> cap = density * res^2
    pts = [(i, 5.0 + (i % 3) * 0.1, 5.0 + (i // 3) * 0.1, float(i))
           for i in range(40)]
    df = spark.createDataFrame(
        pts, "record_num long, x double, y double, value double")
    out = LI.lidar_thin_high_density(df, 20.0, density=0.01).collect()
    # cap = 0.01 * 400 = 4; all 40 points fall in one-ish cell
    assert 0 < len(out) <= 8
    kept = sorted(r["record_num"] for r in out)
    assert kept[0] == 0  # first-by-order survives


def test_lidar_info(spark):
    pts = [(1, 0.0, 0.0, 10.0), (2, 5.0, 7.0, 30.0)]
    df = spark.createDataFrame(
        pts, "record_num long, x double, y double, value double")
    row = LI.lidar_info(df).collect()[0]
    assert row["num_points"] == 2
    assert row["min_z"] == 10.0 and row["max_z"] == 30.0
    assert row["mean_z"] == 20.0


def test_highpass_bilateral(spark):
    # constant image -> bilateral returns the constant -> highpass 0
    z = np.full((8, 8), 42.0)
    out = _asmap(FO.highpass_bilateral_filter(_cells(spark, z)))
    assert all(v == pytest.approx(0.0, abs=1e-9) for v in out.values())


def test_anvad_flat_and_ramp(spark):
    # flat plane: raw and smoothed normals identical -> 0 everywhere
    flat = np.full((8, 8), 5.0)
    out = _asmap(FO.average_normal_vector_angular_deviation(
        _cells(spark, flat), META, filter_size=3))
    assert all(v == pytest.approx(0.0, abs=1e-6) for v in out.values())
    # bumpy surface: strictly positive somewhere
    rng = np.random.RandomState(44)
    z = rng.uniform(0, 50, size=(8, 8))
    out2 = _asmap(FO.average_normal_vector_angular_deviation(
        _cells(spark, z), META, filter_size=3))
    assert max(out2.values()) > 0.1


def test_long_profile_from_points(spark):
    rng = np.random.RandomState(50)
    z = np.round(rng.uniform(10, 90, size=(8, 8)), 1)
    seeds = spark.createDataFrame([(7, 1, 1)], "seed_id long, row long, col long")
    rows = HY.long_profile_from_points(_cells(spark, z), META, seeds).collect()
    # path cells are distinct, start at the seed with dist 0, and dist
    # strictly increases along the walk
    assert any(r["row"] == 1 and r["col"] == 1 and r["dist"] == 0.0
               for r in rows)
    dists = sorted(r["dist"] for r in rows)
    assert len(set(dists)) == len(dists)
    for r in rows:
        assert r["z"] == z[r["row"], r["col"]]


def test_deviation_from_regional_direction(spark):
    from whitebox_tools_spark.operators import vector_ops as VO

    def rect(sid, cx, cy, w, h, ang_deg):
        import math
        c, s = math.cos(math.radians(ang_deg)), math.sin(math.radians(ang_deg))
        pts = [(-w / 2, -h / 2), (w / 2, -h / 2), (w / 2, h / 2),
               (-w / 2, h / 2), (-w / 2, -h / 2)]
        ring = [{"x": cx + x * c - y * s, "y": cy + x * s + y * c}
                for x, y in pts]
        return (sid, [(0, False, ring)])

    # three long rectangles at 30 degrees, one deviant at 120
    feats = spark.createDataFrame(
        [rect(1, 0, 0, 40, 4, 30), rect(2, 100, 0, 40, 4, 30),
         rect(3, 0, 100, 40, 4, 30), rect(4, 100, 100, 40, 4, 120)],
        "shape_id long, parts array<struct<part_idx int, is_hole boolean, "
        "ring array<struct<x double, y double>>>>")
    out = {r["shape_id"]: r["deviation"] for r in
           VO.deviation_from_regional_direction(feats, 0.5).collect()}
    # the three aligned rectangles deviate little; the rotated one a lot
    assert out[1] < 20.0 and out[2] < 20.0 and out[3] < 20.0
    assert out[4] > 60.0


def test_signature_matches_multiscale_argmax(spark):
    """The per-scale signature values must reproduce the O-gated
    multiscale argmax at the same cells."""
    rng = np.random.RandomState(77)
    z = np.round(rng.uniform(0, 100, size=(8, 8)), 1)
    cells = _cells(spark, z)
    pts = spark.createDataFrame(
        [(1, 25.0, 55.0), (2, 45.0, 35.0)],
        "point_id long, x double, y double")
    sig = FO.multiscale_roughness_signature(cells, META, pts, [1, 2])
    rows = sig.collect()
    assert len(rows) == 4  # 2 points x 2 scales
    best = {}
    for r in rows:
        cur = best.get(r["point_id"])
        if cur is None or r["value"] > cur[0] + 1e-12:
            best[r["point_id"]] = (r["value"], r["scale"])
    ms = {(r["row"], r["col"]): (r["value"], r["scale"])
          for r in FO.multiscale_roughness(cells, META, [1, 2]).collect()}
    for pid, (x, y) in ((1, (25.0, 55.0)), (2, (45.0, 35.0))):
        row = int((80.0 - y) / 10.0)
        col = int(x / 10.0)
        assert best[pid][0] == pytest.approx(ms[(row, col)][0], abs=1e-9)

    dev_sig = FO.max_elev_dev_signature(cells, META, pts, [1, 2])
    got = {(r["point_id"], r["scale"]): r["value"] for r in dev_sig.collect()}
    assert len(got) == 4


def test_hypsometrically_tinted_hillshade(spark):
    rng = np.random.RandomState(99)
    z = np.round(rng.uniform(0, 200, size=(8, 8)), 1)
    rows = FO.hypsometrically_tinted_hillshade(_cells(spark, z), META) \
        .collect()
    assert len(rows) == 64
    for r in rows:
        for ch in ("red", "green", "blue"):
            assert 0 <= r[ch] <= 255
        packed = int(r["value"])
        assert packed & 0xFF == r["red"]
        assert (packed >> 8) & 0xFF == r["green"]
        assert (packed >> 16) & 0xFF == r["blue"]
        assert (packed >> 24) & 0xFF == 255
    # low-elevation cells tint toward the palette's green first stop:
    # find the lowest and highest cells and compare green dominance
    by_cell = {(r["row"], r["col"]): r for r in rows}
    lo = min(by_cell, key=lambda k: z[k])
    hi = max(by_cell, key=lambda k: z[k])
    assert by_cell[lo]["green"] >= by_cell[lo]["red"]  # greenish lowland
