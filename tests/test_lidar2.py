"""Ground filter / segmentation / RANSAC gates over synthetic scenes
with known structure."""

import numpy as np
import pytest

import whitebox_tools_spark.operators.lidar as LI


@pytest.fixture(scope="module")
def scene(spark):
    """A flat ground plane (z=0.2*x) with two elevated boxes and one
    tilted roof plane."""
    rng = np.random.default_rng(41)
    rows = []
    rid = 0
    for _ in range(400):
        x, y = rng.random() * 100.0, rng.random() * 100.0
        rows.append((rid, x, y, 0.2 * x))
        rid += 1
    # box 1: points 5 m above ground over a small footprint
    for _ in range(40):
        x, y = 20.0 + rng.random() * 5.0, 20.0 + rng.random() * 5.0
        rows.append((rid, x, y, 0.2 * x + 5.0))
        rid += 1
    # box 2
    for _ in range(40):
        x, y = 70.0 + rng.random() * 5.0, 60.0 + rng.random() * 5.0
        rows.append((rid, x, y, 0.2 * x + 6.0))
        rid += 1
    df = spark.createDataFrame(rows, "record_num long, x double, y double, value double")
    n_ground = 400
    return df, n_ground, rid


def test_ground_point_filter(spark, scene):
    df, n_ground, n_all = scene
    out = {r["record_num"]: r["classification"]
           for r in LI.lidar_ground_point_filter(df, radius=4.0,
                                                 height_threshold=2.0,
                                                 slope_threshold=30.0).collect()}
    assert len(out) == n_all
    # every box point with a ground neighbor in range is off-ground;
    # all true ground points stay class 2
    ground_ids = set(range(n_ground))
    for pid, cls in out.items():
        if pid in ground_ids:
            assert cls == 2, pid
    off = [pid for pid, cls in out.items() if cls == 1]
    assert len(off) >= 60  # most box points are caught


def test_segmentation_separates_planes(spark, scene):
    df, n_ground, n_all = scene
    seg = {r["record_num"]: r["segment_id"]
           for r in LI.lidar_segmentation(df, radius=6.0, norm_diff=15.0,
                                          maxzdiff=1.5).collect()}
    assert len(seg) == n_all
    ground_segs = {seg[i] for i in range(n_ground)}
    box1 = {seg[i] for i in range(n_ground, n_ground + 40)}
    box2 = {seg[i] for i in range(n_ground + 40, n_all)}
    # the dominant ground segment is disjoint from box segments
    from collections import Counter

    dom_ground = Counter(seg[i] for i in range(n_ground)).most_common(1)[0][0]
    assert dom_ground not in box1 and dom_ground not in box2


def test_ransac_planes_finds_planar_points(spark, scene):
    df, n_ground, n_all = scene
    out = LI.lidar_ransac_planes(df, radius=30.0, num_iter=30, num_samples=6,
                                 threshold=0.3, model_size=10).collect()
    assert len(out) == n_all
    planar = sum(1 for r in out if r["is_planar"])
    # the scene is dominated by planes; most points should be inliers of
    # some cell's best plane
    assert planar > n_all * 0.5
    # deterministic: a second run returns the identical flags
    out2 = LI.lidar_ransac_planes(df, radius=30.0, num_iter=30, num_samples=6,
                                  threshold=0.3, model_size=10).collect()
    assert {(r["record_num"], r["is_planar"]) for r in out} == \
        {(r["record_num"], r["is_planar"]) for r in out2}
