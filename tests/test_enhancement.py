"""Image-enhancement family: numpy reference parity + invariants."""

import math

import numpy as np
import pytest

from whitebox_tools_spark.operators import enhancement as EN


def _cells(spark, seed=3, n=30):
    rng = np.random.RandomState(seed)
    vals = rng.randint(0, 200, size=(n, n)).astype(float)
    rows = [(int(r), int(c), float(vals[r, c]))
            for r in range(n) for c in range(n)]
    return spark.createDataFrame(rows, "row long, col long, value double"), vals


def _grid(df, n=30):
    out = np.full((n, n), np.nan)
    for r in df.collect():
        out[int(r["row"]), int(r["col"])] = r["value"]
    return out


def test_min_max_stretch_matches_numpy(spark):
    df, vals = _cells(spark)
    got = _grid(EN.min_max_contrast_stretch(df, num_tones=256))
    lo, hi = vals.min(), vals.max()
    exp = np.clip(np.floor((vals - lo) / (hi - lo) * 256), 0, 255)
    assert np.array_equal(got, exp)


def test_sigmoidal_stretch_matches_numpy(spark):
    df, vals = _cells(spark, seed=4)
    cutoff, gain, tones = 0.4, 2.0, 256
    got = _grid(EN.sigmoidal_contrast_stretch(df, cutoff, gain, tones))
    a = 1.0 / (1.0 + math.exp(gain * cutoff))
    b = (1.0 / (1.0 + math.exp(gain * (cutoff - 1.0)))
         - 1.0 / (1.0 + math.exp(gain * cutoff)))
    zn = (vals - vals.min()) / (vals.max() - vals.min())
    sig = (1.0 / (1.0 + np.exp(gain * (cutoff - zn))) - a) / b
    exp = np.minimum(np.floor(np.clip(sig, 0, 1) * tones), tones - 1)
    assert np.allclose(got, exp)


def test_gamma_correction_matches_numpy(spark):
    df, vals = _cells(spark, seed=5)
    got = _grid(EN.gamma_correction(df, gamma=0.5))
    lo, hi = vals.min(), vals.max()
    exp = ((vals - lo) / (hi - lo)) ** 0.5 * (hi - lo) + lo
    assert np.allclose(got, exp)


def test_percentage_stretch_clips_tails(spark):
    df, vals = _cells(spark, seed=6)
    out = _grid(EN.percentage_contrast_stretch(df, clip=10.0, num_tones=256))
    # the bottom/top 10% of cells must saturate to the end tones
    n = vals.size
    k = math.ceil(n * 10.0 / 100.0)
    flat = np.sort(vals.ravel())
    lo_cut, hi_cut = flat[k - 1], flat[n - k]
    assert (out[vals <= lo_cut] == 0).all()
    assert (out[vals >= hi_cut] == 255).all()
    # interior strictly between the ends
    interior = (vals > lo_cut) & (vals < hi_cut)
    assert out[interior].min() >= 0 and out[interior].max() <= 255


def test_stdev_stretch_monotone(spark):
    df, vals = _cells(spark, seed=7)
    out = _grid(EN.stdev_contrast_stretch(df, clip_stdev=1.0))
    # monotone non-decreasing in input value
    order = np.argsort(vals.ravel(), kind="mergesort")
    t = out.ravel()[order]
    assert (np.diff(t) >= 0).all()
    assert t.min() == 0 and t.max() == 255


def test_bcet_maps_endpoints(spark):
    df, vals = _cells(spark, seed=8)
    out = _grid(EN.balance_contrast_enhancement(df, band_mean=110.0))
    l, h = vals.min(), vals.max()
    # parabola maps l -> 0 and h -> 255 by construction
    assert abs(out[vals == l][0] - 0.0) < 1e-9
    assert abs(out[vals == h][0] - 255.0) < 1e-9
    # and the output mean lands on the requested band mean
    assert abs(out.mean() - 110.0) < 5.0


def test_histogram_matching_matches_ref_distribution(spark):
    a, va = _cells(spark, seed=9)
    b, vb = _cells(spark, seed=10)
    out = _grid(EN.histogram_matching(a, b))
    # every output value exists in the reference image
    assert set(np.unique(out)) <= set(np.unique(vb))
    # CDF alignment: for each mapped value, ref CDF >= subject CDF
    n = va.size
    for v in np.unique(va)[:20]:
        pa = (va <= v).sum() / n
        m = out[va == v][0]
        pb = (vb <= m).sum() / vb.size
        assert pb >= pa - 1e-12


def test_flip_image_roundtrip(spark):
    df, vals = _cells(spark)
    flipped = EN.flip_image(df, 30, 30, direction="both")
    back = _grid(EN.flip_image(flipped, 30, 30, direction="both"))
    assert np.array_equal(back, vals)


def test_change_vector_analysis_sectors(spark):
    a1, v1 = _cells(spark, seed=11)
    b1, w1 = _cells(spark, seed=12)
    a2, v2 = _cells(spark, seed=13)
    b2, w2 = _cells(spark, seed=14)
    out = EN.change_vector_analysis(a1, b1, a2, b2)
    rows = {(r["row"], r["col"]): r for r in out.collect()}
    mag = np.sqrt((v2 - v1) ** 2 + (w2 - w1) ** 2)
    for (r, c), rec in list(rows.items())[:200]:
        assert abs(rec["magnitude"] - mag[r, c]) < 1e-9
        exp_sector = (1 if v2[r, c] >= v1[r, c] else 0) + (2 if w2[r, c] >= w1[r, c] else 0)
        assert rec["sector"] == exp_sector


def test_dds_reduces_achromatic(spark):
    r, vr = _cells(spark, seed=15)
    g, vg = _cells(spark, seed=16)
    b, vb = _cells(spark, seed=17)
    out = EN.direct_decorrelation_stretch(r, g, b, k=0.5)
    rec = out.where("row = 3 AND col = 4").collect()[0]
    m = min(vr[3, 4], vg[3, 4], vb[3, 4])
    assert abs(rec["r"] - (vr[3, 4] - 0.5 * m)) < 1e-12
    assert abs(rec["g"] - (vg[3, 4] - 0.5 * m)) < 1e-12
    assert abs(rec["b"] - (vb[3, 4] - 0.5 * m)) < 1e-12
