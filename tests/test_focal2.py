"""Kernel-correctness tests for the round-2 focal families: each Spark
plan is compared against a direct numpy transcription of the reference
tool's per-cell loop (plan_curvature.rs, gaussian_filter.rs,
bilateral_filter.rs, olympic_filter.rs, opening.rs, ...)."""

import math

import numpy as np
import pytest

import whitebox_tools_spark.operators.focal as FO
from whitebox_tools_spark.functions.raster_math import GridMeta

N = 12
META = GridMeta(rows=N, columns=N, north=N * 10.0, south=0.0, east=N * 10.0,
                west=0.0, resolution_x=10.0, resolution_y=10.0)


@pytest.fixture(scope="module")
def ras(spark):
    rng = np.random.default_rng(11)
    vals = np.floor(rng.random((N, N)) * 20.0)
    df = spark.createDataFrame(
        [(r, c, float(vals[r, c])) for r in range(N) for c in range(N)],
        "row long, col long, value double",
    )
    return df, vals


def _grid(df):
    return {(r["row"], r["col"]): r["value"] for r in df.collect()}


def _z25(vals, r, c):
    """5x5 stencil with center substitution (plan_curvature.rs:322-330)."""
    z = np.empty(25)
    for n in range(25):
        rr, cc = r + (n // 5 - 2), c + (n % 5 - 2)
        z[n] = vals[rr, cc] if 0 <= rr < N and 0 <= cc < N else vals[r, c]
    return z


def _pqrst(z, res):
    p = 1.0 / (420.0 * res) * (44.0 * (z[3] + z[23] - z[1] - z[21])
        + 31.0 * (z[0] + z[20] - z[4] - z[24] + 2.0 * (z[8] + z[18] - z[6] - z[16]))
        + 17.0 * (z[14] - z[10] + 4.0 * (z[13] - z[11]))
        + 5.0 * (z[9] + z[19] - z[5] - z[15]))
    q = 1.0 / (420.0 * res) * (44.0 * (z[5] + z[9] - z[15] - z[19])
        + 31.0 * (z[20] + z[24] - z[0] - z[4] + 2.0 * (z[6] + z[8] - z[16] - z[18]))
        + 17.0 * (z[2] - z[22] + 4.0 * (z[7] - z[17]))
        + 5.0 * (z[1] + z[3] - z[21] - z[23]))
    r_ = 1.0 / (35.0 * res * res) * (2.0 * (z[0] + z[4] + z[5] + z[9] + z[10] + z[14]
        + z[15] + z[19] + z[20] + z[24]) - 2.0 * (z[2] + z[7] + z[12] + z[17] + z[22])
        - z[1] - z[3] - z[6] - z[8] - z[11] - z[13] - z[16] - z[18] - z[21] - z[23])
    t = 1.0 / (35.0 * res * res) * (2.0 * (z[0] + z[1] + z[2] + z[3] + z[4] + z[20]
        + z[21] + z[22] + z[23] + z[24]) - 2.0 * (z[10] + z[11] + z[12] + z[13] + z[14])
        - z[5] - z[6] - z[7] - z[8] - z[9] - z[15] - z[16] - z[17] - z[18] - z[19])
    s = 1.0 / (100.0 * res * res) * (z[8] + z[16] - z[6] - z[18]
        + 4.0 * (z[4] + z[20] - z[0] - z[24])
        + 2.0 * (z[3] + z[9] + z[15] + z[21] - z[1] - z[5] - z[19] - z[23]))
    return p, q, r_, s, t


def test_curvatures_vs_reference_loop(spark, ras):
    df, vals = ras
    res = 10.0
    for kind in ["plan", "profile", "tangential", "total", "mean",
                 "gaussian", "minimal", "maximal"]:
        got = _grid(FO.curvature(df, META, kind))
        for rr in range(N):
            for cc in range(N):
                p, q, r_, s, t = _pqrst(_z25(vals, rr, cc), res)
                mean = -((1.0 + q * q) * r_ - 2.0 * p * q * s + (1.0 + p * p) * t) \
                    / (2.0 * math.sqrt((1.0 + p * p + q * q) ** 3))
                gauss = (r_ * t - s * s) / (1.0 + p * p + q * q) ** 2
                if kind == "plan":
                    want = (-(q * q * r_ - 2.0 * p * q * s + p * p * t)
                            / math.sqrt((p * p + q * q) ** 3)) if abs(p + q) > 0 else 0.0
                elif kind == "profile":
                    want = (-(p * p * r_ + 2.0 * p * q * s + q * q * t)
                            / ((p * p + q * q) * math.sqrt((1.0 + p * p + q * q) ** 3))) \
                        if abs(p + q) > 0 else 0.0
                elif kind == "tangential":
                    want = (-(q * q * r_ - 2.0 * p * q * s + p * p * t)
                            / ((p * p + q * q) * math.sqrt(1.0 + p * p + q * q))) \
                        if abs(p + q) > 0 else 0.0
                elif kind == "total":
                    want = r_ * r_ + 2.0 * s * s + t * t
                elif kind == "mean":
                    want = mean
                elif kind == "gaussian":
                    want = gauss
                elif kind == "minimal":
                    want = mean - math.sqrt(max(mean * mean - gauss, 0.0)) \
                        if mean * mean >= gauss else float("nan")
                else:
                    want = mean + math.sqrt(max(mean * mean - gauss, 0.0)) \
                        if mean * mean >= gauss else float("nan")
                v = got[(rr, cc)]
                if want != want:
                    assert v != v, (kind, rr, cc)
                else:
                    assert v == pytest.approx(want, abs=1e-10), (kind, rr, cc)


def _wbt_gaussian_loop(vals, sigma):
    size, ws = FO.wbt_gaussian_kernel(sigma)
    mid = size // 2
    out = np.empty((N, N))
    for r in range(N):
        for c in range(N):
            s = zf = 0.0
            a = 0
            for dr in range(-mid, mid + 1):
                for dc in range(-mid, mid + 1):
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < N and 0 <= cc < N:
                        s += ws[a]
                        zf += ws[a] * vals[rr, cc]
                    a += 1
            out[r, c] = zf / s
    return out


def test_gaussian_filter_vs_reference_loop(spark, ras):
    df, vals = ras
    want = _wbt_gaussian_loop(vals, 0.75)
    got = _grid(FO.gaussian_filter(df, 0.75))
    for r in range(N):
        for c in range(N):
            assert got[(r, c)] == pytest.approx(want[r, c], abs=1e-12)


def test_gaussian_separable_matches_2d(spark, ras):
    """The separable two-pass plan must agree with the WBT loop even when
    the kernel (sigma=2 -> 15x15) exceeds the raster size."""
    df, vals = ras
    want = _wbt_gaussian_loop(vals, 2.0)
    got = _grid(FO.gaussian_filter_separable(df, 2.0))
    assert len(got) == N * N
    for r in range(N):
        for c in range(N):
            assert got[(r, c)] == pytest.approx(want[r, c], rel=1e-11)


def test_bilateral_vs_reference_loop(spark, ras):
    df, vals = ras
    sigma_d, sigma_i = 0.75, 10.0
    recip_d = 1.0 / (math.sqrt(2.0 * math.pi) * sigma_d)
    two_d = 2.0 * sigma_d * sigma_d
    recip_i = 1.0 / (math.sqrt(2.0 * math.pi) * sigma_i)
    two_i = 2.0 * sigma_i * sigma_i
    size = 3
    for i in range(250):
        if recip_d * math.exp(-(i * i) / two_d) <= 0.001:
            size = max(i * 2 + 1, 3)
            break
    mid = size // 2
    got = _grid(FO.bilateral_filter(df, sigma_d, sigma_i))
    for r in range(N):
        for c in range(N):
            z = vals[r, c]
            stot = zf = 0.0
            ws = []
            for dr in range(-mid, mid + 1):
                for dc in range(-mid, mid + 1):
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < N and 0 <= cc < N:
                        zn = vals[rr, cc]
                        wd = recip_d * math.exp(-(dc * dc + dr * dr) / two_d)
                        w = (recip_i * math.exp(-((zn - z) ** 2) / two_i)) * wd
                        stot += w
                        ws.append((w, zn))
            for w, zn in ws:
                zf += w * zn / stot
            assert got[(r, c)] == pytest.approx(zf, rel=1e-12), (r, c)


def test_olympic_conservative_morphology_positions(spark, ras):
    df, vals = ras
    oly = _grid(FO.olympic_filter(df))
    con = _grid(FO.conservative_smoothing_filter(df))
    opn = _grid(FO.opening(df))
    cls = _grid(FO.closing(df))
    th = _grid(FO.tophat_transform(df))
    dev = _grid(FO.dev_from_mean_elev(df))
    ep = _grid(FO.elev_percentile(df))
    pr = _grid(FO.percent_elev_range(df))

    def window(r, c, rad=1, excl_center=False):
        out = []
        for dr in range(-rad, rad + 1):
            for dc in range(-rad, rad + 1):
                if excl_center and dr == 0 and dc == 0:
                    continue
                rr, cc = r + dr, c + dc
                if 0 <= rr < N and 0 <= cc < N:
                    out.append(vals[rr, cc])
        return out

    emin = np.full((N, N), np.nan)
    for r in range(N):
        for c in range(N):
            emin[r, c] = min(window(r, c))
    for r in range(N):
        for c in range(N):
            w = window(r, c)
            z = vals[r, c]
            assert oly[(r, c)] == pytest.approx((sum(w) - max(w) - min(w)) / (len(w) - 2))
            nb = window(r, c, excl_center=True)
            want = min(max(z, min(nb)), max(nb))
            assert con[(r, c)] == want
            # opening = dilate(erode); erode grid is emin
            dil = max(emin[max(r - 1, 0):r + 2, max(c - 1, 0):c + 2].flatten())
            assert opn[(r, c)] == dil
            assert th[(r, c)] == z - dil
            mu = sum(w) / len(w)
            sd = math.sqrt(sum((x - mu) ** 2 for x in w) / (len(w) - 1))
            want_dev = (z - mu) / sd if sd > 0 else 0.0
            assert dev[(r, c)] == pytest.approx(want_dev, abs=1e-9)
            assert ep[(r, c)] == pytest.approx(100.0 * sum(1 for x in w if x < z) / len(w))
            rng_ = max(w) - min(w)
            want_pr = 100.0 * (z - min(w)) / rng_ if rng_ > 0 else 0.0
            assert pr[(r, c)] == pytest.approx(want_pr)
    assert len(cls) == N * N


def test_scharr_matches_numpy_conv(spark, ras):
    df, vals = ras
    got = _grid(FO.scharr_filter(df))
    kx = np.array(FO.SCHARR_X)
    ky = np.array(FO.SCHARR_Y)
    assert len(got) == (N - 2) * (N - 2)
    for r in range(1, N - 1):
        for c in range(1, N - 1):
            win = vals[r - 1:r + 2, c - 1:c + 2]
            gx = float((win * kx).sum())
            gy = float((win * ky).sum())
            assert got[(r, c)] == pytest.approx(math.hypot(gx, gy), abs=1e-9)
