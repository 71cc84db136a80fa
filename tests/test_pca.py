"""N-band PrincipalComponentAnalysis vs a direct numpy reference
(math_stat_analysis/principal_component_analysis.rs semantics:
correlation-matrix variant, descending-eigenvalue order)."""

import numpy as np
import pytest

from whitebox_tools_spark.operators.raster import (pca_two_band,
                                                   principal_component_analysis)


def _bands_df(spark, mats):
    out = []
    for m in mats:
        rows = [(r, c, float(m[r, c]))
                for r in range(m.shape[0]) for c in range(m.shape[1])]
        out.append(spark.createDataFrame(rows, "row long, col long, value double"))
    return out


def _numpy_pca(mats, standardized=True):
    x = np.stack([m.ravel() for m in mats], axis=1).astype(float)
    mean = x.mean(axis=0)
    xc = x - mean
    cov = (xc.T @ xc) / len(x)
    sd = np.sqrt(np.diag(cov))
    a = cov / np.outer(sd, sd) if standardized else cov
    evals, evecs = np.linalg.eigh(a)
    order = np.argsort(-evals, kind="stable")
    evals, evecs = evals[order], evecs[:, order]
    for c in range(evecs.shape[1]):
        imax = int(np.argmax(np.abs(evecs[:, c])))
        if evecs[imax, c] < 0.0:
            evecs[:, c] = -evecs[:, c]
    proj = (xc / sd if standardized else xc) @ evecs
    return evals, evecs, proj


@pytest.mark.parametrize("k", [3, 4])
def test_pca_nband_matches_numpy(spark, k):
    rng = np.random.RandomState(5 + k)
    base = rng.rand(12, 10) * 40.0
    mats = [base * (i + 1) + rng.rand(12, 10) * 15.0 for i in range(k)]
    dfs = _bands_df(spark, mats)
    out, report = principal_component_analysis(dfs)
    evals, evecs, proj = _numpy_pca(mats)

    assert len(report) == k
    for c in range(k):
        assert report[c]["component"] == c + 1
        assert abs(report[c]["eigenvalue"] - evals[c]) < 1e-9
        assert np.allclose(report[c]["loadings"], evecs[:, c], atol=1e-9)
    assert abs(sum(r["explained_pct"] for r in report) - 100.0) < 1e-9
    # explained variance is descending
    pcts = [r["explained_pct"] for r in report]
    assert pcts == sorted(pcts, reverse=True)

    got = {(r["row"], r["col"]): [r[f"pc{c + 1}"] for c in range(k)]
           for r in out.collect()}
    for r in range(12):
        for c in range(10):
            want = proj[r * 10 + c]
            assert np.allclose(got[(r, c)], want, atol=1e-9), (r, c)


def test_pca_nband_k2_agrees_with_closed_form(spark):
    rng = np.random.RandomState(31)
    a = rng.rand(8, 8) * 100.0
    b = a * 0.5 + rng.rand(8, 8) * 30.0
    dfs = _bands_df(spark, [a, b])
    general = {(r["row"], r["col"]): (r["pc1"], abs(r["pc2"]))
               for r in principal_component_analysis(dfs)[0].collect()}
    closed = {(r["row"], r["col"]): (r["pc1"], abs(r["pc2"]))
              for r in pca_two_band(dfs[0], dfs[1]).collect()}
    # k=2 closed form fixes signs differently for pc2; compare |pc2|
    for key, (p1, p2) in closed.items():
        g1, g2 = general[key]
        assert abs(abs(g1) - abs(p1)) < 1e-9
        assert abs(g2 - p2) < 1e-9


def test_pca_covariance_variant(spark):
    rng = np.random.RandomState(7)
    mats = [rng.rand(6, 6) * (10.0 ** (i + 1)) for i in range(3)]
    dfs = _bands_df(spark, mats)
    out, report = principal_component_analysis(dfs, standardized=False)
    evals, evecs, proj = _numpy_pca(mats, standardized=False)
    for c in range(3):
        assert abs(report[c]["eigenvalue"] - evals[c]) < 1e-6
    got = {(r["row"], r["col"]): [r[f"pc{c + 1}"] for c in range(3)]
           for r in out.collect()}
    for r in range(6):
        for c in range(6):
            assert np.allclose(got[(r, c)], proj[r * 6 + c], atol=1e-6)


def test_pca_num_comp_truncates(spark):
    rng = np.random.RandomState(3)
    mats = [rng.rand(5, 5) * 10.0 for _ in range(4)]
    out, report = principal_component_analysis(_bands_df(spark, mats),
                                               num_comp=2)
    assert len(report) == 2
    assert out.columns == ["row", "col", "pc1", "pc2"]
