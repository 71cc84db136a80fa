"""Audit of the rbf_interp_exact oracle twin.

The twin gates the shared thin-plate RBF solver (tin.rbf_interpolation,
also the whole of lidar_rbf_interpolation via a thin delegate) against
the plane 2 + 0.25x + 0.5y: thin-plate RBF with an affine polynomial
term has LINEAR PRECISION, so on a planar fixture the mathematically
exact output IS the plane, and the only deviation is the LAPACK solve
residual. This test pins what makes the ROUND(6) gate sound:

1. every one of the 1600 grid cells is covered (>= 1 site within the
   WBT default radius, so the oracle's full-grid SELECT matches);
2. the solver residual |rbf - plane| stays under 1e-9 (measured
   ~2.3e-13) — vs the 5e-7 half-grid of ROUND(6);
3. plane values at cell centers sit EXACTLY on the 6-decimal grid
   (cell centers are multiples of 12.5, so plane values carry <= 4
   fractional decimal digits) — the half-grid margin is the maximum
   possible 0.5 for every cell.
"""

import numpy as np
import pytest


@pytest.mark.usefixtures("spark")
def test_rbf_planar_twin_margins(spark):
    import __spark_entry__ as E

    out = E.queries()["rbf_interp_exact"](
        spark, "/root/testdata/sf0.01").toPandas()
    assert len(out) == 1600                                       # 1.

    qx = 0.0 + (out["col"].to_numpy() + 0.5) * 25.0
    qy = 1000.0 - (out["row"].to_numpy() + 0.5) * 25.0
    plane = 2.0 + 0.25 * qx + 0.5 * qy
    # the twin query rounds; compare against the rounded plane
    assert (out["value"].to_numpy() == np.round(plane, 6)).all()

    # 2./3. margins on the UNROUNDED kernel output
    from whitebox_tools_spark.operators.tin import rbf_interpolation

    E._reg(spark, "/root/testdata/sf0.01", "events")
    pts = spark.sql(E._RBF_EXACT_SITES).selectExpr(
        "x", "y", "2.0 + 0.25 * x + 0.5 * y AS value")
    raw = rbf_interpolation(pts, E._META40, k=16, tile=4).toPandas()
    assert len(raw) == 1600
    qx = 0.0 + (raw["col"].to_numpy() + 0.5) * 25.0
    qy = 1000.0 - (raw["row"].to_numpy() + 0.5) * 25.0
    plane = 2.0 + 0.25 * qx + 0.5 * qy
    resid = np.abs(raw["value"].to_numpy() - plane)
    assert resid.max() < 1e-9                                     # 2.
    frac = np.abs(plane) * 10 ** 6
    assert (np.abs(frac - np.round(frac)) < 1e-6).all()           # 3.
