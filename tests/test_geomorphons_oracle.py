"""Audit of the geomorphons ratio-restatement oracle.

The geomorphons DuckDB oracle (__spark_entry__._geomorphons_oracle)
replaces every atan2-angle comparison in the kernel with the
corresponding RATIO comparison (atan2(dz, dist) is strictly monotone in
dz/dist for dist > 0, so zenith/nadir maxima, the |angle| > threshold
test, and |nadir| vs |zenith| all transfer; the threshold becomes
tan(threshold)). Ratio ties are angle ties, so tie behavior matches
automatically; the one residual hazard is two DISTINCT ratios
collapsing to the SAME numpy atan2 double — which would flip an
|nadir| < |zenith| verdict between the kernel and the restatement.
This test runs both decision procedures side by side over the full
sf0.01 fixture raster (the same cells the driver's oracle comparison
sees) and asserts identical classes for all 9,604 emitted cells.

Pure numpy — the grid is read with DuckDB using the registry's own
_RAS_A_SQL text, no Spark session.
"""

import math

import duckdb
import numpy as np
import pytest

import __spark_entry__ as E
from whitebox_tools_spark.operators.visibility import (_GEO_CLASSES,
                                                       _GEO_DX, _GEO_DY)

SF01 = "/root/testdata/sf0.01"

RESX = RESY = 10.0  # _META100
R_SEARCH, SKIP = 8, 1
ROWS = COLS = 100
SEARCH_LENGTH = R_SEARCH * (RESX + RESY) / 2.0
FLAT_THRESH = math.radians(1.0)
TAN_THRESH = math.tan(FLAT_THRESH)


def _grid():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF01}/events.parquet')")
    df = con.execute(E._RAS_A_SQL).df()
    g = np.full((ROWS, COLS), np.nan)
    g[df["row"].to_numpy(), df["col"].to_numpy()] = df["value"].to_numpy()
    return g


def _classify(grid, angle_mode):
    cr, cc = np.meshgrid(np.arange(SKIP, ROWS - SKIP),
                         np.arange(SKIP, COLS - SKIP), indexing="ij")
    z0 = grid[cr, cc]
    count_pos = np.zeros(z0.shape, dtype=np.int64)
    count_neg = np.zeros(z0.shape, dtype=np.int64)
    valid = ~np.isnan(z0)
    for di in range(8):
        dy, dx = _GEO_DY[di], _GEO_DX[di]
        step_len = math.hypot(dx * RESX, dy * RESY)
        lo = -math.pi / 2.0 if angle_mode else -np.inf
        hi = math.pi / 2.0 if angle_mode else np.inf
        zen = np.full(z0.shape, lo)
        nad = np.full(z0.shape, hi)
        flat = np.zeros(z0.shape, dtype=bool)
        d = SKIP
        while d * step_len < SEARCH_LENGTH:
            pr = cr + d * dy
            pc = cc + d * dx
            off = (pr < 0) | (pr >= ROWS) | (pc < 0) | (pc >= COLS)
            flat |= off
            z2 = np.full(z0.shape, np.nan)
            z2[~off] = grid[pr[~off].clip(0, ROWS - 1),
                            pc[~off].clip(0, COLS - 1)]
            with np.errstate(invalid="ignore"):
                if angle_mode:
                    v = np.arctan2(z2 - z0, d * step_len)
                else:
                    v = (z2 - z0) / (d * step_len)
            upd = ~off & ~np.isnan(z2) & ~flat
            zen = np.where(upd & (v > zen), v, zen)
            nad = np.where(upd & (v < nad), v, nad)
            d += 1
        live = valid & ~flat
        az, an = np.abs(zen), np.abs(nad)
        thr = FLAT_THRESH if angle_mode else TAN_THRESH
        sig = live & ((az > thr) | (an > thr))
        count_pos += (sig & (an < az)).astype(np.int64)
        count_neg += (sig & (an > az)).astype(np.int64)
    cls = _GEO_CLASSES[count_neg, count_pos].astype(np.float64)
    cls[~valid] = -32768.0
    return cls


@pytest.mark.skipif(not __import__("os").path.isdir(SF01),
                    reason="sf0.01 testdata not present")
def test_geomorphons_ratio_restatement():
    grid = _grid()
    angles = _classify(grid, angle_mode=True)
    ratios = _classify(grid, angle_mode=False)
    assert angles.shape == (98, 98)
    assert (angles == ratios).all(), (
        f"{int((angles != ratios).sum())} cells decide differently "
        f"under the ratio restatement")
