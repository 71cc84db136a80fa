"""Local replica of the driver's correctness gate.

Runs every __spark_entry__ query on Spark and its oracle on DuckDB at
the given scale factor, compares row count + column-sorted exact values
(float64 compared bitwise). Run with `python -u` (output is
block-buffered otherwise). Usage:

    python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402
from whitebox_tools_spark.session import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda v: tuple(v))
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs = []
    if len(sdf) != len(odf):
        return [f"rowcount spark={len(sdf)} oracle={len(odf)}"]
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    s, o = canon(sdf), canon(odf)
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(ov.dtype, np.floating):
            sv = sv.astype(np.float64)
            ov = ov.astype(np.float64)
            neq = ~((sv == ov) | (np.isnan(sv) & np.isnan(ov)))
            if neq.any():
                i = int(np.nonzero(neq)[0][0])
                errs.append(f"col {c}: {int(neq.sum())} mismatches, first@{i}: "
                            f"spark={sv[i]!r} oracle={ov[i]!r} diff={sv[i]-ov[i]!r}")
        else:
            neq = sv.astype(str) != ov.astype(str)
            if neq.any():
                i = int(np.nonzero(neq)[0][0])
                errs.append(f"col {c}: {int(neq.sum())} mismatches, first@{i}: "
                            f"spark={sv[i]!r} oracle={ov[i]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # accept space- or comma-separated names; "--only" is a no-op marker
    only = {n for a in sys.argv[2:] for n in a.split(",")} - {"--only", ""}
    spark = get_spark(app_name="parity", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except duckdb.IOException:
            pass

    qs, oracles = E.queries(), E.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: oracle error: {ex}")
            continue
        errs = compare(name, sdf, odf)
        if errs:
            failed.append(name)
            print(f"FAIL  {name}: " + "; ".join(errs[:3]))
        else:
            print(f"ok    {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    if only:
        missing = only - set(qs)
        if missing:
            failed.extend(sorted(missing))
            print(f"FAIL  unknown query name(s): {', '.join(sorted(missing))}")
    n_ran = len([n for n in qs if not only or n in only])
    print(f"\n{n_ran} queries checked — "
          f"{'ALL OK' if not failed else 'FAILED: ' + ', '.join(failed)}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
