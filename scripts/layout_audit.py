"""Layout-determinism audit for the rows-only registry queries.

Every oracle-gated query is bit-verified against DuckDB by
scripts/check_parity.py; the queries WITHOUT oracles are the ones where
a shuffle-layout dependence could hide. This script runs each of them
at two spark.sql.shuffle.partitions settings (32 and 11 — different
partition counts change groupBy/applyInPandas arrival order) and
compares the full collected outputs exactly.

Usage: python scripts/layout_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def _collect(spark, fn, sf_dir):
    df = fn(spark, sf_dir)
    rows = df.collect()
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from whitebox_tools_spark.session import get_spark

    qs = e.queries()
    oracles = e.oracle_sql()
    names = [n for n in qs if n not in oracles and (not only or n in only)]
    print(f"{len(names)} rows-only queries: {' '.join(names)}", flush=True)

    results: dict[int, dict[str, list]] = {}
    for parts in (32, 11):
        spark = get_spark(f"layout-audit-{parts}", cores=32,
                          shuffle_partitions=parts)
        results[parts] = {}
        for n in names:
            try:
                results[parts][n] = _collect(spark, qs[n], sf_dir)
            except Exception as ex:  # pragma: no cover - diagnostic path
                results[parts][n] = [("__error__", repr(ex))]
            print(f"  [{parts}] {n}: {len(results[parts][n])} rows",
                  flush=True)
        spark.stop()

    bad = [n for n in names if results[32][n] != results[11][n]]
    for n in bad:
        print(f"MISMATCH {n}: {len(results[32][n])} vs {len(results[11][n])} rows")
    print("ALL LAYOUT-DETERMINISTIC" if not bad else f"{len(bad)} MISMATCHES")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
