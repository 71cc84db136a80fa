"""A/B profile: the round-4 regressed query cluster under
spark.sql.ansi.enabled true vs false (fresh session per mode, same
sf, medians of N reps). Usage:

    python scripts/profile_ansi.py [sf_dir] [reps] [q1,q2,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402
from whitebox_tools_spark.session import get_spark  # noqa: E402

CLUSTER = ["pip_tag", "tile_assign", "tile_counts", "hex_bin", "frs_cells",
           "knn_join", "classify_buildings", "multiscale_rough",
           "tree_detection"]


def run_mode(ansi: str, sf_dir: str, reps: int, names: list[str]) -> dict:
    spark = get_spark(app_name=f"ansi-{ansi}", cores=32,
                      shuffle_partitions=64,
                      extra_conf={"spark.sql.ansi.enabled": ansi})
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    qs["tile_assign"](spark, sf_dir).count()  # warm
    out = {}
    import bench
    med = lambda xs: sorted(xs)[len(xs) // 2]
    ts = []
    for _ in range(reps):
        t0 = time.time()
        n = bench.flagship(spark, sf_dir)
        ts.append(time.time() - t0)
    out["flagship_pipeline"] = round(med(ts), 3)
    out["flagship_docs_per_sec"] = round(n / med(ts), 1)
    for name in names:
        samples = []
        for _ in range(reps):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        out[name] = round(med(samples), 3)
    spark.stop()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else CLUSTER
    res = {}
    for ansi in ("true", "false"):
        res[ansi] = run_mode(ansi, sf_dir, reps, names)
        time.sleep(2)
    print(json.dumps(res, indent=1))
    print("\nratio on/off:")
    for k in res["true"]:
        if k == "flagship_docs_per_sec":
            continue
        a, b = res["true"][k], res["false"][k]
        print(f"  {k}: {a:.3f} / {b:.3f} = {a / b if b else 0:.2f}x")


if __name__ == "__main__":
    main()
