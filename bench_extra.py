"""Extra benchmarks for optimization work (bench.py is FROZEN for
measurement; this file holds the guide-§1.4 isolation harness).

Usage:
    python bench_extra.py q1 q2 ...          # time queries (noop sink)
    python bench_extra.py --plan q1 ...      # dump explain("formatted")
    python bench_extra.py --plan-dir plans/r06 --suffix before q1 ...

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from whitebox_tools_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    plan_only = "--plan" in args
    args = [a for a in args if a != "--plan"]
    plan_dir = None
    if "--plan-dir" in args:
        i = args.index("--plan-dir")
        plan_dir = args[i + 1]
        del args[i:i + 2]
    suffix = "before"
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i:i + 2]
    names = args

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    spark = get_spark(app_name="wbx-bench-extra", cores=cpus,
                      shuffle_partitions=int(cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    # warm the JVM/Arrow paths (same as bench.py)
    qs["tile_assign"](spark, sf_dir).count()

    med = lambda xs: sorted(xs)[len(xs) // 2]
    timings: dict[str, float] = {}
    for qi, name in enumerate(names):
        fn = qs[name]
        if plan_dir is not None:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(txt)
            del df
            if plan_only:
                continue
        if plan_only:
            fn(spark, sf_dir).explain("formatted")
            continue
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            del df
        timings[name] = med(samples)
        print(json.dumps({"q": name, "median": med(samples),
                          "samples": samples}), flush=True)
        if qi % 5 == 4:  # same cleanup cadence as bench.py
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
    if timings:
        print(json.dumps({"total": round(sum(timings.values()), 3),
                          "queries": timings, "sf": sf_dir}))


if __name__ == "__main__":
    main()
