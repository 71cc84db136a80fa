"""Scaling-efficiency evidence for the north rule.

The rule requires >=0.8 throughput scaling efficiency from N to 4N
executors; in this sandbox (no cluster) the proxy is the SAME job at two
local parallelism levels (local[8] vs local[32]) on the SAME input.

Job = the flagship spatial pipeline over an on-executor synthetic
interleaved corpus (no driver-side data, no file IO bottleneck):
synth_docs -> extract point spans -> broadcast PIP tag-join ->
LidarTile assignment -> per-(polygon, tile) counts.

Run one level per process (one JVM per master):

    python scripts/scaling_bench.py 8  2000000
    python scripts/scaling_bench.py 32 2000000

Prints one JSON line per run; scripts/scaling_report.py combines them.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from whitebox_tools_spark.operators.pip_join import points_in_polygons  # noqa: E402
from whitebox_tools_spark.operators.tiling import assign_tiles  # noqa: E402
from whitebox_tools_spark.session import get_spark  # noqa: E402
from whitebox_tools_spark.sources.docs import extract_points, synth_docs  # noqa: E402
from whitebox_tools_spark.sources.fixtures import polygons_df  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    corpus = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_corpus.parquet"
    spark = get_spark(app_name=f"wbx-scale-{cores}", cores=cores,
                      shuffle_partitions=cores * 2,
                      extra_conf={"spark.sql.files.maxPartitionBytes": "8m"})
    spark.sparkContext.setLogLevel("ERROR")

    import os
    if os.path.exists(corpus):
        # identical input bytes for every parallelism level (page-cached)
        docs = spark.read.parquet(corpus)
        n_docs = docs.count()
    else:
        docs = synth_docs(spark, n_docs)
    polys = polygons_df(spark)

    def job() -> int:
        pts = extract_points(docs)
        tagged = points_in_polygons(pts, polys)
        tiled, _grid = assign_tiles(tagged, 0.0, 0.0, 100.0, 100.0,
                                    extent=(0.0, 1000.0, 0.0, 1000.0))
        return tiled.groupBy("polygon_id", "tile_id").count().count()

    # Warm-up run of the SAME plan: whole-stage-codegen compilation, JIT
    # and Python-worker spin-up are one-time costs per plan shape — a
    # long-lived service amortizes them; steady-state is the honest
    # scaling signal.
    n_out = job()

    runs = []
    for _ in range(3):
        t0 = time.time()
        job()
        runs.append(time.time() - t0)
    wall = sorted(runs)[1]  # median of 3

    print(json.dumps({
        "cores": cores,
        "n_docs": n_docs,
        "runs_sec": [round(r, 3) for r in runs],
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        "groups_out": n_out,
    }))


if __name__ == "__main__":
    main()
