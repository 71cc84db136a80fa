"""spark-submit entry point for the flagship spatial pipeline.

The north rule's deployment shape: package the library and submit to a
multi-executor cluster —

    python scripts/make_pyfiles.py                 # builds dist/whitebox_tools_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/whitebox_tools_spark.zip \
        scripts/submit_job.py --docs 1000000 --out /tmp/wbt_out

Runs synth corpus -> extract point spans -> PIP tag-join -> tile
assignment -> per-(polygon, tile) counts through the checkpointed
runner (per-partition lineage + throughput metrics, resumable), then
prints one JSON metrics line. On a cluster the session comes from
spark-submit's conf; locally it falls back to local[*].
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--out", default="/tmp/wbt_submit_out")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the checkpoint store in --out")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.appName("wbt-flagship")
             .config("spark.sql.ansi.enabled", "true")
             .getOrCreate())

    from whitebox_tools_spark.operators.pip_join import points_in_polygons
    from whitebox_tools_spark.operators.tiling import assign_tiles
    from whitebox_tools_spark.plans.lineage import CheckpointedRun
    from whitebox_tools_spark.sources.docs import extract_points, synth_docs
    from whitebox_tools_spark.sources.fixtures import polygons_df

    t0 = time.time()
    docs = synth_docs(spark, args.docs)
    pts = extract_points(docs)
    tagged = points_in_polygons(pts, polygons_df(spark))
    tiled, _grid = assign_tiles(tagged, 0.0, 0.0, 100.0, 100.0,
                                extent=(0.0, 1000.0, 0.0, 1000.0))
    result = tiled.groupBy("polygon_id", "tile_id").count()
    result.persist()
    key_values = sorted(r["polygon_id"] for r in
                        result.select("polygon_id").distinct().collect())
    polygon_keys = [str(k) for k in key_values]
    by_key = dict(zip(polygon_keys, key_values))

    run = CheckpointedRun(spark, args.out, run_id="flagship")

    def job(s, key):
        # typed comparison (not f-string SQL): safe for string-typed ids
        # and injection-proof for arbitrary fixture data
        from pyspark.sql import functions as F
        return result.where(F.col("polygon_id") == F.lit(by_key[key]))

    stats = run.run(polygon_keys, job)
    wall = time.time() - t0
    print(json.dumps({
        "job": "wbt-flagship", "docs": args.docs, "wall_sec": round(wall, 3),
        "docs_per_sec": round(args.docs / wall, 1),
        "partitions": len(polygon_keys), **stats,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
