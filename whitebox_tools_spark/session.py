"""SparkSession factory with scale-oriented defaults.

Designed for a 1000-executor cluster reading 100 TB, tested on local[N]:
AQE on (runtime coalesce + skew-join splitting), Arrow on (all heavy
kernels are pandas/Arrow UDFs), explicit shuffle-partition control.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Adaptive execution: runtime shuffle coalesce, skew-join splitting,
    # broadcast-join demotion/promotion. Essential at 100 TB where static
    # planning can't know per-tile densities (hot-cell skew).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow batch transfer for every pandas UDF / mapInPandas kernel.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # Stable timestamp semantics for the oracle comparison.
    "spark.sql.session.timeZone": "UTC",
    # ANSI on (the Spark 4 default): every operator is written total —
    # TRY_DIVIDE / try_cast / guarded element_at — so results are identical
    # under ANSI on or off. Pinning "on" here matches the mode a user's
    # existing Spark 4 session will have, so the library sees the strict
    # mode in its own tests instead of masking traps.
    "spark.sql.ansi.enabled": "true",
    # InferFiltersFromGenerate synthesizes `size(arr) > 0 AND isnotnull(arr)`
    # below every EXPLODE. When the array is a computed expression (tokenize/
    # shingle/bigram TRANSFORMs — every text operator here), the inferred
    # filter re-evaluates that whole expression twice per row, and predicate
    # pushdown then moves it below the repartition exchange so it runs on the
    # (narrow) pre-spread partitions. It can never reach parquet PushedFilters
    # (non-atomic expression), so it has no skipping benefit at any scale —
    # measured 2.3x on the bigram-LM scorer (OPTIMIZATION_r06.md §lm_score).
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    # Allow shuffled-hash joins where a side's per-partition build fits
    # (guide §3.1): no sort on either side. Spills are the risk at scale;
    # every join key here is a short hash/int key with AQE skew-split on.
    "spark.sql.join.preferSortMergeJoin": "false",
    # Always use the sort-based shuffle writer. The bypass-merge writer
    # (default for <= 200 reduce partitions) opens one file PER reduce
    # partition per map task — at 32 map tasks x 64 partitions that is
    # 2048 file creations per shuffle, which dominates small/medium map
    # stages (measured 2x on the term-frequency stage). Production jobs
    # run with > 200 shuffle partitions where the bypass writer never
    # applies, so this only changes the small-partition-count regime in
    # the writer's favor.
    "spark.shuffle.sort.bypassMergeThreshold": "0",
    # AQE coalescing floor: the 1m default collapses small grouped
    # kernel inputs (per-tile Delaunay / marching-squares Python
    # stages) into a SINGLE task — 1 MB of grouped raster cells is
    # seconds of kernel work, so parallelism matters more than task
    # count there. At production scale partitions are far above either
    # floor, so this only changes the small-input regime. 128k measured best
    # across the kernel queries (64k over-split fast Python stages like the
    # ADC scorer; 1m serialized slow ones like per-tile Delaunay).
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "128k",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "whitebox_tools_spark",
    cores: str | int = "*",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: local parallelism ("*", 8, 32 ...). On a real cluster the
    master comes from spark-submit and this arg is ignored there.
    """
    builder = SparkSession.builder.appName(app_name)
    if not os.environ.get("SPARK_GRAFT_EXTERNAL_MASTER"):
        builder = builder.master(f"local[{cores}]")
    conf = dict(_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
