"""Hot-tile skew handling: salted repartition bounds task sizes."""

import pyspark.sql.functions as F

from whitebox_tools_spark.operators.tiling import salted_repartition, write_tiles


def _skewed_points(spark, n=100_000):
    """80% of points land in one tile (tile 0), the rest spread."""
    return spark.range(n).selectExpr(
        "id AS record_num",
        "CASE WHEN id % 10 < 8 THEN CAST(PMOD(XXHASH64(id, 1), 6000) AS DOUBLE) / 100.0 "
        "ELSE 100.0 + CAST(PMOD(XXHASH64(id, 2), 80000) AS DOUBLE) / 100.0 END AS x",
        "CASE WHEN id % 10 < 8 THEN CAST(PMOD(XXHASH64(id, 3), 6000) AS DOUBLE) / 100.0 "
        "ELSE 100.0 + CAST(PMOD(XXHASH64(id, 4), 80000) AS DOUBLE) / 100.0 END AS y",
        "CAST(id % 100 AS DOUBLE) AS value",
    ).withColumn("tile_id", F.expr("CAST(FLOOR(y / 100.0) AS BIGINT) * 10 + CAST(FLOOR(x / 100.0) AS BIGINT)"))


def test_salted_repartition_balances_hot_tile(spark):
    pts = _skewed_points(spark)
    n = pts.count()

    unsalted = pts.repartition(32, F.col("tile_id"))
    u_sizes = [r["c"] for r in unsalted.groupBy(F.spark_partition_id().alias("p"))
               .agg(F.count(F.lit(1)).alias("c")).collect()]
    salted = salted_repartition(pts, "tile_id", salt_buckets=16, num_partitions=32)
    s_sizes = [r["c"] for r in salted.groupBy(F.spark_partition_id().alias("p"))
               .agg(F.count(F.lit(1)).alias("c")).collect()]

    assert max(u_sizes) >= 0.8 * n, "fixture must actually be skewed"
    # the hot tile spreads over ~16 tasks: max partition bounded
    assert max(s_sizes) <= 0.15 * n, (max(s_sizes), n)
    # no rows lost
    assert sum(s_sizes) == n


def test_write_tiles_layout_and_content(spark, tmp_path):
    pts = _skewed_points(spark, 20_000)
    out = str(tmp_path / "tiles")
    write_tiles(pts, out, salt_buckets=8, num_partitions=32)
    back = spark.read.parquet(out)
    assert back.count() == 20_000
    got = {r["tile_id"]: r["c"] for r in back.groupBy("tile_id").agg(F.count(F.lit(1)).alias("c")).collect()}
    want = {r["tile_id"]: r["c"] for r in pts.groupBy("tile_id").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert got == want
    # the hot tile directory holds multiple (salted) files
    import glob
    hot = max(want, key=want.get)
    files = glob.glob(f"{out}/tile_id={hot}/*.parquet")
    assert len(files) > 1
