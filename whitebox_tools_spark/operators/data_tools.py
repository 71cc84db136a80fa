"""Attribute-table and data-plumbing tools.

Reference anchors:
- JoinTables (hash equi-join, left, many-to-one on pkey=fkey):
  data_tools/join_tables.rs:19-45
- MergeTableWithCsv: data_tools/merge_table_with_csv.rs
- ExtractByAttribute (predicate DSL): whitebox-plugins/src/extract_by_attribute
- AddPointCoordinatesToTable: data_tools/add_point_coordinates_to_table.rs
- MergeVectors / LidarJoin: data_tools/merge_vectors.rs
- ExportTableToCsv / CsvPointsToVector: data_tools/{export_table_to_csv,
  csv_points_to_vector}.rs
- CreateColourComposite / SplitColourComposite bit packing:
  image_analysis/{create_colour_composite,split_colour_composite}.rs

All 1:1 Catalyst primitives — the point of this module is the explicit
tool->plan mapping (broadcast the small side, pushdown-able predicates).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_tables(primary: DataFrame, foreign: DataFrame, pkey: str, fkey: str,
                import_cols: list[str] | None = None) -> DataFrame:
    """JoinTables: left many-to-one join importing columns from the
    `foreign` table. The foreign (lookup) side is broadcast — the exact
    analog of the reference's driver-built HashMap."""
    right = foreign if import_cols is None else foreign.select(fkey, *import_cols)
    return primary.join(F.broadcast(right), primary[pkey] == right[fkey], "left").drop(fkey)


def merge_table_with_csv(table: DataFrame, csv_path: str, key: str,
                         spark=None) -> DataFrame:
    """MergeTableWithCsv: join CSV columns onto an attribute table."""
    s = spark or table.sparkSession
    csv = s.read.option("header", "true").option("inferSchema", "true").csv(csv_path)
    return table.join(F.broadcast(csv), key, "left")


def extract_by_attribute(df: DataFrame, statement: str) -> DataFrame:
    """ExtractByAttribute: SQL predicate over attribute columns
    (pushed into the scan by Catalyst)."""
    return df.where(F.expr(statement))


def add_point_coordinates_to_table(points: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """AddPointCoordinatesToTable: materialize XCOORD/YCOORD columns."""
    return points.withColumn("XCOORD", F.col(x)).withColumn("YCOORD", F.col(y))


def merge_vectors(layers: list[DataFrame]) -> DataFrame:
    """MergeVectors: bag union of feature layers."""
    return reduce(lambda a, b: a.unionByName(b), layers)


def export_table_to_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """ExportTableToCsv."""
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def csv_points_to_vector(spark, path: str, x: str = "x", y: str = "y") -> DataFrame:
    """CsvPointsToVector: CSV -> points layer."""
    df = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    return df.withColumn(x, F.col(x).cast("double")).withColumn(y, F.col(y).cast("double"))


# -- color compositing (integer bit math — oracle-exact) -------------------


def create_colour_composite(r: DataFrame, g: DataFrame, b: DataFrame) -> DataFrame:
    """CreateColourComposite: pack three band rasters into one RGB24
    value (r<<16 | g<<8 | b, bands clamped to 0..255)."""
    j = (
        r.selectExpr("row", "col", "CAST(value AS BIGINT) AS rv")
        .join(g.selectExpr("row", "col", "CAST(value AS BIGINT) AS gv"), ["row", "col"])
        .join(b.selectExpr("row", "col", "CAST(value AS BIGINT) AS bv"), ["row", "col"])
    )
    clamp = "GREATEST(LEAST({0}, 255), 0)"
    return j.selectExpr(
        "row", "col",
        f"CAST({clamp.format('rv')} * 65536 + {clamp.format('gv')} * 256 "
        f"+ {clamp.format('bv')} AS DOUBLE) AS value",
    )


def split_colour_composite(rgb: DataFrame) -> DataFrame:
    """SplitColourComposite: unpack RGB24 into (row, col, band, value)."""
    base = rgb.selectExpr("row", "col", "CAST(value AS BIGINT) AS v")
    return base.selectExpr(
        "row", "col",
        "EXPLODE(ARRAY("
        "STRUCT(0 AS band, CAST((v DIV 65536) % 256 AS DOUBLE) AS value), "
        "STRUCT(1 AS band, CAST((v DIV 256) % 256 AS DOUBLE) AS value), "
        "STRUCT(2 AS band, CAST(v % 256 AS DOUBLE) AS value))) AS e",
    ).selectExpr("row", "col", "e.band AS band", "e.value AS value")


# -- text corpus aggregation ------------------------------------------------


def top_k_terms(docs: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """Top-k corpus terms by frequency (tie-break: token asc) — the
    canonical explode + groupBy + top-k plan (map-side partial counts)."""
    from pyspark.sql import Window

    toks = docs.selectExpr(f"EXPLODE(SPLIT(TRIM({text_col}), '\\\\s+')) AS token")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return counts.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k) \
                 .withColumn("rank", F.col("rank").cast("long"))
