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


def rgb_to_ihs(rgb: DataFrame) -> DataFrame:
    """RgbToIhs (value2hsi in the reference's image tools, e.g.
    olympic_filter.rs:486-510, with this package's r<<16|g<<8|b packing):
    i = (r+g+b)/3 over [0,1] channels; h = acos of the normalized-chroma
    expression (reflected when b > g); s = 1 - 3*min(rn, gn, bn).
    Output (row, col, h, s, i); ACOS is libm -> rows-only gate."""
    base = rgb.selectExpr(
        "row", "col",
        "CAST((CAST(value AS BIGINT) DIV 65536) % 256 AS DOUBLE) / 255.0 AS r",
        "CAST((CAST(value AS BIGINT) DIV 256) % 256 AS DOUBLE) / 255.0 AS g",
        "CAST(CAST(value AS BIGINT) % 256 AS DOUBLE) / 255.0 AS b",
    ).where("r + g + b > 0.0").selectExpr(
        "row", "col", "r", "g", "b",
        "(r + g + b) / 3.0 AS i",
        "r / (r + g + b) AS rn", "g / (r + g + b) AS gn", "b / (r + g + b) AS bn",
    )
    h_core = ("ACOS((0.5 * ((rn - gn) + (rn - bn))) / "
              "SQRT((rn - gn) * (rn - gn) + (rn - bn) * (gn - bn)))")
    return base.selectExpr(
        "row", "col",
        f"CASE WHEN rn <> gn OR rn <> bn THEN "
        f"(CASE WHEN b > g THEN 2.0 * PI() - ({h_core}) ELSE ({h_core}) END) "
        f"ELSE 0.0 END AS h",
        "1.0 - 3.0 * LEAST(rn, gn, bn) AS s",
        "i",
    )


def ihs_to_rgb(ihs: DataFrame) -> DataFrame:
    """IhsToRgb (hsi2value inverse): reconstruct the packed RGB24 value
    from (h, s, i) by hue sector."""
    import math

    pi = math.pi
    x = "i * (1.0 - s)"

    def sector(h0):
        y = f"i * (1.0 + (s * COS(h - {h0!r})) / COS({pi / 3.0!r} - (h - {h0!r})))"
        z = f"(3.0 * i - (({x}) + ({y})))"
        return y, z

    y0, z0 = sector(0.0)
    y1, z1 = sector(2.0 * pi / 3.0)
    y2, z2 = sector(4.0 * pi / 3.0)
    rgb = ihs.selectExpr(
        "row", "col",
        f"CASE WHEN h < {2.0 * pi / 3.0!r} THEN ({y0}) "
        f"WHEN h < {4.0 * pi / 3.0!r} THEN ({x}) ELSE ({z2}) END AS r",
        f"CASE WHEN h < {2.0 * pi / 3.0!r} THEN ({z0}) "
        f"WHEN h < {4.0 * pi / 3.0!r} THEN ({y1}) ELSE ({x}) END AS g",
        f"CASE WHEN h < {2.0 * pi / 3.0!r} THEN ({x}) "
        f"WHEN h < {4.0 * pi / 3.0!r} THEN ({z1}) ELSE ({y2}) END AS b",
    )
    return rgb.selectExpr(
        "row", "col",
        "CAST(CAST(ROUND(GREATEST(LEAST(r * 255.0, 255.0), 0.0)) AS BIGINT) * 65536 "
        "+ CAST(ROUND(GREATEST(LEAST(g * 255.0, 255.0), 0.0)) AS BIGINT) * 256 "
        "+ CAST(ROUND(GREATEST(LEAST(b * 255.0, 255.0), 0.0)) AS BIGINT) AS DOUBLE) AS value",
    )


def attribute_histogram(table: DataFrame, field: str) -> DataFrame:
    """AttributeHistogram (math_stat_analysis/attribute_histogram.rs:
    280-291): Sturges-style binning — num_bins = ceil(log2(n)) + 1,
    bin_width = (max - min + 1e-5) / num_bins, bin = floor((v - min) /
    width). Output: (bin, n) counts (the reference renders the same
    frequencies to an HTML report). Two scans: one scalar min/max/count
    aggregate, one groupBy — both map-side-combining."""
    mm = table.agg(
        F.min(field).alias("lo"), F.max(field).alias("hi"),
        F.count(field).alias("n")).collect()[0]
    import math

    num_bins = max(1, int(math.ceil(math.log2(mm["n"]))) + 1) if mm["n"] else 1
    width = (float(mm["hi"]) - float(mm["lo"]) + 0.00001) / num_bins
    return (
        table.where(F.col(field).isNotNull())
        .selectExpr(
            f"CAST(FLOOR((CAST({field} AS DOUBLE) - {float(mm['lo'])!r}) "
            f"/ {width!r}) AS BIGINT) AS bin")
        .groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
    )


def layer_footprint(features_or_points, id_col: str | None = None):
    """LayerFootprint (gis_analysis/layer_footprint.rs): the axis-
    aligned bounding rectangle of the whole layer as one feature.
    Output (xmin, ymin, xmax, ymax). Works on any df with x/y columns
    or a features table (nodes are extracted first)."""
    from pyspark.sql import functions as F

    df = features_or_points
    if "x" not in df.columns:
        from .vector_ops import extract_nodes

        df = extract_nodes(df, id_col or "shape_id")
    return df.agg(F.min("x").alias("xmin"), F.min("y").alias("ymin"),
                  F.max("x").alias("xmax"), F.max("y").alias("ymax"))


def reinitialize_attribute_table(features, id_col: str = "shape_id"):
    """ReinitializeAttributeTable (data_tools/
    reinitialize_attribute_table.rs): drop every attribute except the
    FID — geometry (parts) passes through untouched."""
    return features.select(id_col, "parts")
