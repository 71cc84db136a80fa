"""N-ary raster overlays and the RasterCalculator expression surface.

Reference anchors:
- AverageOverlay / SumOverlay / MaxOverlay / MinOverlay /
  MaxAbsoluteOverlay / MinAbsoluteOverlay / WeightedSum / WeightedOverlay:
  gis_analysis/{average_overlay,sum_overlay,max_overlay,min_overlay,
  max_absolute_overlay,min_absolute_overlay,weighted_sum,weighted_overlay}.rs
- HighestPosition / LowestPosition: gis_analysis/{highest,lowest}_position.rs
- PickFromList: gis_analysis/pick_from_list.rs
- RasterCalculator / ConditionalEvaluation (the only query-language
  surface in WBT — a fasteval DSL over named rasters):
  whitebox-plugins/src/raster_calculator/main.rs:26-130,
  whitebox-plugins/src/conditional_evaluation/main.rs

Plan shape: stack the layers with a union (layer index attached) and
aggregate per (row, col) — ONE shuffle regardless of layer count, with
map-side partial aggregation; or, for expression evaluation over named
layers, an N-way equi-join on (row, col) that AQE plans as broadcast or
shuffled hash join per layer size. Both forms stay in whole-stage
codegen end to end.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OVERLAY_AGGS = {
    "average": "AVG(v)",
    "sum": "SUM(v)",
    "max": "MAX(v)",
    "min": "MIN(v)",
    # max/min by absolute value; ties resolve to the smallest layer index
    "max_abs": "MAX_BY(v, STRUCT(ABS(v), -layer_idx))",
    "min_abs": "MIN_BY(v, STRUCT(ABS(v), layer_idx))",
}


def _stack(layers: list[DataFrame]) -> DataFrame:
    stacked = [
        df.selectExpr("row", "col", "value AS v", f"{i} AS layer_idx")
        for i, df in enumerate(layers)
    ]
    return reduce(lambda a, b: a.unionByName(b), stacked)


def overlay(layers: list[DataFrame], op: str = "average") -> DataFrame:
    """N-ary cell-aligned overlay; cells present in every layer only
    (the WBT tools require aligned rasters)."""
    agg = _OVERLAY_AGGS[op]
    out = _stack(layers).groupBy("row", "col").agg(
        F.expr(agg).alias("value"), F.count(F.lit(1)).alias("__n")
    )
    return out.where(F.col("__n") == len(layers)).drop("__n")


def weighted_sum(layers: list[DataFrame], weights: list[float]) -> DataFrame:
    """WeightedSum: sum of value_i * weight_i across layers."""
    stacked = [
        df.selectExpr("row", "col", f"value * {w!r} AS v")
        for df, w in zip(layers, weights)
    ]
    out = reduce(lambda a, b: a.unionByName(b), stacked).groupBy("row", "col").agg(
        F.sum("v").alias("value"), F.count(F.lit(1)).alias("__n")
    )
    return out.where(F.col("__n") == len(layers)).drop("__n")


def highest_position(layers: list[DataFrame]) -> DataFrame:
    """1-based index of the layer holding the max value per cell; ties
    resolve to the first such layer (the reference's scan order)."""
    out = _stack(layers).groupBy("row", "col").agg(
        F.expr("MIN_BY(layer_idx, STRUCT(-v, layer_idx))").alias("pos"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        out.where(F.col("__n") == len(layers))
        .selectExpr("row", "col", "CAST(pos + 1 AS DOUBLE) AS value")
    )


def lowest_position(layers: list[DataFrame]) -> DataFrame:
    """LowestPosition (gis_analysis/lowest_position.rs): 1-based index of
    the layer holding the smallest value per cell; ties resolve to the
    first such layer. Cells missing from any layer are excluded (WBT
    nodata semantics: any-nodata -> nodata), enforced by the __n ==
    len(layers) completeness rule."""
    out = _stack(layers).groupBy("row", "col").agg(
        F.expr("MIN_BY(layer_idx, STRUCT(v, layer_idx))").alias("pos"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        out.where(F.col("__n") == len(layers))
        .selectExpr("row", "col", "CAST(pos + 1 AS DOUBLE) AS value")
    )


def join_layers(layers: dict[str, DataFrame]) -> DataFrame:
    """Inner-join named cell layers on (row, col): one column per name."""
    dfs = [
        df.selectExpr("row", "col", f"value AS {name}") for name, df in layers.items()
    ]
    return reduce(lambda a, b: a.join(b, ["row", "col"], "inner"), dfs)


def raster_calculator(layers: dict[str, DataFrame], expression: str) -> DataFrame:
    """RasterCalculator: evaluate an arithmetic/comparison/logical
    expression over named raster layers. WBT's fasteval DSL maps onto
    Spark SQL expressions 1:1 for the operator surface it exposes
    (+ - * / % ^ -> POWER, comparisons, && || -> AND OR); callers pass
    the SQL form. Special vars row/column are available as columns."""
    return join_layers(layers).selectExpr("row", "col", f"({expression}) AS value")


def conditional_evaluation(cells: DataFrame, cond: str,
                           true_expr: str = "1.0", false_expr: str = "0.0") -> DataFrame:
    """ConditionalEvaluation: per-cell IF(cond, then, else); `value`
    refers to the input cell value."""
    return cells.selectExpr(
        "row", "col",
        f"CASE WHEN {cond} THEN ({true_expr}) ELSE ({false_expr}) END AS value",
    )


def pick_from_list(layers: list[DataFrame], selector: DataFrame) -> DataFrame:
    """PickFromList: per cell, output the value of the layer whose
    (0-based) index the selector raster holds."""
    named = {f"__l{i}": df for i, df in enumerate(layers)}
    named["__sel"] = selector
    joined = join_layers(named)
    arr = ", ".join(f"__l{i}" for i in range(len(layers)))
    return joined.selectExpr(
        "row", "col",
        f"ELEMENT_AT(ARRAY({arr}), CAST(__sel AS INT) + 1) AS value",
    )


def _percent_op(layers: list[DataFrame], comparison: DataFrame, op: str) -> DataFrame:
    from functools import reduce

    stacked = [
        df.selectExpr("row", "col", "value AS v", f"{i} AS li")
        for i, df in enumerate(layers)
    ]
    u = reduce(lambda a, b: a.unionByName(b), stacked)
    j = u.join(comparison.selectExpr("row", "col", "value AS cmp"), ["row", "col"])
    return j.groupBy("row", "col").agg(
        F.expr(f"CAST(SUM(CASE WHEN v {op} cmp THEN 1 ELSE 0 END) AS DOUBLE) "
               f"/ COUNT(v) * 100.0").alias("value")
    )


def percent_greater_than(layers: list[DataFrame], comparison: DataFrame) -> DataFrame:
    """PercentGreaterThan: % of input layers whose cell value exceeds the
    comparison raster's (image_analysis/percent_greater_than.rs)."""
    return _percent_op(layers, comparison, ">")


def percent_less_than(layers: list[DataFrame], comparison: DataFrame) -> DataFrame:
    return _percent_op(layers, comparison, "<")


def percent_equal_to(layers: list[DataFrame], comparison: DataFrame) -> DataFrame:
    return _percent_op(layers, comparison, "=")


def count_if(layers: list[DataFrame], value: float) -> DataFrame:
    """CountIf (gis_analysis/count_if.rs): per-cell count of how many
    input rasters equal the comparison value. The reference skips a
    layer's nodata cells when counting; in the cells model absent rows
    ARE nodata, so the count is over present values only. Cells present
    in at least one layer are emitted (the reference initializes the
    output from the first grid's footprint; aligned fixtures make the
    two footprints identical)."""
    stacked = _stack(layers)
    return stacked.groupBy("row", "col").agg(
        F.expr(f"CAST(SUM(CASE WHEN v = {value!r} THEN 1 ELSE 0 END) AS DOUBLE)")
        .alias("value"))


def multiply_overlay(layers: list[DataFrame]) -> DataFrame:
    """MultiplyOverlay (gis_analysis/multiply_overlay.rs:232-240):
    per-cell product across the stack; any nodata (absent) input cell
    makes the output cell nodata (the reference multiplies into an
    existing value only when both are valid). The product folds in
    layer-index order — the same sequential file order the reference
    uses — so the float result is deterministic and oracle-reproducible.
    """
    out = _stack(layers).groupBy("row", "col").agg(
        F.expr("AGGREGATE(ARRAY_SORT(COLLECT_LIST(STRUCT(layer_idx, v))), "
               "CAST(1.0 AS DOUBLE), (acc, e) -> acc * e.v)").alias("value"),
        F.count(F.lit(1)).alias("__n"))
    return out.where(F.col("__n") == len(layers)).drop("__n")
