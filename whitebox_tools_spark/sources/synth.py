"""Deterministic spatial columns derived from the driver's parquet tables.

The correctness gate runs each Spark query against a DuckDB oracle on
the *same* parquet files, so spatial inputs must be derivable by both
engines with bit-identical doubles. Every derivation here is integer
arithmetic (exact in int64 on both engines) followed by a single
division — IEEE-754 identical — and is emitted as portable SQL text used
verbatim by BOTH the Spark DataFrame (selectExpr) and the DuckDB oracle
(CTE). One source of truth, zero drift.

Extent: [0, 1000) x [0, 1000) — matches FIXTURES.md F2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)

# -- point layer from lineitem (large layer: 6k/60k/600k rows) --
LINEITEM_POINT_EXPRS: dict[str, str] = {
    "record_num": "(l_orderkey * 8 + l_linenumber)",
    "x": "(CAST((l_orderkey * 131071 + l_linenumber * 524287) % 1000000 AS DOUBLE) / 1000.0)",
    "y": "(CAST((l_partkey * 786433 + l_suppkey * 196613) % 1000000 AS DOUBLE) / 1000.0)",
    "value": "CAST(l_quantity AS DOUBLE)",
    "category": "CAST(l_suppkey % 7 AS INT)",
}

# -- sparser point layer from events (for kNN/interpolation oracles) --
EVENT_POINT_EXPRS: dict[str, str] = {
    "record_num": "event_id",
    "x": "(CAST((event_id * 2654435761 + user_id * 40503) % 1000000 AS DOUBLE) / 1000.0)",
    "y": "(CAST((event_id * 97711 + user_id * 65537) % 1000000 AS DOUBLE) / 1000.0)",
    "value": "CAST((event_id * 131 + user_id) % 1000 AS DOUBLE)",
    "category": "CAST(user_id % 5 AS INT)",
}


def select_sql(exprs: dict[str, str], table: str, where: str | None = None) -> str:
    cols = ", ".join(f"{e} AS {name}" for name, e in exprs.items())
    q = f"SELECT {cols} FROM {table}"
    if where:
        q += f" WHERE {where}"
    return q


def points_cte(exprs: dict[str, str], table: str, where: str | None = None, name: str = "pts") -> str:
    """CTE prelude for oracle SQL: `WITH pts AS (SELECT ... FROM lineitem)`."""
    return f"WITH {name} AS ({select_sql(exprs, table, where)})"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def lineitem_points(spark: SparkSession, sf_dir: str, where: str | None = None) -> DataFrame:
    df = load_table(spark, sf_dir, "lineitem")
    if where:
        df = df.where(where)
    return df.selectExpr(*[f"{e} AS {n}" for n, e in LINEITEM_POINT_EXPRS.items()])


def event_points(spark: SparkSession, sf_dir: str, where: str | None = None) -> DataFrame:
    df = load_table(spark, sf_dir, "events")
    if where:
        df = df.where(where)
    return df.selectExpr(*[f"{e} AS {n}" for n, e in EVENT_POINT_EXPRS.items()])


# -- synthetic raster cells from events: a dense-ish value grid --
# 64x64 grid; value = integer-valued double (exact aggregation).
CELL_EXPRS: dict[str, str] = {
    "row": "CAST((event_id * 48271) % 64 AS BIGINT)",
    "col": "CAST((event_id * 69621 + user_id) % 64 AS BIGINT)",
    "value": "CAST((event_id * 7 + user_id * 13) % 997 AS DOUBLE)",
}


def cells_cte(table: str = "events", name: str = "cells") -> str:
    return f"WITH {name} AS ({select_sql(CELL_EXPRS, table)})"


def event_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").selectExpr(
        *[f"{e} AS {n}" for n, e in CELL_EXPRS.items()]
    )
