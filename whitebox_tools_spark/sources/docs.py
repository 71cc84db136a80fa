"""Interleaved text+media document corpus (BASELINE.json input_hint shape).

docs(doc_id: string, spans: array<struct<kind, text, media_ref, offset>>)

Generated fully on-executor with codegen expressions (spark.range +
higher-order functions + xxhash64) — no driver-side data, so the same
generator scales from 10^3 (pytest) to 10^7 (bench) to 10^12 (cluster)
rows by changing one number. Deterministic: content is a pure function
of doc index and the seed.

Span kinds rotate {text, point, media, polygon}; kind="point" carries a
coordinate payload "x;y" in [0,1000)^2, kind="media" carries
media_ref = "s3://fix/<doc_id>/<j>.bin". (Mirrors FIXTURES.md F1.)

Extractors pull a typed spatial layer out of `spans` WITHOUT touching
the spans payload — the span-sequence invariant (kind, text, media_ref,
order) is every operator's per-row contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KINDS = "ARRAY('text', 'point', 'media', 'polygon')"
_WORDS = (
    "ARRAY('spark','tile','join','index','cell','raster','vector','grid',"
    "'point','poly','scan','merge','shuffle','batch','arrow','window')"
)


def synth_docs(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    """Deterministic interleaved corpus of n_docs documents."""
    df = spark.range(n_docs).withColumnRenamed("id", "i")
    n_spans = f"(3 + PMOD(XXHASH64(i, {seed}), 10))"
    # per-span deterministic fields, all codegen (no UDF)
    kind = f"ELEMENT_AT({_KINDS}, CAST(PMOD(XXHASH64(i, j, {seed}, 1), 4) AS INT) + 1)"
    px = f"CAST(PMOD(XXHASH64(i, j, {seed}, 2), 1000000) AS DOUBLE) / 1000.0"
    py = f"CAST(PMOD(XXHASH64(i, j, {seed}, 3), 1000000) AS DOUBLE) / 1000.0"
    word = f"ELEMENT_AT({_WORDS}, CAST(PMOD(XXHASH64(i, j, {seed}, 4), 16) AS INT) + 1)"
    text = (
        f"CASE WHEN {kind} = 'point' THEN CONCAT(CAST({px} AS STRING), ';', CAST({py} AS STRING)) "
        f"WHEN {kind} = 'media' THEN '' "
        f"ELSE CONCAT({word}, ' ', ELEMENT_AT({_WORDS}, CAST(PMOD(XXHASH64(i, j, {seed}, 5), 16) AS INT) + 1)) END"
    )
    media_ref = (
        f"CASE WHEN {kind} = 'media' THEN CONCAT('s3://fix/doc-', LPAD(CAST(i AS STRING), 12, '0'), "
        f"'/', CAST(j AS STRING), '.bin') ELSE '' END"
    )
    span = f"STRUCT({kind} AS kind, {text} AS text, {media_ref} AS media_ref, CAST(j AS INT) AS offset)"
    return df.select(
        F.expr("CONCAT('doc-', LPAD(CAST(i AS STRING), 12, '0'))").alias("doc_id"),
        F.col("i").alias("doc_num"),
        F.expr(f"TRANSFORM(SEQUENCE(0, {n_spans} - 1), j -> {span})").alias("spans"),
    )


def extract_points(docs: DataFrame) -> DataFrame:
    """Point layer from kind='point' spans; spans payload untouched.

    record_num = doc_num * 16 + offset (unique, order-stable — the kNN /
    assign-op tie-break key, FIXTURES.md F2).
    """
    exploded = docs.select(
        "doc_id",
        "doc_num",
        F.posexplode("spans").alias("pos", "span"),
    ).where(F.col("span.kind") == "point")
    return exploded.select(
        (F.col("doc_num") * 16 + F.col("span.offset")).alias("record_num"),
        "doc_id",
        F.expr("CAST(SPLIT(span.text, ';')[0] AS DOUBLE)").alias("x"),
        F.expr("CAST(SPLIT(span.text, ';')[1] AS DOUBLE)").alias("y"),
        F.expr("CAST(PMOD(XXHASH64(doc_id, span.offset), 1000) AS DOUBLE)").alias("value"),
        F.expr("CAST(PMOD(XXHASH64(doc_id), 7) AS INT)").alias("category"),
    )


def spans_fingerprint(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Canonical per-doc hash of the span sequence (kind, text, media_ref,
    order) — compare before/after any operator to prove the invariant."""
    return docs.select(
        id_col,
        F.expr(
            "XXHASH64(AGGREGATE(spans, CAST(42 AS BIGINT), "
            "(acc, s) -> XXHASH64(acc, s.kind, s.text, s.media_ref, s.offset)))"
        ).alias("spans_fp"),
    )
