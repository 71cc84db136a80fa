"""Bit-exactness locks for the Arrow fold kernels and the grid-blocked
intersection join (round-5 perf rewrites of interpreted SQL plans).

Each test pins a rewritten kernel against the SQL expression tree it
replaced: the rewrites are only admissible on oracle-gated plans
because they reproduce the SQL fold's IEEE operation sequence exactly,
and these tests keep that claim checkable after any future edit."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _rand_vecs(spark, n, dim, seed, name):
    rng = np.random.RandomState(seed)
    rows = [(i, [float(np.float32(v)) for v in rng.randn(dim)])
            for i in range(n)]
    return spark.createDataFrame(rows, f"{name}_id long, vec array<float>")


def test_cosine_fold_udf_bitwise_matches_sql_fold(spark):
    from whitebox_tools_spark.operators.similarity import _cosine_fold_udf

    a = _rand_vecs(spark, 40, 17, 7, "a")
    b = _rand_vecs(spark, 40, 17, 11, "b")
    pairs = a.selectExpr("a_id", "vec AS va") \
        .crossJoin(b.selectExpr("b_id", "vec AS vb"))
    dot = ("AGGREGATE(ZIP_WITH(va, vb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
           "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    na = ("SQRT(AGGREGATE(va, CAST(0.0 AS DOUBLE), "
          "(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")
    nb = ("SQRT(AGGREGATE(vb, CAST(0.0 AS DOUBLE), "
          "(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")
    both = pairs.selectExpr(
        "a_id", "b_id", "va", "vb",
        f"({dot}) / (({na}) * ({nb})) AS c_sql",
    ).withColumn("c_udf", _cosine_fold_udf("va", "vb"))
    assert both.where("c_sql IS DISTINCT FROM c_udf").count() == 0


def test_lsh_codes_bitwise_match_sql_fold(spark):
    from whitebox_tools_spark.operators.similarity import lsh_buckets

    num_planes, dim = 8, 16
    df = _rand_vecs(spark, 80, dim, 3, "v").withColumnRenamed("vec", "embedding")
    rng = np.random.RandomState(42)
    planes = rng.randn(num_planes, dim)
    bits = []
    for p in range(num_planes):
        coef = ", ".join(repr(float(c)) for c in planes[p])
        dot = (f"AGGREGATE(ZIP_WITH(embedding, ARRAY({coef}), "
               "(x, w) -> CAST(x AS DOUBLE) * w), "
               "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
        bits.append(f"(CASE WHEN ({dot}) > 0.0 THEN {1 << p} ELSE 0 END)")
    old = df.selectExpr("v_id", "(" + " + ".join(bits) + ") AS old_code")
    new = lsh_buckets(df, num_planes=num_planes, dim=dim) \
        .selectExpr("v_id", "lsh_bucket AS new_code")
    j = old.join(new, "v_id")
    assert j.count() == 80
    assert j.where("old_code <> new_code").count() == 0


def test_line_intersections_grid_matches_bruteforce(spark):
    from whitebox_tools_spark.operators.vector_ops import line_intersections

    rng = np.random.RandomState(5)
    rows = []
    for i in range(60):
        x1, y1 = rng.uniform(0, 100, 2)
        dx, dy = rng.uniform(-15, 15, 2)
        rows.append((i, 0, float(x1), float(y1), float(x1 + dx), float(y1 + dy)))
    segs = spark.createDataFrame(
        rows, "shape_id long, seg_idx int, x1 double, y1 double, "
              "x2 double, y2 double")
    out = line_intersections(segs, segs).where("a_id < b_id")
    got = {(r.a_id, r.b_id, r.t, r.u, r.ix, r.iy) for r in out.collect()}

    # brute-force reference: every pair, same closed-form arithmetic
    want = set()
    for (ai, _, ax1, ay1, ax2, ay2) in rows:
        for (bi, _, bx1, by1, bx2, by2) in rows:
            if not ai < bi:
                continue
            den = (ax2 - ax1) * (by2 - by1) - (ay2 - ay1) * (bx2 - bx1)
            if den == 0.0:
                continue
            t = ((bx1 - ax1) * (by2 - by1) - (by1 - ay1) * (bx2 - bx1)) / den
            u = ((bx1 - ax1) * (ay2 - ay1) - (by1 - ay1) * (ax2 - ax1)) / den
            if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
                want.add((ai, bi, t, u, ax1 + t * (ax2 - ax1),
                          ay1 + t * (ay2 - ay1)))
    assert got == want


def test_line_intersections_duplicate_keys_keep_multiset(spark):
    """Rows sharing one (shape_id, seg_idx) key are distinct physical
    segments (select_tiles feeds all four rectangle edges under one
    key); the canonical-cell filter must keep every pair's row, where a
    pair-key dedupe silently dropped real intersections."""
    from whitebox_tools_spark.operators.vector_ops import line_intersections

    # a rectangle's 4 edges under ONE key vs a diagonal crossing two of them
    rect = [(7, 0, 0.0, 0.0, 10.0, 0.0), (7, 0, 10.0, 0.0, 10.0, 10.0),
            (7, 0, 10.0, 10.0, 0.0, 10.0), (7, 0, 0.0, 10.0, 0.0, 0.0)]
    diag = [(1, 0, -5.0, 5.0, 15.0, 5.0)]
    a = spark.createDataFrame(
        rect, "shape_id long, seg_idx int, x1 double, y1 double, "
              "x2 double, y2 double")
    b = spark.createDataFrame(
        diag, "shape_id long, seg_idx int, x1 double, y1 double, "
              "x2 double, y2 double")
    out = line_intersections(a, b).collect()
    # the horizontal line crosses BOTH vertical edges -> two rows
    assert len(out) == 2
    assert sorted(round(r.ix, 9) for r in out) == [0.0, 10.0]


def test_line_intersections_explicit_cell_same_result(spark):
    from whitebox_tools_spark.operators.vector_ops import line_intersections

    rows = [(0, 0, 0.0, 0.0, 10.0, 10.0), (1, 0, 0.0, 10.0, 10.0, 0.0),
            (2, 0, -5.0, 5.0, 50.0, 5.0)]
    segs = spark.createDataFrame(
        rows, "shape_id long, seg_idx int, x1 double, y1 double, "
              "x2 double, y2 double")
    auto = {(r.a_id, r.b_id, r.ix, r.iy)
            for r in line_intersections(segs, segs).where("a_id < b_id").collect()}
    small = {(r.a_id, r.b_id, r.ix, r.iy)
             for r in line_intersections(segs, segs, cell=2.0)
             .where("a_id < b_id").collect()}
    assert auto == small
    assert (0, 1, 5.0, 5.0) in auto
