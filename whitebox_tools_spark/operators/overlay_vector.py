"""Geometric vector overlay — polygon clipping joins.

Reference anchors (semantics, not algorithm — WBT splits polylines at
intersections and reassembles fragments; we clip directly):
- Clip (vector x polygon, geometric trimming): gis_analysis/clip.rs
- ClipRasterToPolygon window case: gis_analysis/clip_raster_to_polygon.rs
- Intersect (geometric AND of two layers): gis_analysis/intersect.rs

Two operators:
- clip_features_window: clip every feature to an axis-aligned window.
  Axis-aligned Sutherland-Hodgman inserts window coordinates VERBATIM
  for the clipped ordinate (no interpolation error on that axis), so
  clipped bounding boxes are exact selections — the oracle-gated
  invariant.
- intersect_features: pairwise geometric intersection where the right
  layer is CONVEX (rect/diamond/triangle/hex windows — the dominant
  practical case). Candidate pairs come from a broadcast bbox-overlap
  join; the per-pair Sutherland-Hodgman kernel runs batched in
  applyInPandas. General concave-concave overlay (full intersect.rs
  fragment reassembly) is future work.

Physical plan: bbox join (codegen) -> groupBy pair key -> numpy kernel.
At scale the bbox join becomes the FRS cell-cover join from pip_join
(same candidate machinery).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BooleanType, DoubleType, IntegerType,
                               LongType, StructField, StructType)

_PARTS_T = ArrayType(StructType([
    StructField("part_idx", IntegerType(), False),
    StructField("is_hole", BooleanType(), False),
    StructField("ring", ArrayType(StructType([
        StructField("x", DoubleType(), False),
        StructField("y", DoubleType(), False),
    ])), False),
]))


def _clip_ring_halfplane(ring: list, inside, intersect) -> list:
    """One Sutherland-Hodgman pass. ring: open list of (x, y)."""
    out = []
    n = len(ring)
    for i in range(n):
        cur, prev = ring[i], ring[i - 1]
        cin, pin = inside(cur), inside(prev)
        if cin:
            if not pin:
                out.append(intersect(prev, cur))
            out.append(cur)
        elif pin:
            out.append(intersect(prev, cur))
    return out


def clip_ring_window(ring: list, xmin: float, ymin: float, xmax: float, ymax: float) -> list:
    """Clip a closed ring to an axis-aligned window; returns a closed
    ring (or []). The clipped ordinate is set to the window coordinate
    verbatim; only the free ordinate interpolates."""
    r = ring[:-1] if len(ring) > 1 and ring[0] == ring[-1] else list(ring)

    def ix_v(edge_x):
        def f(p, q):
            (x1, y1), (x2, y2) = p, q
            t = (edge_x - x1) / (x2 - x1)
            return (edge_x, y1 + t * (y2 - y1))
        return f

    def ix_h(edge_y):
        def f(p, q):
            (x1, y1), (x2, y2) = p, q
            t = (edge_y - y1) / (y2 - y1)
            return (x1 + t * (x2 - x1), edge_y)
        return f

    for inside, ix in (
        (lambda p: p[0] >= xmin, ix_v(xmin)),
        (lambda p: p[0] <= xmax, ix_v(xmax)),
        (lambda p: p[1] >= ymin, ix_h(ymin)),
        (lambda p: p[1] <= ymax, ix_h(ymax)),
    ):
        r = _clip_ring_halfplane(r, inside, ix)
        if not r:
            return []
    return r + [r[0]]


def clip_ring_convex(ring: list, clip_ring: list) -> list:
    """Clip a closed ring against a convex closed clip ring (either
    orientation; interior determined from the clip ring's own signed
    area)."""
    r = ring[:-1] if len(ring) > 1 and ring[0] == ring[-1] else list(ring)
    c = clip_ring[:-1] if clip_ring[0] == clip_ring[-1] else list(clip_ring)
    area2 = sum(c[i][0] * c[(i + 1) % len(c)][1] - c[(i + 1) % len(c)][0] * c[i][1]
                for i in range(len(c)))
    sign = 1.0 if area2 > 0 else -1.0  # CCW -> interior left of edges

    for i in range(len(c)):
        (ex1, ey1), (ex2, ey2) = c[i], c[(i + 1) % len(c)]

        def inside(p, ex1=ex1, ey1=ey1, ex2=ex2, ey2=ey2):
            return sign * ((ex2 - ex1) * (p[1] - ey1) - (p[0] - ex1) * (ey2 - ey1)) >= 0.0

        def ix(p, q, ex1=ex1, ey1=ey1, ex2=ex2, ey2=ey2):
            (x1, y1), (x2, y2) = p, q
            dcx, dcy = ex2 - ex1, ey2 - ey1
            dsx, dsy = x2 - x1, y2 - y1
            denom = dcx * dsy - dcy * dsx
            t = (dcx * (ey1 - y1) - dcy * (ex1 - x1)) / denom
            return (x1 + t * dsx, y1 + t * dsy)

        r = _clip_ring_halfplane(r, inside, ix)
        if not r:
            return []
    return r + [r[0]]


def difference_ring_convex(ring: list, clip_ring: list) -> list[list]:
    """subject \\ convex clip, decomposed into disjoint convex-clippable
    pieces: piece_i = subject ∩ H_1 ∩ ... ∩ H_{i-1} ∩ ¬H_i over the clip
    edges' interior half-planes (Difference semantics,
    gis_analysis/difference.rs, for a convex eraser)."""
    r0 = ring[:-1] if len(ring) > 1 and ring[0] == ring[-1] else list(ring)
    c = clip_ring[:-1] if clip_ring[0] == clip_ring[-1] else list(clip_ring)
    area2 = sum(c[i][0] * c[(i + 1) % len(c)][1] - c[(i + 1) % len(c)][0] * c[i][1]
                for i in range(len(c)))
    sign = 1.0 if area2 > 0 else -1.0

    def halfplane(i):
        (ex1, ey1), (ex2, ey2) = c[i], c[(i + 1) % len(c)]

        def val(p):
            return sign * ((ex2 - ex1) * (p[1] - ey1) - (p[0] - ex1) * (ey2 - ey1))

        def ix(p, q):
            (x1, y1), (x2, y2) = p, q
            dcx, dcy = ex2 - ex1, ey2 - ey1
            dsx, dsy = x2 - x1, y2 - y1
            denom = dcx * dsy - dcy * dsx
            t = (dcx * (ey1 - y1) - dcy * (ex1 - x1)) / denom
            return (x1 + t * dsx, y1 + t * dsy)

        return val, ix

    pieces = []
    current = r0  # subject ∩ H_1..H_{i-1}
    for i in range(len(c)):
        val, ix = halfplane(i)
        outside = _clip_ring_halfplane(current, lambda p: val(p) <= 0.0, ix)
        if len(outside) >= 3:
            pieces.append(outside + [outside[0]])
        current = _clip_ring_halfplane(current, lambda p: val(p) >= 0.0, ix)
        if not current:
            break
    return pieces


def _parts_to_rows(parts):
    return [(p["part_idx"], p["is_hole"], [(v["x"], v["y"]) for v in p["ring"]])
            for p in parts]


def _rows_to_parts(rows):
    return [{"part_idx": i, "is_hole": h,
             "ring": [{"x": float(x), "y": float(y)} for x, y in ring]}
            for i, (_, h, ring) in enumerate(rows)]


def clip_features_window(features: DataFrame, window: tuple[float, float, float, float],
                         id_col: str = "shape_id") -> DataFrame:
    """Clip every feature's rings to (xmin, ymin, xmax, ymax); features
    clipped away entirely produce no row."""
    xmin, ymin, xmax, ymax = window
    schema = StructType([
        StructField(id_col, LongType(), False),
        StructField("parts", _PARTS_T, False),
    ])

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out_ids, out_parts = [], []
        for _, row in pdf.iterrows():
            new_rows = []
            for pidx, is_hole, ring in _parts_to_rows(row["parts"]):
                clipped = clip_ring_window(ring, xmin, ymin, xmax, ymax)
                if len(clipped) >= 4:
                    new_rows.append((pidx, is_hole, clipped))
            if any(not h for _, h, _ in new_rows):
                out_ids.append(row[id_col])
                out_parts.append(_rows_to_parts(new_rows))
        return pd.DataFrame({
            id_col: pd.Series(out_ids, dtype="int64"),
            "parts": pd.Series(out_parts, dtype="object"),
        })

    return features.select(id_col, "parts").mapInPandas(
        lambda it: (run(pdf) for pdf in it), schema=schema
    )


def difference_features(a: DataFrame, b: DataFrame,
                        a_id: str = "shape_id", b_id: str = "clip_id") -> DataFrame:
    """Per-pair geometric difference a \\ b (b convex): output one
    feature per overlapping pair whose difference is non-empty; parts =
    the disjoint remainder pieces. Features of `a` overlapping no `b`
    pass through unchanged with sentinel {b_id} = -1 (full Difference
    semantics for one eraser layer with non-overlapping erasers —
    gis_analysis/difference.rs keeps un-erased features)."""
    import pyarrow  # noqa: F401

    inter = intersect_features(a, b, a_id, b_id).selectExpr(f"{a_id}", f"{b_id}")
    schema = StructType([
        StructField(a_id, LongType(), False),
        StructField(b_id, LongType(), False),
        StructField("parts", _PARTS_T, False),
    ])

    def bbox_parts(df, idc, alias):
        return df.selectExpr(idc, f"parts AS {alias}")

    cand = (
        bbox_parts(a, a_id, "a_parts")
        .join(inter, a_id, "inner")
        .join(F.broadcast(bbox_parts(b, b_id, "b_parts")), b_id, "inner")
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        oa, ob, op = [], [], []
        for _, row in pdf.iterrows():
            clip_shells = [ring for _, h, ring in _parts_to_rows(row["b_parts"]) if not h]
            if not clip_shells:
                continue
            clip_ring = clip_shells[0]
            new_rows = []
            for pidx, is_hole, ring in _parts_to_rows(row["a_parts"]):
                for piece in difference_ring_convex(ring, clip_ring):
                    if len(piece) >= 4:
                        new_rows.append((pidx, is_hole, piece))
            if any(not h for _, h, _ in new_rows):
                oa.append(row[a_id])
                ob.append(row[b_id])
                op.append(_rows_to_parts(new_rows))
        return pd.DataFrame({
            a_id: pd.Series(oa, dtype="int64"),
            b_id: pd.Series(ob, dtype="int64"),
            "parts": pd.Series(op, dtype="object"),
        })

    erased = cand.mapInPandas(lambda it: (run(pdf) for pdf in it), schema=schema)
    # features of `a` overlapping no eraser pass through unchanged
    untouched = (
        a.join(inter.select(a_id).distinct(), a_id, "left_anti")
        .selectExpr(a_id, f"CAST(-1 AS BIGINT) AS {b_id}", "parts")
    )
    return erased.unionByName(untouched)


def intersect_features(a: DataFrame, b: DataFrame,
                       a_id: str = "shape_id", b_id: str = "clip_id") -> DataFrame:
    """Geometric intersection of layer a with CONVEX layer b: one output
    feature per overlapping (a, b) pair. Candidates from a broadcast
    bbox-overlap join; refine with the Sutherland-Hodgman kernel."""
    def bbox(df, idc):
        return df.selectExpr(
            idc, "parts",
            "AGGREGATE(FLATTEN(TRANSFORM(parts, p -> p.ring)), "
            "CAST(1.0e308 AS DOUBLE), (acc, v) -> LEAST(acc, v.x)) AS xmin",
            "AGGREGATE(FLATTEN(TRANSFORM(parts, p -> p.ring)), "
            "CAST(-1.0e308 AS DOUBLE), (acc, v) -> GREATEST(acc, v.x)) AS xmax",
            "AGGREGATE(FLATTEN(TRANSFORM(parts, p -> p.ring)), "
            "CAST(1.0e308 AS DOUBLE), (acc, v) -> LEAST(acc, v.y)) AS ymin",
            "AGGREGATE(FLATTEN(TRANSFORM(parts, p -> p.ring)), "
            "CAST(-1.0e308 AS DOUBLE), (acc, v) -> GREATEST(acc, v.y)) AS ymax",
        )

    aa = bbox(a, a_id).withColumnRenamed("parts", "a_parts")
    bb = bbox(b, b_id).selectExpr(b_id, "parts AS b_parts", "xmin AS bxmin",
                                  "xmax AS bxmax", "ymin AS bymin", "ymax AS bymax")
    cand = aa.join(
        F.broadcast(bb),
        (F.col("xmin") <= F.col("bxmax")) & (F.col("xmax") >= F.col("bxmin"))
        & (F.col("ymin") <= F.col("bymax")) & (F.col("ymax") >= F.col("bymin")),
        "inner",
    ).select(a_id, b_id, "a_parts", "b_parts")

    schema = StructType([
        StructField(a_id, LongType(), False),
        StructField(b_id, LongType(), False),
        StructField("parts", _PARTS_T, False),
    ])

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        oa, ob, op = [], [], []
        for _, row in pdf.iterrows():
            clip_shells = [ring for _, h, ring in _parts_to_rows(row["b_parts"]) if not h]
            if not clip_shells:
                continue
            clip_ring = clip_shells[0]
            new_rows = []
            for pidx, is_hole, ring in _parts_to_rows(row["a_parts"]):
                clipped = clip_ring_convex(ring, clip_ring)
                if len(clipped) >= 4:
                    new_rows.append((pidx, is_hole, clipped))
            if any(not h for _, h, _ in new_rows):
                oa.append(row[a_id])
                ob.append(row[b_id])
                op.append(_rows_to_parts(new_rows))
        return pd.DataFrame({
            a_id: pd.Series(oa, dtype="int64"),
            b_id: pd.Series(ob, dtype="int64"),
            "parts": pd.Series(op, dtype="object"),
        })

    return cand.mapInPandas(lambda it: (run(pdf) for pdf in it), schema=schema)


# ---------------------------------------------------------------------------
# General concave x concave overlay (union / intersect / difference /
# symmetric difference) — functions/poly_overlay.py kernel per pair
# (gis_analysis/union.rs, intersect.rs, erase.rs,
# symmetrical_difference.rs semantics)
# ---------------------------------------------------------------------------


def overlay_features(a: DataFrame, b: DataFrame, mode: str,
                     a_id: str = "shape_id", b_id: str = "clip_id") -> DataFrame:
    """Pairwise geometric overlay of two polygon layers (holes-aware,
    concave x concave). One output row per bbox-overlapping pair whose
    result region is non-empty; pass-through rows (sentinel -1 partner
    id) complete the layer semantics:

      intersect            overlapping pairs only
      difference           + untouched features of `a`
      union                + untouched features of both layers
      symmetric_difference + untouched features of both layers

    Physical plan: broadcast bbox join -> mapInPandas batches through
    the poly_overlay kernel. For a large right side swap the broadcast
    for the FRS cell-cover join (pip_join machinery) — the kernel stage
    is unchanged.
    """
    from ..functions.poly_overlay import overlay_rings

    if mode not in {"intersect", "union", "difference", "symmetric_difference"}:
        raise ValueError(mode)

    def bbox(df, idc):
        return df.selectExpr(
            idc, "parts",
            "AGGREGATE(FLATTEN(TRANSFORM(parts, p -> p.ring)), "
            "CAST(1.0e308 AS DOUBLE), (acc, v) -> LEAST(acc, v.x)) AS xmin",
            "AGGREGATE(FLATTEN(TRANSFORM(parts, p -> p.ring)), "
            "CAST(-1.0e308 AS DOUBLE), (acc, v) -> GREATEST(acc, v.x)) AS xmax",
            "AGGREGATE(FLATTEN(TRANSFORM(parts, p -> p.ring)), "
            "CAST(1.0e308 AS DOUBLE), (acc, v) -> LEAST(acc, v.y)) AS ymin",
            "AGGREGATE(FLATTEN(TRANSFORM(parts, p -> p.ring)), "
            "CAST(-1.0e308 AS DOUBLE), (acc, v) -> GREATEST(acc, v.y)) AS ymax",
        )

    aa = bbox(a, a_id).withColumnRenamed("parts", "a_parts")
    bb = bbox(b, b_id).selectExpr(b_id, "parts AS b_parts", "xmin AS bxmin",
                                  "xmax AS bxmax", "ymin AS bymin", "ymax AS bymax")
    cand = aa.join(
        F.broadcast(bb),
        (F.col("xmin") <= F.col("bxmax")) & (F.col("xmax") >= F.col("bxmin"))
        & (F.col("ymin") <= F.col("bymax")) & (F.col("ymax") >= F.col("bymin")),
        "inner",
    ).select(a_id, b_id, "a_parts", "b_parts")

    schema = StructType([
        StructField(a_id, LongType(), False),
        StructField(b_id, LongType(), False),
        StructField("parts", _PARTS_T, False),
    ])

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        oa, ob, op = [], [], []
        for _, row in pdf.iterrows():
            pa = [(h, r) for _i, h, r in _parts_to_rows(row["a_parts"])]
            pb = [(h, r) for _i, h, r in _parts_to_rows(row["b_parts"])]
            res = overlay_rings(pa, pb, mode)
            if any(not h for h, _r in res):
                oa.append(row[a_id])
                ob.append(row[b_id])
                op.append(_rows_to_parts([(i, h, r) for i, (h, r) in enumerate(res)]))
        return pd.DataFrame({
            a_id: pd.Series(oa, dtype="int64"),
            b_id: pd.Series(ob, dtype="int64"),
            "parts": pd.Series(op, dtype="object"),
        })

    paired = cand.mapInPandas(lambda it: (run(pdf) for pdf in it), schema=schema)
    outs = [paired]
    pair_ids = cand.select(a_id, b_id)
    if mode in {"difference", "union", "symmetric_difference"}:
        outs.append(
            a.join(pair_ids.select(a_id).distinct(), a_id, "left_anti")
            .selectExpr(a_id, f"CAST(-1 AS BIGINT) AS {b_id}", "parts")
        )
    if mode in {"union", "symmetric_difference"}:
        outs.append(
            b.join(pair_ids.select(b_id).distinct(), b_id, "left_anti")
            .selectExpr(f"CAST(-1 AS BIGINT) AS {a_id}", b_id, "parts")
        )
    from functools import reduce

    return reduce(lambda x, y: x.unionByName(y), outs)


def union_features(a: DataFrame, b: DataFrame,
                   a_id: str = "shape_id", b_id: str = "clip_id") -> DataFrame:
    """Pairwise Union (gis_analysis/union.rs semantics for two layers)."""
    return overlay_features(a, b, "union", a_id, b_id)


def symmetric_difference_features(a: DataFrame, b: DataFrame,
                                  a_id: str = "shape_id",
                                  b_id: str = "clip_id") -> DataFrame:
    """Pairwise SymmetricalDifference (symmetrical_difference.rs)."""
    return overlay_features(a, b, "symmetric_difference", a_id, b_id)


def intersect_features_general(a: DataFrame, b: DataFrame,
                               a_id: str = "shape_id",
                               b_id: str = "clip_id") -> DataFrame:
    """Concave x concave Intersect (intersect.rs full semantics; the
    convex-right-side intersect_features stays as the fast path)."""
    return overlay_features(a, b, "intersect", a_id, b_id)


def erase_features(a: DataFrame, b: DataFrame,
                   a_id: str = "shape_id", b_id: str = "clip_id") -> DataFrame:
    """Concave x concave Erase/Difference (erase.rs full semantics)."""
    return overlay_features(a, b, "difference", a_id, b_id)


# ---------------------------------------------------------------------------
# Dissolve (gis_analysis/dissolve.rs): remove shared boundaries between
# same-group features — a pure DataFrame edge-cancellation plan
# ---------------------------------------------------------------------------


def dissolve(features: DataFrame, key_col: str,
             id_col: str = "shape_id") -> DataFrame:
    """Dissolve features by attribute: boundaries shared by two features
    of the same group cancel; the surviving edges stitch into the merged
    rings. Assumes planar, non-overlapping inputs with exactly matching
    shared-edge vertices (the dissolve.rs contract).

    Plan shape: normalize orientations + explode to directed edges
    (one pandas pass), cancel shared edges with ONE groupBy on the
    undirected edge key, stitch survivors per group (applyInPandas).
    Every stage shuffles on small keys — nothing pairwise, nothing
    driver-side.
    """
    from ..functions.poly_overlay import normalize_rings

    edge_schema = StructType([
        StructField("grp", LongType(), False),
        StructField("x1", DoubleType(), False),
        StructField("y1", DoubleType(), False),
        StructField("x2", DoubleType(), False),
        StructField("y2", DoubleType(), False),
    ])

    def to_edges(pdf: pd.DataFrame) -> pd.DataFrame:
        g, x1, y1, x2, y2 = [], [], [], [], []
        for _, row in pdf.iterrows():
            rings = normalize_rings(
                [(h, r) for _i, h, r in _parts_to_rows(row["parts"])]
            )
            for _h, r in rings:
                for i in range(len(r) - 1):
                    if r[i] == r[i + 1]:
                        continue
                    g.append(row[key_col])
                    x1.append(r[i][0]); y1.append(r[i][1])
                    x2.append(r[i + 1][0]); y2.append(r[i + 1][1])
        return pd.DataFrame({"grp": pd.Series(g, dtype="int64"),
                             "x1": x1, "y1": y1, "x2": x2, "y2": y2})

    edges = features.select(key_col, "parts").mapInPandas(
        lambda it: (to_edges(pdf) for pdf in it), schema=edge_schema
    )
    # undirected key; shared boundaries appear exactly twice (opposite
    # directions after orientation normalization) and cancel
    keyed = edges.selectExpr(
        "grp", "x1", "y1", "x2", "y2",
        "STRUCT(LEAST(STRUCT(x1 AS x, y1 AS y), STRUCT(x2 AS x, y2 AS y)) AS lo, "
        "GREATEST(STRUCT(x1 AS x, y1 AS y), STRUCT(x2 AS x, y2 AS y)) AS hi) AS ekey",
    )
    counts = keyed.groupBy("grp", "ekey").agg(F.count(F.lit(1)).alias("__n"))
    survivors = (
        keyed.join(counts, ["grp", "ekey"])
        .where("__n = 1")
        .select("grp", "x1", "y1", "x2", "y2")
    )

    out_schema = StructType([
        StructField("grp", LongType(), False),
        StructField("parts", _PARTS_T, False),
    ])

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions.poly_overlay import _stitch, ring_signed_area2

        frags = [((row.x1, row.y1), (row.x2, row.y2)) for row in pdf.itertuples()]
        rings = _stitch(frags)
        rows = [(i, ring_signed_area2(r) < 0, r) for i, r in enumerate(rings)]
        if not rows:
            return pd.DataFrame({"grp": pd.Series([], dtype="int64"),
                                 "parts": pd.Series([], dtype="object")})
        return pd.DataFrame({"grp": pd.Series([key[0]], dtype="int64"),
                             "parts": pd.Series([_rows_to_parts(rows)], dtype="object")})

    return survivors.groupBy("grp").applyInPandas(assemble, schema=out_schema)
