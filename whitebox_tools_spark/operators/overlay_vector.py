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
