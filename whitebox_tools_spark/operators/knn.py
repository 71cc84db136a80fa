"""Grid-partitioned kNN joins with neighbor-tile (shell) expansion.

Reference: FixedRadiusSearch2D.knn_search
(whitebox-common/src/structures/fixed_radius_search.rs:132-216):
scan the 3x3 center block, then expand square shells one ring at a time
until >= k candidates exist, then keep the k smallest. NOTE the
reference stops WITHOUT checking whether the next shell could hold a
closer point — it is *approximate* (comment at :130).

Two engines:

- ``knn_join_exact`` — same grid machinery but with the correctness
  guarantee: a query finishes at Chebyshev bin reach R only when its
  k-th candidate distance <= (R * bin_size)^2, since any unscanned bin
  is at least R*bin_size away. This is the oracle-gated variant
  (provably equal to brute force).
- ``knn_join_wbt`` — replicates the reference's early stop bit-for-bit
  (stop as soon as >= k candidates are seen), for parity with WBT
  fixture outputs.

Physical plan per round: probe side explodes the ring's neighbor bin
keys (codegen), equi-joins the build side on (cx, cy) — one int64-key
shuffle per round, AQE-skew-split; per-query top-k via min_by-style
window with deterministic (dist2, target id) tie-break. Rounds touch
only still-active queries, so the joins shrink geometrically; at
10^12-doc scale the bin size is chosen from density (WBT's own
radius heuristic) so that round 1 resolves almost everything.

Distances are squared (f64, single expression (dx*dx + dy*dy)) — the
same arithmetic on both Spark and DuckDB, bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cells import neighbor_offsets, with_frs_cells


def _ring_join(
    queries: DataFrame,
    targets: DataFrame,
    reach: int,
    qid: str,
    tid: str,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Candidate pairs from bins at Chebyshev ring `reach` (ring only,
    except reach=1 which is the full 3x3 block)."""
    offs = neighbor_offsets(reach, ring_only=reach > 1)
    pairs = ", ".join(f"STRUCT(qcx + ({dx}L) AS cx, qcy + ({dy}L) AS cy)" for dx, dy in offs)
    probe = queries.withColumn("__n", F.expr(f"EXPLODE(ARRAY({pairs}))")).select(
        qid, "qx", "qy", "qcx", "qcy", F.col("__n.cx").alias("cx"), F.col("__n.cy").alias("cy")
    )
    cand = probe.join(targets, ["cx", "cy"], "inner")
    return cand.select(
        qid,
        "qx",
        "qy",
        "qcx",
        "qcy",
        tid,
        "tx",
        "ty",
        F.expr("(qx - tx) * (qx - tx) + (qy - ty) * (qy - ty)").alias("dist2"),
        *carry,
    )


def _prep(
    queries: DataFrame,
    targets: DataFrame,
    radius: float,
    qid: str,
    tid: str,
    qx: str,
    qy: str,
    tx: str,
    ty: str,
    carry: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    q = queries.select(F.col(qid).alias(qid), F.col(qx).alias("qx"), F.col(qy).alias("qy"))
    q = with_frs_cells(q, radius, x="qx", y="qy", cx="qcx", cy="qcy")
    t = targets.select(
        F.col(tid).alias(tid), F.col(tx).alias("tx"), F.col(ty).alias("ty"), *carry
    )
    t = with_frs_cells(t, radius, x="tx", y="ty", cx="cx", cy="cy")
    return q, t


def _nn1_join(
    queries: DataFrame,
    targets: DataFrame,
    radius: float,
    qid: str,
    tid: str,
    qx: str,
    qy: str,
    tx: str,
    ty: str,
    max_rounds: int,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Exact 1-NN fast path: per-round hash aggregation (min_by) instead
    of a window sort, no cross-round candidate accumulation — the best
    candidate so far rides along with the active query set. Same output
    contract as knn_join_exact with k=1."""
    q, t = _prep(queries, targets, radius, qid, tid, qx, qy, tx, ty, carry)
    t = t.persist()
    bin_size = radius * 0.5
    # carry columns are payload only: the MIN_BY ordering key stays
    # (dist2, tid), so results are unchanged — they just ride the struct
    val = ", ".join(["dist2", tid, *carry])

    active = q.persist()
    resolved_rounds: list[DataFrame] = []
    best: DataFrame | None = None  # (qid, best struct) for still-active queries
    reach = 1
    while reach <= max_rounds:
        cand = _ring_join(active, t, reach, qid, tid, carry)
        round_best = cand.groupBy(qid).agg(
            F.expr(f"MIN_BY(STRUCT({val}), STRUCT(dist2, {tid}))").alias("b")
        )
        if best is not None:
            merged = best.unionByName(round_best)
            round_best = merged.groupBy(qid).agg(
                F.expr("MIN_BY(b, STRUCT(b.dist2, b." + tid + "))").alias("b")
            )
        # one eager materialization anchors the round; resolved/best are
        # cheap filters over the materialized blocks and stay lazy
        # (2 round barriers instead of 4)
        round_best = round_best.localCheckpoint(eager=True)
        # strict <: a target in the first unscanned ring can sit at exactly
        # reach*bin_size; an equal-distance target with a smaller tid would
        # then be missed (tie-break contract), so ties force one more ring
        guarantee = float(reach * bin_size) ** 2
        resolved = round_best.where(F.col("b.dist2") < guarantee)
        resolved_rounds.append(resolved)
        best = round_best.where(~(F.col("b.dist2") < guarantee))
        active_next = active.join(resolved.select(qid), qid, "left_anti") \
                            .localCheckpoint(eager=True)
        n_active = active_next.count()
        active.unpersist()
        active = active_next
        if n_active == 0:
            break
        reach += 1
    else:
        # stragglers: brute force (tiny set)
        cand = active.crossJoin(t.drop("cx", "cy")).select(
            qid,
            F.expr("(qx - tx) * (qx - tx) + (qy - ty) * (qy - ty)").alias("dist2"),
            F.col(tid),
            *carry,
        )
        straggler_best = cand.groupBy(qid).agg(
            F.expr(f"MIN_BY(STRUCT({val}), STRUCT(dist2, {tid}))").alias("b")
        )
        if best is not None:
            straggler_best = best.unionByName(straggler_best).groupBy(qid).agg(
                F.expr("MIN_BY(b, STRUCT(b.dist2, b." + tid + "))").alias("b")
            )
        resolved_rounds.append(straggler_best)

    t.unpersist()
    active.unpersist()
    done = resolved_rounds[0]
    for part in resolved_rounds[1:]:
        done = done.unionByName(part)
    return done.selectExpr(
        qid, f"b.{tid} AS {tid}", "b.dist2 AS dist2",
        *[f"b.{c} AS {c}" for c in carry], "1 AS knn_rank",
    )


def knn_join_exact(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    radius: float,
    qid: str = "query_id",
    tid: str = "target_id",
    qx: str = "x",
    qy: str = "y",
    tx: str = "x",
    ty: str = "y",
    max_rounds: int = 8,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Exact k-nearest-neighbor join.

    Returns (qid, tid, dist2, *carry, knn_rank) with knn_rank in 1..k
    ordered by (dist2, tid) — identical to a brute-force cross join +
    top-k, but with grid-bounded work. bin_size = radius * 0.5 (FRS
    parity binning). k=1 dispatches to the aggregation fast path (no
    window sort). `carry` names extra TARGET columns that ride through
    the join as payload (saving the caller a re-attach shuffle join by
    id); they never enter an ordering key, so results are unchanged.

    The per-query bounded top-k window here plays the role of the
    reference's NMinimizer / NMaximizer heap structures
    (whitebox-common/src/structures/n_minimizer.rs, n_maximizer.rs):
    Spark's partial TakeOrderedAndProject / window rank IS the bounded
    heap, picked by the optimizer instead of hand-rolled.
    """
    if k == 1:
        return _nn1_join(queries, targets, radius, qid, tid, qx, qy, tx, ty,
                         max_rounds, carry)
    spark = queries.sparkSession
    q, t = _prep(queries, targets, radius, qid, tid, qx, qy, tx, ty, carry)
    t = t.persist()
    bin_size = radius * 0.5

    # per-round plan: one Tungsten window sort ranks the ACTIVE queries'
    # accumulated candidates; resolved-ness is a FILTER on the ranked
    # output (rank == k AND kth dist2 inside the guarantee) instead of
    # the former separate done-stats groupBy, and resolved queries'
    # ranked rows move to `done` so later rounds window only the
    # still-active tail (the former plan re-sorted every resolved
    # query's rows on every round)
    w = Window.partitionBy(qid).orderBy("dist2", tid)
    out_cols = [qid, tid, "dist2", *carry, "knn_rank"]

    active = q.persist()
    finished_rounds: list[DataFrame] = []
    best: DataFrame | None = None  # ranked rows for still-active queries
    reach = 1
    while reach <= max_rounds:
        cand = _ring_join(active, t, reach, qid, tid, carry) \
            .select(qid, tid, "dist2", *carry)
        # rings are disjoint (reach=1 is the full 3x3 block, reach>1
        # strict rings), so no (qid, tid) duplicates across rounds
        acc = cand if best is None else best.unionByName(cand)
        # the ONLY eager materializations per round are `ranked` and
        # `active` (lineage truncation); resolved/finished/best are
        # cheap filter-joins over the materialized `ranked` blocks and
        # stay lazy — 2 round barriers instead of 4
        ranked = (
            acc.withColumn("knn_rank", F.row_number().over(w))
            .where(F.col("knn_rank") <= k)
            .select(out_cols)
            .localCheckpoint(eager=True)  # truncate iterative lineage
        )
        # a query is done when it has k candidates and the kth is provably
        # inside the scanned reach: dist2_k < (reach * bin_size)^2 — strict,
        # so an equal-distance target with a smaller tid in the first
        # unscanned ring can never be missed (tie-break contract)
        guarantee = float(reach * bin_size) ** 2
        resolved = ranked.where(
            (F.col("knn_rank") == k) & (F.col("dist2") < F.lit(guarantee))
        ).select(qid)
        finished_rounds.append(ranked.join(resolved, qid, "left_semi"))
        best = ranked.join(resolved, qid, "left_anti").select(qid, tid, "dist2", *carry)
        active_next = active.join(resolved, qid, "left_anti") \
                            .localCheckpoint(eager=True)
        n_active = active_next.count()
        active.unpersist()
        active = active_next
        if n_active == 0:
            break
        reach += 1
    else:
        # exhausted rounds: brute-force the stragglers (tiny set); the
        # cross join re-scans every ring, so prior `best` rows are a
        # subset of these candidates and can be dropped outright
        cand = active.crossJoin(t.drop("cx", "cy")).select(
            qid,
            F.col(tid),
            F.expr("(qx - tx) * (qx - tx) + (qy - ty) * (qy - ty)").alias("dist2"),
            *carry,
        )
        straggler = (
            cand.withColumn("knn_rank", F.row_number().over(w))
            .where(F.col("knn_rank") <= k)
            .select(out_cols)
        )
        finished_rounds.append(straggler)

    t.unpersist()
    active.unpersist()
    done = finished_rounds[0]
    for part in finished_rounds[1:]:
        done = done.unionByName(part)
    return done.select(out_cols)


def knn_join_wbt(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    radius: float,
    qid: str = "query_id",
    tid: str = "target_id",
    qx: str = "x",
    qy: str = "y",
    tx: str = "x",
    ty: str = "y",
    max_rounds: int = 48,
) -> DataFrame:
    """WBT-parity approximate kNN: stop expanding as soon as a query has
    seen >= k candidates (fixed_radius_search.rs:180-204 early stop),
    keep the k smallest by (dist2, tid)."""
    q, t = _prep(queries, targets, radius, qid, tid, qx, qy, tx, ty)
    t = t.persist()

    active = q.persist()
    acc: DataFrame | None = None
    reach = 1
    while reach <= max_rounds:
        cand = _ring_join(active, t, reach, qid, tid)
        acc = cand if acc is None else acc.unionByName(cand)
        w = Window.partitionBy(qid).orderBy("dist2", tid)
        acc = (
            acc.withColumn("knn_rank", F.row_number().over(w))
            .where(F.col("knn_rank") <= k)
            .drop("knn_rank")
            .localCheckpoint(eager=True)  # truncate iterative lineage
        )
        counts = acc.groupBy(qid).agg(F.count(F.lit(1)).alias("n"))
        done = counts.where(F.col("n") >= k).select(qid)
        active_next = active.join(done, qid, "left_anti").localCheckpoint(eager=True)
        n_active = active_next.count()
        active.unpersist()
        active = active_next
        if n_active == 0:
            break
        reach += 1

    t.unpersist()
    w = Window.partitionBy(qid).orderBy("dist2", tid)
    return (
        acc.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
        .select(qid, tid, "dist2", "knn_rank")
    )


# ---------------------------------------------------------------------------
# Gridding tools built on the kNN join
# ---------------------------------------------------------------------------


def wbt_default_radius(extent_area: float, n_points: int) -> float:
    """NearestNeighbourGridding radius heuristic
    (nearest_neighbour_gridding.rs:285-289): 4 * sqrt(area / n)."""
    return 4.0 * (extent_area / float(n_points)) ** 0.5


def grid_cells_df(spark, meta, qid: str = "cell_id"):
    """Cell-center query layer from a GridMeta — spark.range, no data skew.

    x/y use the (col + 0.5) center formulas of
    nearest_neighbour_gridding.rs:447-449.
    """
    df = spark.range(meta.rows * meta.columns).select(
        F.col("id").alias(qid),
        (F.col("id") / meta.columns).cast("long").alias("row"),
        (F.col("id") % meta.columns).alias("col"),
    )
    return df.selectExpr(
        qid,
        "row",
        "col",
        f"{meta.x_center_expr('col')} AS x",
        f"{meta.y_center_expr('row')} AS y",
    )


def nearest_neighbour_gridding(
    points: DataFrame,
    meta,
    max_dist: float | None = None,
    value_col: str = "value",
    point_id: str = "record_num",
    exact: bool = True,
    radius: float | None = None,
    extent_area: float | None = None,
) -> DataFrame:
    """Grid each cell with the value of its nearest point.

    exact=True: provably-nearest (oracle-equal). exact=False: WBT's
    approximate early-stop search (fixture parity).
    Output: (row, col, value) — cells farther than max_dist get no row
    (WBT writes nodata; callers materialize the sentinel on write).

    radius sets ONLY the search-bin size (results are exact for any
    value — the ring guarantee proves the k-th neighbour). radius=None
    derives it from point density with WBT's own heuristic, which is
    the scale-correct default: a pinned radius tuned to one fixture
    over- or under-bins every other density. extent_area short-circuits
    the min/max extent aggregation when the caller knows the bounds
    (one COUNT scan instead of a 5-aggregate pass).
    """
    spark = points.sparkSession
    if radius is None:
        if extent_area is not None:
            radius = wbt_default_radius(extent_area, points.count())
        else:
            ext = points.agg(
                F.min("x"), F.max("x"), F.min("y"), F.max("y"), F.count(F.lit(1))
            ).collect()[0]
            area = (ext[1] - ext[0]) * (ext[3] - ext[2])
            radius = wbt_default_radius(area, ext[4])
    cells = grid_cells_df(spark, meta)
    if exact:
        # value rides the join as carry payload; row/col re-derive from
        # cell_id with grid_cells_df's own expressions — zero re-attach
        # joins after the kNN rounds (formerly two shuffle joins)
        pts = points.withColumn("__nn_value", F.col(value_col))
        nn = knn_join_exact(cells, pts, k=1, radius=radius,
                            qid="cell_id", tid=point_id, carry=("__nn_value",))
        out = nn.withColumnRenamed("__nn_value", "value")
    else:
        nn = knn_join_wbt(cells, points, k=1, radius=radius,
                          qid="cell_id", tid=point_id)
        out = nn.join(
            points.select(F.col(point_id), F.col(value_col).alias("value")), point_id
        )
    out = out.select(
        (F.col("cell_id") / meta.columns).cast("long").alias("row"),
        (F.col("cell_id") % meta.columns).alias("col"),
        "value",
        "dist2",
    )
    if max_dist is not None:
        # WBT compares Euclidean distance (not squared) to max_dist (:454)
        out = out.where(F.sqrt(F.col("dist2")) <= max_dist)
    return out.select("row", "col", "value")


def idw_interpolation(
    points: DataFrame,
    meta,
    k: int = 8,
    weight: float = 2.0,
    value_col: str = "value",
    point_id: str = "record_num",
    radius: float | None = None,
    extent_area: float | None = None,
) -> DataFrame:
    """IDW gridding (idw_interpolation.rs:445-630 semantics): value =
    sum(v / d^w) / sum(1 / d^w) over the k nearest points.

    The two sums are accumulated in (dist2, tid) order on BOTH engines
    (deterministic float summation for oracle parity): neighbors are
    collected, sorted, then folded sequentially with F.aggregate.

    radius is a pure search-bin parameter (exactness is ring-guaranteed
    at any value); None derives it from density — see
    nearest_neighbour_gridding for the extent_area short-circuit.
    """
    spark = points.sparkSession
    if radius is None:
        if extent_area is not None:
            radius = wbt_default_radius(extent_area, points.count())
        else:
            ext = points.agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"), F.count(F.lit(1))).collect()[0]
            area = (ext[1] - ext[0]) * (ext[3] - ext[2])
            radius = wbt_default_radius(area, ext[4])
    cells = grid_cells_df(spark, meta)
    pts = points.withColumn("v", F.col(value_col))
    # v rides the kNN join as carry payload (no re-attach join by id);
    # one fused fold replaces the former separate num/den AGGREGATEs:
    # POWER(dist2, w/2) evaluates once per element (TRANSFORM binding)
    # and each accumulator keeps its exact IEEE op sequence — acc.num
    # adds e.v / p, acc.den adds 1.0 / p, in the same (dist2, v) sort
    # order — so values are bit-identical to the two-fold plan and the
    # DuckDB oracle. Higher-order fns run interpreted; halving the fold
    # passes and the POWER calls is a straight 4x less lambda dispatch.
    nn = knn_join_exact(cells, pts, k=k, radius=radius,
                        qid="cell_id", tid=point_id, carry=("v",))
    half_w = weight / 2.0
    agg = nn.groupBy("cell_id").agg(
        F.expr(
            "AGGREGATE("
            "  TRANSFORM(ARRAY_SORT(COLLECT_LIST(STRUCT(dist2, v))),"
            f"            e -> STRUCT(e.v AS v, POWER(e.dist2, {half_w!r}) AS p)),"
            "  STRUCT(CAST(0.0 AS DOUBLE) AS num, CAST(0.0 AS DOUBLE) AS den),"
            "  (acc, e) -> STRUCT(acc.num + e.v / e.p AS num,"
            "                     acc.den + 1.0 / e.p AS den))"
        ).alias("nd"),
    )
    return agg.select(
        (F.col("cell_id") / meta.columns).cast("long").alias("row"),
        (F.col("cell_id") % meta.columns).alias("col"),
        (F.col("nd.num") / F.col("nd.den")).alias("value"),
    )
