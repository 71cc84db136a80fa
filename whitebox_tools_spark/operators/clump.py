"""Clump — raster connected components (equal-value regions).

Reference: gis_analysis/clump.rs:234-286 — row-major BFS over 4- or
8-connected neighbors with equal cell values, assigning incremental
clump ids in discovery order.

Spark plan: iterative min-label propagation. Every cell starts with its
linear index (row*C + col); each round, a cell adopts the minimum label
among itself and its same-valued neighbors (one scatter + one hash agg
per round, lineage truncated with localCheckpoint). On convergence each
component carries the linear index of its row-major-first cell — which
is exactly the cell where the reference BFS *starts* that clump, so
DENSE_RANK over representatives reproduces WBT's id numbering
(1-based, row-major discovery order).

Rounds grow with component diameter (in label-graph hops); each round
the frontier shrinks, and the `changed` count gates termination. For
elongated components at scale, alternate with label-pointer jumping
(label -> label-of-representative join) — implemented as every third
round below, which bounds rounds at O(log diameter) for path graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.iterate import ensure_converged


def clump(cells: DataFrame, columns: int, diag: bool = True,
          max_rounds: int = 64) -> DataFrame:
    """Label equal-value connected regions.

    Output: (row, col, value, clump_id) with clump_id 1-based in
    row-major discovery order (clump.rs numbering).
    """
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if diag:
        offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    pairs = ", ".join(f"STRUCT(row + ({dr}L) AS nrow, col + ({dc}L) AS ncol)" for dr, dc in offs)

    lbl = cells.selectExpr("row", "col", "value", f"(row * {columns}L + col) AS lbl")
    lbl = lbl.localCheckpoint(eager=True)
    # frontier scatter: a cell's min can only improve when a neighbor's
    # label CHANGED last round (an unchanged neighbor's label was already
    # offered the round after it last changed), so only changed cells
    # scatter — label dynamics are identical to full scatter while the
    # per-round shuffle shrinks with the frontier instead of staying
    # raster-sized. Round 0 scatters everything.
    frontier = lbl

    for round_no in range(max_rounds):
        # scatter each frontier cell's label to its neighbors (value
        # attached so the agg can require equality)
        scattered = frontier.withColumn("__n", F.expr(f"EXPLODE(ARRAY({pairs}))")).selectExpr(
            "__n.nrow AS nrow", "__n.ncol AS ncol", "value AS nvalue", "lbl AS nlbl"
        )
        # value equality belongs in the JOIN condition: isolated cells
        # (no same-valued neighbor) must survive with their own label
        recv = scattered.groupBy("nrow", "ncol", "nvalue").agg(
            F.min("nlbl").alias("mn"))
        new = lbl.join(
            recv,
            (lbl["row"] == recv["nrow"])
            & (lbl["col"] == recv["ncol"])
            & (lbl["value"] == recv["nvalue"]),
            "left",
        ).selectExpr("row", "col", "value", "lbl",
                     "LEAST(COALESCE(mn, lbl), lbl) AS nl")
        if round_no % 3 == 2:
            # pointer jumping: adopt the current label of my label's cell
            owners = new.selectExpr(f"(row * {columns}L + col) AS owner_idx", "nl AS owner_lbl")
            new = (
                new.join(owners, new["nl"] == owners["owner_idx"], "left")
                .selectExpr("row", "col", "value", "lbl",
                            "LEAST(nl, COALESCE(owner_lbl, nl)) AS nl")
            )
        # checkpoint FIRST, then count on the pinned result — counting the
        # un-checkpointed frame would evaluate the round's join twice
        new = new.localCheckpoint(eager=True)
        frontier = new.where(F.col("nl") != F.col("lbl")) \
                      .selectExpr("row", "col", "value", "nl AS lbl")
        changed = frontier.count()
        lbl = new.selectExpr("row", "col", "value", "nl AS lbl")
        if changed == 0:
            break
    else:
        ensure_converged(changed, "clump label propagation", max_rounds)

    from ..plans.rank import dense_rank_small

    reps = dense_rank_small(lbl, "lbl", "clump_id")
    return lbl.join(reps, "lbl").select(
        "row", "col", "value", F.col("clump_id").cast("long").alias("clump_id")
    )


def connected_components(nodes: DataFrame, edges: DataFrame,
                         id_col: str = "id",
                         max_rounds: int = 64,
                         symmetrized: bool = False) -> DataFrame:
    """Generic connected components over an explicit undirected edge
    list: nodes (id) x edges (a, b) -> (id, comp) where comp is the
    smallest node id in the component. Min-label propagation with
    pointer jumping every third round (the clump machinery generalized
    to any edge predicate — callers build `edges` declaratively).

    symmetrized=True: `edges` already contains both (a, b) and (b, a)
    for every pair AND is pinned (checkpointed) by the caller — skips
    this function's own symmetrize + checkpoint barrier (r06; callers
    that pre-pin the edge list anyway save one materialization)."""
    if symmetrized:
        sym = edges
        # the caller pinned the edge list, so the node frame is one
        # cheap distinct over it — no eager barrier of its own (round 0
        # reads it inline, round 1+ read checkpoints)
        lbl = nodes.selectExpr(f"{id_col} AS id", f"{id_col} AS comp")
    else:
        sym = edges.selectExpr("a", "b").unionByName(
            edges.selectExpr("b AS a", "a AS b")).distinct() \
            .localCheckpoint(eager=True)
        # unknown (possibly expensive) node lineage: pin it, since round
        # 0's plan otherwise evaluates it twice (scatter + label join)
        lbl = nodes.selectExpr(f"{id_col} AS id", f"{id_col} AS comp") \
            .localCheckpoint(eager=True)
    # frontier propagation (the clump argument): only nodes whose label
    # changed last round can improve a neighbor's min, so only they
    # scatter; round 0 scatters everything
    frontier = lbl
    for round_no in range(max_rounds):
        nbr = sym.join(frontier.selectExpr("id AS b", "comp AS bcomp"), "b") \
            .groupBy("a").agg(F.min("bcomp").alias("mn")) \
            .withColumnRenamed("a", "id")
        new = lbl.join(nbr, "id", "left").selectExpr(
            "id", "comp AS old", "LEAST(comp, COALESCE(mn, comp)) AS comp")
        if round_no % 3 == 2:
            owners = new.selectExpr("id AS comp", "comp AS owner")
            new = new.join(owners, "comp", "left").selectExpr(
                "id", "old", "LEAST(comp, COALESCE(owner, comp)) AS comp")
        new = new.localCheckpoint(eager=True)
        frontier = new.where("comp <> old").select("id", "comp")
        changed = frontier.count()
        lbl = new.select("id", "comp")
        if changed == 0:
            return lbl
    ensure_converged(1, "connected_components", max_rounds)
    return lbl
