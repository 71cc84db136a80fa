"""Unsupervised classification — k-means over multi-band rasters.

Reference anchors:
- KMeansClustering: image_analysis/k_means_clustering.rs (initial
  centroids spread across each band's range, Lloyd iterations,
  convergence on percent-changed threshold)
- ModifiedKMeansClustering:
  image_analysis/modified_k_means_clustering.rs (clusters can merge/split against min-size + max-sd thresholds)

Spark plan: the cell table carries one column per band; every
iteration is one broadcast of the k centroid rows into a
whole-stage-codegen argmin expression + one groupBy re-averaging —
no UDFs, no driver-side per-cell work. Deterministic throughout:
centroid init is the closed-form band-range spread, the argmin
tie-breaks to the lower cluster id, and convergence is a
changed-count gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_means(bands: DataFrame, band_cols: list[str], k: int = 5,
            max_iters: int = 25) -> DataFrame:
    """Cluster cells on their band vector. bands: (row, col, <band_cols>).

    Output: (row, col, cluster) with cluster in 0..k-1.
    """
    stats = bands.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in band_cols],
        *[F.max(c).alias(f"__hi_{c}") for c in band_cols],
    ).collect()[0]
    # initial centroids: evenly spread across each band's range
    # (k_means_clustering.rs initialization rule)
    cents = [
        [stats[f"__lo_{c}"] + (i + 0.5) * (stats[f"__hi_{c}"] - stats[f"__lo_{c}"]) / k
         for c in band_cols]
        for i in range(k)
    ]
    assign = None
    for _ in range(max_iters):
        d2s = []
        for i, cv in enumerate(cents):
            terms = " + ".join(
                f"({c} - {cv[j]!r}) * ({c} - {cv[j]!r})"
                for j, c in enumerate(band_cols))
            d2s.append(f"NAMED_STRUCT('d', ({terms}), 'i', {i})")
        argmin = (f"AGGREGATE(ARRAY({', '.join(d2s)}), "
                  f"NAMED_STRUCT('d', CAST('Infinity' AS DOUBLE), 'i', -1), "
                  f"(acc, e) -> IF(e.d < acc.d, e, acc)).i")
        new_assign = bands.selectExpr("row", "col", *band_cols,
                                      f"{argmin} AS cluster")
        new_assign = new_assign.localCheckpoint(eager=True)
        if assign is not None:
            changed = (
                new_assign.select("row", "col", "cluster")
                .join(assign.selectExpr("row", "col", "cluster AS __prev"),
                      ["row", "col"])
                .where("cluster <> __prev").count()
            )
            if changed == 0:
                assign = new_assign
                break
        assign = new_assign
        means = assign.groupBy("cluster").agg(
            *[F.avg(c).alias(c) for c in band_cols]).collect()
        by_id = {r["cluster"]: [r[c] for c in band_cols] for r in means}
        cents = [by_id.get(i, cents[i]) for i in range(k)]
    return assign.select("row", "col", "cluster")


def modified_k_means(bands: DataFrame, band_cols: list[str],
                     start_clusters: int = 10, merge_dist: float = 1.0,
                     max_iters: int = 10) -> DataFrame:
    """ModifiedKMeansClustering (image_analysis/
    modified_k_means_clustering.rs): begin with `start_clusters` evenly
    initialized centroids; after each assignment/update round, merge
    centroid pairs closer than `merge_dist` (the lower index absorbs
    the higher), so the cluster count adapts downward. Output (row,
    col, cluster) with clusters renumbered 0..k-1 by surviving centroid
    order."""
    stats = bands.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in band_cols],
        *[F.max(c).alias(f"__hi_{c}") for c in band_cols],
    ).collect()[0]
    cents = [
        [stats[f"__lo_{c}"] + (i + 0.5)
         * (stats[f"__hi_{c}"] - stats[f"__lo_{c}"]) / start_clusters
         for c in band_cols]
        for i in range(start_clusters)
    ]
    assign = None
    for _ in range(max_iters):
        d2s = []
        for i, cv in enumerate(cents):
            terms = " + ".join(
                f"({c} - {cv[j]!r}) * ({c} - {cv[j]!r})"
                for j, c in enumerate(band_cols))
            d2s.append(f"NAMED_STRUCT('d', ({terms}), 'i', {i})")
        argmin = (f"AGGREGATE(ARRAY({', '.join(d2s)}), "
                  f"NAMED_STRUCT('d', CAST('Infinity' AS DOUBLE), 'i', -1), "
                  f"(acc, e) -> IF(e.d < acc.d, e, acc)).i")
        new_assign = bands.selectExpr("row", "col", *band_cols,
                                      f"{argmin} AS cluster")
        new_assign = new_assign.localCheckpoint(eager=True)
        if assign is not None and len(cents) == prev_k:
            changed = (
                new_assign.select("row", "col", "cluster")
                .join(assign.selectExpr("row", "col", "cluster AS __prev"),
                      ["row", "col"])
                .where("cluster <> __prev").count()
            )
            if changed == 0:
                assign = new_assign
                break
        assign = new_assign
        prev_k = len(cents)
        means = assign.groupBy("cluster").agg(
            *[F.avg(c).alias(c) for c in band_cols]).collect()
        by_id = {r["cluster"]: [r[c] for c in band_cols] for r in means}
        cents = [by_id.get(i, cents[i]) for i in range(len(cents))]
        # merge: lower index absorbs any centroid within merge_dist
        import math as _m

        keep = []
        for i, cv in enumerate(cents):
            merged = False
            for kv in keep:
                d = _m.sqrt(sum((a - b) ** 2 for a, b in zip(cv, kv)))
                if d < merge_dist:
                    merged = True
                    break
            if not merged:
                keep.append(cv)
        cents = keep
    return assign.select("row", "col", "cluster")
