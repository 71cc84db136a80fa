"""Throughput benchmark for whitebox_tools_spark.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

The headline metric is docs/sec through the flagship spatial pipeline
(points -> PIP tag join -> tile assignment -> tile counts), i.e. the
north-rule throughput number; per-query wall times cover each operator
family. Set SPARK_GRAFT_BENCH_QUERIES=q1,q2 to run a subset.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from whitebox_tools_spark.operators import pip_join as P  # noqa: E402
from whitebox_tools_spark.operators import tiling as TL  # noqa: E402
from whitebox_tools_spark.session import get_spark  # noqa: E402

# headline operator set: spatial core + kNN/gridding + dedup + ANN + text
BENCH_QUERIES = [
    "tile_assign",
    "tile_counts",
    "hex_bin",
    "frs_cells",
    "pip_tag",
    "pip_tag_cellcover",
    "pip_clip",
    "knn_join",
    "nn_gridding",
    "idw",
    "points_to_raster_last",
    "extract_values",
    "zonal_stats",
    "focal_mean",
    "focal_median_halo",
    "slope_pct",
    "hillshade",
    "euclid_dist",
    "clump",
    "raster_calc",
    "quantiles",
    "gaussian_filter",
    "plan_curvature",
    "d8_accum",
    "union_features",
    "dissolve",
    "contour_segments",
    "minhash_pairs",
    # round-5: the canonicalization stage (pairs -> CC -> keeper verdict)
    "dedup_clusters",
    # round-5: the full curation funnel (keeper selection -> lang/quality
    # filters -> per-(source, lang) corpus stats + BPE token budget)
    "corpus_curation",
    # round-5 tenth session: benchmark-contamination gate (broadcast eval
    # grams, one corpus pass) — the signature op of the new curation set
    "contamination_check",
    # round-5 eleventh session: ExactSubstr-style duplicated-span finder
    # (corpus-wide k-gram frequency + island merge) + the cut stage
    # (canonical-keeper substring removal)
    "substring_dup",
    "scrub_dup",
    # round-5 thirteenth session: cross-doc training-sequence packing
    # (two-phase prefix scan) and the CCNet-style bigram-LM quality
    # filter (corpus-trained model, one skew-safe model join)
    "pack_sequences",
    "lm_score",
    # round-5 thirteenth session: distributed BPE tokenizer training
    # (vocab-resident merge rounds) and the zero-shuffle literal-merge
    # encode
    "bpe_merges",
    "bpe_encode",
    # round-5 fourteenth session: ranked retrieval — per-doc TF-IDF
    # keywords and BM25 search with the salted two-phase exact top-k
    "tfidf_terms",
    "bm25_rank",
    # simhash_pairs (16-bit) is retired from the headline set: its 65,536
    # global buckets go quadratic at corpus scale; it survives in the
    # registry purely as a parity artifact. simhash64_pairs is the real op.
    "simhash64_pairs",
    "embedding_dups",
    "ann_topk",
    "ann_ivf",
    # round-5 twelfth session: product-quantized ANN (codes-only lists,
    # ADC shortlist + exact re-rank — the 10^12-vector memory path)
    "ann_ivfpq",
    "lang_id",
    "quality",
    # round-2 continuation additions (gate-heavy ops like dist_to_stream
    # stay out of the headline set — they're correctness-gated instead)
    "minmax_stretch",
    "hist_match",
    "stdev_filter",
    "fast_gaussian",
    "tri",
    # round-3 additions: interpolation, multiscale, building classify,
    # edge-preserving mean, tree detection
    "natural_neighbour",
    "multiscale_rough",
    "classify_buildings",
    "edge_preserving_mean",
    "tree_detection",
    "fill_depressions",
]


def flagship(spark, sf_dir: str) -> int:
    """Full pipeline; returns number of docs (points) pushed through."""
    pts = E._points(spark, sf_dir)
    tagged = P.points_in_polygons(pts, E._polygons_df(spark))
    tiled, _g = TL.assign_tiles(tagged, 0.0, 0.0, 64.0, 64.0, extent=E._EXTENT)
    tiled.groupBy("tile_id").count().collect()
    return pts.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    names = subset.split(",") if subset else BENCH_QUERIES

    spark = get_spark(app_name="wbx-bench", cores=cpus,
                      shuffle_partitions=int(cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    # warm the JVM/Arrow paths once so per-query numbers measure the plan
    qs["tile_assign"](spark, sf_dir).count()

    # median of REPS runs per query: hash-heavy queries show +-20-30 %
    # run-to-run variance on this box, so a single sample can't separate a
    # real regression from noise (round-2 postmortem).
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    med = lambda xs: sorted(xs)[len(xs) // 2]

    timings: dict[str, float] = {}
    fl_times, fl_docs = [], 0
    for _ in range(reps):
        t0 = time.time()
        fl_docs = flagship(spark, sf_dir)
        fl_times.append(time.time() - t0)
    flagship_s = med(fl_times)
    timings["flagship_pipeline"] = round(flagship_s, 3)

    for i, name in enumerate(names):
        fn = qs[name]
        samples = []
        for _ in range(reps):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            del df
        timings[name] = round(med(samples), 3)
        if i % 5 == 4:
            # reclaim leftover localCheckpoint blocks / shuffle state so a
            # long benchmark session doesn't degrade (the ContextCleaner
            # only runs on JVM GC; dozens of iterative queries otherwise
            # accumulate orphaned blocks and slow later queries)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": int(cpus),
        "flagship_docs_per_sec": round(fl_docs / flagship_s, 1),
        "reps": reps,
    }))


if __name__ == "__main__":
    main()
