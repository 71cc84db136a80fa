"""Dedup / similarity / text-analysis / multimodal / lineage operators."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.functions import text as T
from whitebox_tools_spark.operators.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from whitebox_tools_spark.operators.multimodal import extract_media_features, synth_media
from whitebox_tools_spark.operators.similarity import ann_topk_bruteforce, ann_topk_lsh
from whitebox_tools_spark.plans.lineage import CheckpointedRun
from whitebox_tools_spark.sources.docs import synth_docs


@pytest.fixture(scope="module")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_exact_dedup(spark, documents):
    n = documents.count()
    d = exact_dedup(documents)
    assert d.count() <= n
    assert d.agg(F.sum("dup_count")).collect()[0][0] == n


def test_minhash_finds_planted_dups(spark, documents):
    # the driver corpus plants ' dup'-suffixed near-duplicates
    pairs = minhash_lsh_pairs(documents, jaccard_threshold=0.5)
    rows = pairs.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["jaccard"] >= 0.5
        assert r["id_a"] < r["id_b"]


def test_minhash_agrees_with_exact_jaccard(spark, documents):
    """Every LSH-surfaced pair's jaccard must equal brute-force jaccard."""
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             minhash_lsh_pairs(documents, jaccard_threshold=0.5).collect()}
    texts = {r["doc_id"]: r["text"] for r in documents.collect()}

    def sh(t):
        toks = t.split()
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    for (a, b), j in pairs.items():
        A, B = sh(texts[a]), sh(texts[b])
        assert abs(j - len(A & B) / len(A | B)) < 1e-12


def test_simhash_pairs(spark, documents):
    p = simhash_pairs(documents, max_hamming=3)
    rows = p.collect()
    for r in rows:
        assert r["hamming"] <= 3


def test_ngram_jaccard_blocked(spark, documents):
    p = ngram_jaccard_pairs(documents, threshold=0.5)
    assert p.count() >= 0  # runs; blocking keeps it sub-quadratic
    for r in p.limit(5).collect():
        assert 0.5 <= r["jaccard"] <= 1.0


def test_ann_bruteforce_matches_numpy(spark, embeddings):
    queries = embeddings.where(F.col("vec_id") % 50 == 0)
    got = ann_topk_bruteforce(queries, embeddings, k=5)
    res = {}
    for r in got.collect():
        res.setdefault(r["query_id"], []).append((r["sim_rank"], r["target_id"]))
    rows = embeddings.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qid, pairs in res.items():
        qv = mat[ids == qid][0]
        sims = mat @ qv
        order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))
        expected = [ids[i] for i in order if ids[i] != qid][:5]
        got_ids = [t for _, t in sorted(pairs)]
        assert got_ids == expected, qid


def test_ann_lsh_recall(spark, embeddings):
    queries = embeddings.where(F.col("vec_id") % 50 == 0)
    exact = ann_topk_bruteforce(queries, embeddings, k=5)
    approx = ann_topk_lsh(queries, embeddings, k=5, num_planes=4)
    e = {(r["query_id"], r["target_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["target_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # corpus embeddings are near-random 64-dim -> weak angular locality;
    # the bound asserts LSH beats random bucketing (5/16 of space probed)
    assert recall > 0.3


def test_embedding_dup_pairs(spark, embeddings):
    p = embedding_dup_pairs(embeddings.limit(200), threshold=0.95)
    for r in p.collect():
        assert r["cosine"] >= 0.95


def test_text_exprs_spark_side(spark, documents):
    s_lang, _ = T.lang_id_expr("text")
    s_tc, _ = T.token_count_expr("text")
    s_sim, _ = T.simhash16_exprs("text")
    s_fp, _ = T.doc_fingerprint_expr("text")
    out = documents.limit(20).selectExpr(
        "doc_id", f"{s_lang} AS lang_pred", f"{s_tc} AS n_tokens",
        f"{s_sim} AS simhash", f"{s_fp} AS fp"
    ).collect()
    for r in out:
        assert r["lang_pred"] in T.LANG_MARKERS
        assert r["n_tokens"] > 0
        assert 0 <= r["simhash"] < 65536
        assert len(r["fp"]) == 32


def test_multimodal_plumbing(spark):
    docs = synth_docs(spark, 100)
    media = synth_media(docs)
    assert media.count() > 0
    feats = extract_media_features(media)
    rows = feats.collect()
    assert all(r["width"] == 8 and r["height"] == 8 for r in rows)
    assert all(len(r["feature"]) == 8 for r in rows)
    # determinism: same ref -> same feature
    again = {r["media_ref"]: r["feature"] for r in extract_media_features(media).collect()}
    for r in rows:
        assert again[r["media_ref"]] == r["feature"]


def test_lineage_checkpoint_resume(spark, tmp_path):
    calls = []

    def job(s, key):
        calls.append(key)
        if key == "p2" and len([c for c in calls if c == "p2"]) == 1:
            raise RuntimeError("transient failure")
        return s.range(10).withColumn("k", F.lit(key))

    run = CheckpointedRun(spark, str(tmp_path), "run1")
    stats = run.run(["p0", "p1", "p2"], job)
    assert stats == {"skipped": 0, "completed": 2, "failed": 1}
    # resume: only the failed partition re-runs
    stats2 = run.run(["p0", "p1", "p2"], job)
    assert stats2 == {"skipped": 2, "completed": 1, "failed": 0}
    lin = run.lineage_df()
    assert lin.where(F.col("status") == "COMPLETED").count() == 3
    assert lin.where(F.col("status").startswith("FAILED")).count() == 1
    # metrics present
    assert lin.where((F.col("status") == "COMPLETED") & (F.col("rows_per_sec") > 0)).count() == 3


def test_ngram_jaccard_default_blocking_is_band_keyed(spark, documents):
    """block_col=None routes through MinHash band candidates (no fixed
    65,536-block fingerprint prefix): high-similarity pairs survive and
    every reported jaccard is the exact set Jaccard."""
    p = ngram_jaccard_pairs(documents, threshold=0.5).collect()
    ref = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in minhash_lsh_pairs(documents, bands=8, rows_per_band=2,
                                      jaccard_threshold=0.5).collect()}
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in p}
    assert got == ref  # delegation is exact, not a re-derivation
    for (a, b), j in got.items():
        assert 0.5 <= j <= 1.0


def test_ngram_jaccard_block_cap_excludes_hot_blocks(spark):
    """max_block_size drops over-cap blocks from pair generation: a
    61-doc block with cap 10 contributes zero pairs; small blocks pair."""
    rows = [(i, "alpha beta gamma delta epsilon", "hot") for i in range(61)]
    rows += [(100 + i, "alpha beta gamma delta epsilon", "cold") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    pairs = ngram_jaccard_pairs(df, block_col="source", threshold=0.1,
                                max_block_size=10).collect()
    ids = {i for r in pairs for i in (r["id_a"], r["id_b"])}
    assert ids == {100, 101, 102}  # only the under-cap block pairs
    assert len(pairs) == 3


def test_dedup_clusters_chain_and_singletons(spark):
    # Docs 0/1/2 pairwise exceed the threshold and must cluster to the
    # min id 0 (the closure also covers the chain-only case, gated by
    # the connected_components unit tests). Doc 3 is an unrelated
    # singleton and must still get a verdict row.
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base + " alpha"),
        (1, base + " alpha beta"),
        (2, base + " beta"),
        (3, "completely different text with no overlap whatsoever here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from whitebox_tools_spark.operators.dedup import dedup_clusters

    out = {r.doc_id: (r.cluster_id, r.is_canonical)
           for r in dedup_clusters(docs, jaccard_threshold=0.5,
                                   bands=8, rows_per_band=2).collect()}
    assert len(out) == 4                      # one verdict per input doc
    assert out[0] == (0, 1)                   # keeper
    assert out[1] == (0, 0)
    assert out[2] == (0, 0)
    assert out[3] == (3, 1)                   # singleton clusters to itself


def test_cluster_pairs_chain_closure(spark):
    # A genuine chain: (1,2) and (2,3) paired, (1,3) never a candidate —
    # transitive closure must still produce one cluster with keeper 1.
    from whitebox_tools_spark.operators.dedup import cluster_pairs

    ids = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {r.id: (r.cluster_id, r.is_canonical)
           for r in cluster_pairs(ids, pairs).collect()}
    assert out == {1: (1, 1), 2: (1, 0), 3: (1, 0), 4: (4, 1), 5: (5, 1)}


def test_media_resize_and_frames_plumbing(spark):
    import numpy as np
    import pytest as _pt
    from whitebox_tools_spark.operators.multimodal import (
        FRAME_BYTES, _decode_impl, resize_media, sample_frames,
    )

    docs = synth_docs(spark, 50)
    media = synth_media(docs).cache()
    n_media = media.count()

    out = resize_media(media, 4, 4)
    rows = out.collect()
    assert len(rows) == n_media * 16          # one row per output pixel
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], {})[(r["ry"], r["rx"])] = r["v"]
    one = media.limit(1).collect()[0]
    img = _decode_impl(bytes(one["media_bytes"]))
    want = img.reshape(4, 2, 4, 2).mean(axis=(1, 3))
    got = by_ref[one["media_ref"]]
    assert all(got[(i, j)] == want[i, j] for i in range(4) for j in range(4))
    with _pt.raises(ValueError):
        resize_media(media, 3, 4)             # must divide the 8x8 stub

    fr = sample_frames(media, every_k=2).collect()
    n_frames = len(bytes(one["media_bytes"])) // FRAME_BYTES
    want_idx = list(range(0, n_frames, 2))
    per = {}
    for r in fr:
        per.setdefault(r["media_ref"], []).append(r["frame_idx"])
    assert sorted(per[one["media_ref"]]) == want_idx
    arr = np.frombuffer(bytes(one["media_bytes"]), dtype=np.uint8)
    means = {r["frame_idx"]: r["frame_mean"] for r in fr
             if r["media_ref"] == one["media_ref"]}
    for j in want_idx:
        assert means[j] == float(arr[j * FRAME_BYTES:(j + 1) * FRAME_BYTES].mean())
