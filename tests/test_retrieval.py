"""Retrieval operators vs independent pure-Python references."""

import math
from collections import Counter

import pytest

from whitebox_tools_spark.operators import retrieval as RV

CORPUS = [
    ("d01", "the quick brown fox jumps over the lazy dog"),
    ("d02", "a quick brown dog chases a lazy fox"),
    ("d03", "machine learning models train on large corpora of text"),
    ("d04", "spark executes distributed dataframe plans on a cluster"),
    ("d05", "the dog sleeps"),
    ("d06", "foxes and dogs are canids"),
    ("d07", "large language models need deduplicated text corpora"),
    ("d08", "the quick fox"),
    ("d09", "distributed joins shuffle data between cluster nodes"),
    ("d10", "   "),
]


def _ref_tf():
    tf = {}
    for did, text in CORPUS:
        toks = [t for t in text.split() if t]
        if toks:
            tf[did] = Counter(toks)
    return tf


def _round6(x: float) -> float:
    # Spark/DuckDB ROUND(double, 6): half away from zero
    return math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0 else -math.floor(-x * 1e6 + 0.5) / 1e6


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id string, text string")


def test_tfidf_matches_reference(spark, docs):
    out = {(r["doc_id"], r["term"]): r
           for r in RV.tfidf_top_terms(docs, k=3).collect()}
    tf = _ref_tf()
    n = len(tf)
    df = Counter(t for c in tf.values() for t in c)
    for did, counts in tf.items():
        scored = sorted(
            ((_round6(c * (math.log((n + 1) / (df[t] + 1)) + 1)), t, c)
             for t, c in counts.items()),
            key=lambda x: (-x[0], x[1]))
        for rank, (s, t, c) in enumerate(scored[:3], start=1):
            row = out[(did, t)]
            assert row["rank"] == rank
            assert row["tf"] == c and row["df"] == df[t]
            assert abs(row["tfidf"] - s) < 2e-6
    # d10 is all-whitespace: no tokens, no rows
    assert not any(k[0] == "d10" for k in out)
    assert len(out) == sum(min(3, len(c)) for c in tf.values())


def test_bm25_matches_reference(spark, docs):
    k1, b, q_terms, k = 1.2, 0.75, 4, 5
    rows = RV.bm25_topk(docs, n_query_terms=q_terms, k=k, k1=k1, b=b).collect()
    tf = _ref_tf()
    n = len(tf)
    df = Counter(t for c in tf.values() for t in c)
    dl = {d: sum(c.values()) for d, c in tf.items()}
    avgdl = sum(dl.values()) / n
    qt = sorted(df, key=lambda t: (-df[t], t))[:q_terms]
    expect = {}
    for t in qt:
        scored = []
        for d, c in tf.items():
            if t in c:
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s = idf * c[t] * (k1 + 1) / (c[t] + k1 * (1 - b + b * dl[d] / avgdl))
                scored.append((_round6(s), d))
        scored.sort(key=lambda x: (-x[0], x[1]))
        for rank, (s, d) in enumerate(scored[:k], start=1):
            expect[(t, d)] = (rank, s)
    assert len(rows) == len(expect)
    for r in rows:
        rank, s = expect[(r["term"], r["doc_id"])]
        assert r["rank"] == rank
        assert abs(r["score"] - s) < 2e-6
        assert r["dl"] == dl[r["doc_id"]] and r["df"] == df[r["term"]]


def test_salted_topk_exact_vs_plain_window(spark):
    # the two-phase salted top-k must equal a plain per-group window
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    data = [(i % 7, (i * 37) % 101, f"r{i:03d}") for i in range(400)]
    df = spark.createDataFrame(data, "g int, v int, id string")
    got = RV._salted_topk(df, ["g"], [F.desc("v"), F.asc("id")], 5,
                          salt_on=["id"], n_salt=8)
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    want = (df.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= 5))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_perplexity_buckets_tercile_structure(spark, docs):
    out = RV.perplexity_buckets(docs).collect()
    # docs with >= 2 tokens get a bucket; d05 has 3 tokens, d08 3, d10 none
    assert len(out) == 9
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["h_bits"])
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert all(len(v) == 3 for v in by_bucket.values())
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])


def test_bm25_query_matches_reference(spark, docs):
    out = {r["doc_id"]: r for r in
           RV.bm25_query(docs, "fox dog", k=10, n_salt=4).collect()}
    tf = _ref_tf()
    n = len(tf)
    df = Counter(t for c in tf.values() for t in c)
    dl = {d: sum(c.values()) for d, c in tf.items()}
    avgdl = sum(dl.values()) / n
    k1, b = 1.2, 0.75
    want = {}
    for d, c in tf.items():
        hit = [t for t in ("dog", "fox") if t in c]
        if hit:
            s = sum(math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                    * c[t] * (k1 + 1)
                    / (c[t] + k1 * (1 - b + b * dl[d] / avgdl)) for t in hit)
            want[d] = (len(hit), s)
    assert set(out) == set(want)
    order = sorted(want, key=lambda d: (-round(want[d][1], 6), d))
    for rk, d in enumerate(order, start=1):
        assert out[d]["rank"] == rk
        assert out[d]["n_hit_terms"] == want[d][0]
        assert abs(out[d]["score"] - want[d][1]) < 2e-6
