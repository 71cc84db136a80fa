"""Property-based gates (hypothesis) for semantics that have cheap
independent references: the strict-order fold kernels, the ExactSubstr
island merge, and the deterministic sharder. Spark-backed properties
cap max_examples to keep the suite fast; the numpy-kernel properties
run at full default width."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from whitebox_tools_spark.operators import curation as C
from whitebox_tools_spark.operators import similarity as S

_mat = st.integers(min_value=1, max_value=12).flatmap(
    lambda n: st.integers(min_value=1, max_value=6).flatmap(
        lambda d: st.lists(
            st.lists(st.floats(min_value=-8, max_value=8,
                               allow_nan=False, allow_infinity=False,
                               width=32),
                     min_size=d, max_size=d),
            min_size=n, max_size=n)))


@given(_mat)
def test_fold_norms_matches_sequential_reference(rows):
    mat = np.array(rows, dtype=np.float64)
    got = S._fold_norms(mat)
    for i, row in enumerate(mat):
        acc = 0.0
        for j in range(len(row)):  # same j-ascending IEEE order
            acc += row[j] * row[j]
        assert got[i] == np.sqrt(acc)


@given(_mat, st.integers(min_value=1, max_value=5))
def test_fold_sub_dists_matches_sequential_reference(rows, c):
    mat = np.array(rows, dtype=np.float64)
    cent = mat[:c] + 0.5
    got = S._fold_sub_dists(mat, cent)
    for i in range(len(mat)):
        for k in range(len(cent)):
            acc = 0.0
            for j in range(mat.shape[1]):
                d = mat[i, j] - cent[k, j]
                acc += d * d
            assert got[i, k] == acc


def _brute_substring_spans(texts, k):
    """Independent reference: corpus-wide k-gram counts -> duplicated
    positions -> gap->k island merge."""
    grams = {}
    pos = {}
    for did, text in texts:
        toks = text.split()
        pos[did] = []
        for p in range(len(toks) - k + 1):
            g = " ".join(toks[p:p + k])
            grams[g] = grams.get(g, 0) + 1
            pos[did].append((p, g))
    out = []
    for did, plist in pos.items():
        dup = sorted(p for p, g in plist if grams[g] >= 2)
        start = prev = None
        for p in dup:
            if start is None:
                start = prev = p
            elif p - prev > k:
                out.append((did, start, prev + k - 1))
                start = prev = p
            else:
                prev = p
        if start is not None:
            out.append((did, start, prev + k - 1))
    return sorted(out)


_corpus = st.lists(
    st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=12)
    .map(lambda ts: " ".join(ts)),
    min_size=1, max_size=6)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_corpus)
def test_substring_dup_matches_bruteforce(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted((r.doc_id, r.span_start, r.span_end)
                 for r in C.substring_dup_spans(docs, k=2,
                                                min_count=2).collect())
    assert got == _brute_substring_spans(rows, k=2)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=5),
       st.integers(min_value=0, max_value=3))
def test_corpus_shard_total_and_dense(spark, n, shards, seed):
    docs = spark.range(n).withColumnRenamed("id", "doc_id")
    out = C.corpus_shard(docs, n_shards=shards, seed=seed).collect()
    assert len(out) == n  # total: every doc exactly once
    by_shard = {}
    for r in out:
        assert 0 <= r.shard_id < shards
        by_shard.setdefault(r.shard_id, []).append(r.position)
    for ps in by_shard.values():  # dense rank 0..len-1 per shard
        assert sorted(ps) == list(range(len(ps)))
