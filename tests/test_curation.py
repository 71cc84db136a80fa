"""Gates for the corpus-curation operators (operators/curation.py)."""

import pytest
from pyspark.sql import functions as F

from whitebox_tools_spark.functions import text as T
from whitebox_tools_spark.operators import curation as C


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta", "s0"),
        (1, "alpha beta gamma delta epsilon zeta eta theta", "s0"),  # exact dup of 0
        (2, "one two three four five six seven eight nine ten", "s0"),
        (3, "rep rep rep rep rep rep", "s1"),
        (4, "alpha beta gamma delta other tail words here now", "s1"),
        (5, "unique words entirely disjoint from anything else", "s1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_chunking_covers_and_overlaps(spark, docs):
    out = C.chunk_documents(docs, window=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    texts = {r.doc_id: r.text for r in docs.collect()}
    for did, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        toks = texts[did].split()
        # chunk starts at stride*idx, window tokens, tail clamped
        for r in rows:
            start = 3 * r.chunk_idx
            expect = toks[start:start + 4]
            assert r.chunk.split() == expect
            assert r.n_chunk_tokens == len(expect)
        # consecutive chunks overlap by window - stride = 1 token
        for a, b in zip(rows, rows[1:]):
            assert a.chunk.split()[-1] == b.chunk.split()[0]
        # every token covered
        covered = set()
        for r in rows:
            covered.update(range(3 * r.chunk_idx, 3 * r.chunk_idx + r.n_chunk_tokens))
        assert covered == set(range(len(toks)))


def test_repetition_known_values(spark):
    one = spark.createDataFrame(
        [(0, "a a a a"), (1, "x y x y x")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in C.repetition_stats(one).collect()}
    r0 = rows[0]
    assert r0.n_tokens == 4
    assert r0.unique_token_frac == 0.25
    # bigrams: ["a a"] x3 -> distinct 1 of 3; top bigram covers 2*3/4
    assert abs(r0.dup_bigram_frac - (1 - 1 / 3)) < 1e-15
    assert r0.top_bigram_frac == 1.5
    r1 = rows[1]
    # bigrams: x y, y x, x y, y x -> 2 distinct of 4, max count 2
    assert r1.dup_bigram_frac == 0.5
    assert r1.top_bigram_frac == 2 * 2 / 5


def test_contamination_excludes_eval_and_detects_copies(spark, docs):
    # eval set = doc 0; doc 1 is an exact copy -> contamination 1.0;
    # doc 5 shares nothing -> 0.0
    out = {r.doc_id: r for r in
           C.contamination_check(docs, "doc_id = 0", n=3).collect()}
    assert 0 not in out  # eval doc is not scored as training
    assert out[1].contamination == 1.0
    assert out[5].contamination == 0.0
    assert out[5].n_hit == 0
    # partial overlap: doc 4 shares exactly the grams over the first
    # 4 tokens ("alpha beta gamma", "beta gamma delta") of its 7 grams
    assert out[4].n_hit == 2 and out[4].n_grams == 7


def test_source_quota_two_phase(spark):
    # source "big" has 10 docs (over cap 3), "small" has 2 (under cap)
    rows = [(i, "big" if i < 10 else "small") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = C.source_quota(df, cap=3).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    assert len(by_src["big"]) == 3
    assert by_src["small"] == {10, 11}
    # deterministic: the kept set is the md5-priority top-3
    import hashlib
    pri = sorted(range(10), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    assert by_src["big"] == set(pri[:3])


def test_pii_scrub_ground_truth(spark, docs):
    inj = T.pii_inject_expr("text", "doc_id")[0]
    px = T.pii_scrub_exprs("__t")
    out = docs.selectExpr("doc_id", f"{inj} AS __t").selectExpr(
        "doc_id",
        f"CAST({px['n_emails'][0]} AS BIGINT) AS n_emails",
        f"CAST({px['n_phones'][0]} AS BIGINT) AS n_phones",
        f"{px['clean'][0]} AS clean",
    ).collect()
    for r in out:
        assert r.n_emails == (1 if r.doc_id % 3 == 0 else 0)
        assert r.n_phones == (1 if r.doc_id % 5 == 0 else 0)
        assert "@" not in r.clean
        if r.doc_id % 3 == 0:
            assert "<EMAIL>" in r.clean
        if r.doc_id % 5 == 0:
            assert "<PHONE>" in r.clean


def test_media_dedup_exact(spark, docs):
    media = docs.selectExpr(
        "doc_id",
        "CAST(CONCAT('blob-', CAST(doc_id % 4 AS STRING)) AS BINARY) AS media_bytes",
    )
    out = C.media_exact_dedup(media).collect()
    assert sum(r.n_copies for r in out) == 6
    # keeper is the min id of each residue class
    keepers = sorted(r.doc_id for r in out)
    assert keepers == [0, 1, 2, 3]
    assert all(r.n_bytes == 6 for r in out)


def test_scrub_text_spans_preserves_sequence(spark):
    from whitebox_tools_spark.sources.docs import synth_docs, spans_fingerprint

    docs = synth_docs(spark, 200).withColumn(
        "spans",
        F.expr(
            "TRANSFORM(spans, s -> STRUCT(s.kind AS kind, "
            "CASE WHEN s.kind = 'text' AND s.offset % 2 = 0 "
            "THEN CONCAT(s.text, ' bob@mail.org') ELSE s.text END AS text, "
            "s.media_ref AS media_ref, s.offset AS offset))"
        ),
    )
    scrubbed = C.scrub_text_spans(docs)
    # structural projection (kind, media_ref, offset) is bit-identical
    proj = "TRANSFORM(spans, s -> STRUCT(s.kind AS kind, '' AS text, s.media_ref AS media_ref, s.offset AS offset))"
    before = {r.doc_id: r.spans_fp for r in
              spans_fingerprint(docs.withColumn("spans", F.expr(proj))).collect()}
    after = {r.doc_id: r.spans_fp for r in
             spans_fingerprint(scrubbed.withColumn("spans", F.expr(proj))).collect()}
    assert before == after
    rows = scrubbed.select(F.explode("spans").alias("s")).select("s.*").collect()
    n_redacted = 0
    for r in rows:
        if r.kind == "text":
            assert "@" not in r.text
            if r.offset % 2 == 0:  # injection sites: redacted IN PLACE
                assert r.text.endswith(" <EMAIL>")
                n_redacted += 1
        else:
            assert "@" not in r.text  # non-text spans never carried PII
    assert n_redacted > 0  # the injection actually fired
    # non-text spans bit-identical before/after
    b = docs.select(F.explode("spans").alias("s")).where("s.kind <> 'text'") \
            .select("s.*").collect()
    a = scrubbed.select(F.explode("spans").alias("s")).where("s.kind <> 'text'") \
                .select("s.*").collect()
    assert sorted(map(tuple, b)) == sorted(map(tuple, a))


def test_short_docs_are_total(spark):
    """Docs shorter than the gram length must not kill the job under
    ANSI mode (shingles_expr guard) and must match oracle semantics:
    absent from contamination, NULL fractions in repetition."""
    short = spark.createDataFrame(
        [(0, "one two three four"), (1, "hi"), (2, "x")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           C.contamination_check(short, "doc_id = 0", n=3).collect()}
    assert 1 not in out and 2 not in out  # no 3-grams -> absent
    rep = {r.doc_id: r for r in C.repetition_stats(short).collect()}
    assert rep[2].n_tokens == 1
    assert rep[2].dup_bigram_frac is None  # zero bigrams -> NULL, not NaN
    assert rep[2].top_bigram_frac == 0.0
    assert rep[1].dup_trigram_frac is None


def test_source_quota_null_source_kept(spark):
    rows = [(0, None), (1, "s"), (2, "s"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = {r.doc_id for r in C.source_quota(df, cap=5).collect()}
    assert kept == {0, 1, 2, 3}  # NULL source is its own quota group
    kept1 = C.source_quota(df, cap=1).collect()
    by_src = {}
    for r in kept1:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    assert len(by_src[None]) == 1 and len(by_src["s"]) == 1


def test_chunking_rejects_gappy_stride(spark, docs):
    with pytest.raises(ValueError):
        C.chunk_documents(docs, window=4, stride=8)


def test_pii_phone_inside_email_reconciles(spark):
    """A phone-shaped substring inside an email local part is an email;
    counts must reconcile with the markers in the scrubbed text."""
    df = spark.createDataFrame(
        [(0, "reach 123-4567@example.com or call 555-0001")],
        "doc_id long, text string",
    )
    px = T.pii_scrub_exprs("text")
    r = df.selectExpr(
        f"CAST({px['n_emails'][0]} AS BIGINT) AS n_emails",
        f"CAST({px['n_phones'][0]} AS BIGINT) AS n_phones",
        f"{px['clean'][0]} AS clean",
    ).collect()[0]
    assert r.n_emails == r.clean.count("<EMAIL>") == 1
    assert r.n_phones == r.clean.count("<PHONE>") == 1


@pytest.fixture(scope="module")
def span_docs(spark):
    """Hand-built interleaved docs: a long text span split by a media
    span, plus one doc with out-of-order offsets."""
    rows = [
        (0, [("text", "one two three four five six seven", "", 0),
             ("media", "", "s3://m/0.bin", 1),
             ("text", "eight nine", "", 2)]),
        (1, [("media", "", "s3://m/1.bin", 0),
             ("text", "alpha beta gamma", "", 5),   # offset jump: still monotonic
             ("point", "3.5;7.25", "", 6)]),
        (2, [("text", "solo", "", 0),
             ("text", "back", "", 3),
             ("media", "", "s3://m/2.bin", 1)]),    # 1 < 3: NON-monotonic
        (3, [("text", "   ", "", 0)]),              # whitespace-only text span
    ]
    schema = ("doc_id long, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    return spark.createDataFrame(rows, schema)


def test_span_stats_known_values(spark, span_docs):
    rows = {r.doc_id: r for r in C.span_stats(span_docs).collect()}
    r0 = rows[0]
    assert (r0.n_spans, r0.n_text, r0.n_media) == (3, 2, 1)
    assert r0.text_chars == len("one two three four five six seven") + len("eight nine")
    assert r0.bpe_tokens == 7 + 2  # one BPE piece per word here
    assert r0.offsets_monotonic is True
    r1 = rows[1]
    assert (r1.n_spans, r1.n_text, r1.n_media) == (3, 1, 1)
    assert r1.offsets_monotonic is True  # jumps allowed, order is what counts
    assert rows[2].offsets_monotonic is False
    r3 = rows[3]
    assert (r3.n_text, r3.text_chars) == (1, 3)  # whitespace chars still counted


def test_chunk_spans_never_crosses_media(spark, span_docs):
    out = C.chunk_spans(span_docs, window=3, stride=2).collect()
    by_key = {}
    for r in out:
        by_key.setdefault((r.doc_id, r.span_offset), []).append(r)
    # doc 0 text span at offset 0: 7 tokens -> starts 0,2,4,6 -> 4 pieces,
    # none containing tokens of the offset-2 span (media boundary holds)
    p0 = sorted(by_key[(0, 0)], key=lambda r: r.piece_idx)
    toks = "one two three four five six seven".split()
    assert len(p0) == 4
    for r in p0:
        s = 2 * r.piece_idx
        assert r.payload.split() == toks[s:s + 3]
        assert r.n_tokens == len(toks[s:s + 3])
        assert "eight" not in r.payload and "nine" not in r.payload
    # media span passes through as ONE piece carrying its ref
    m = by_key[(0, 1)]
    assert len(m) == 1 and m[0].kind == "media" and m[0].payload == "s3://m/0.bin"
    assert m[0].n_tokens == 0
    # point span payload passes through verbatim
    pt = by_key[(1, 6)]
    assert len(pt) == 1 and pt[0].payload == "3.5;7.25"
    # whitespace-only text span still emits exactly one (empty) piece
    ws = by_key[(3, 0)]
    assert len(ws) == 1 and ws[0].n_tokens == 0 and ws[0].payload == ""
    # span sequence reconstructable: every input span has >= 1 piece
    n_spans = sum(len(r.spans) for r in span_docs.collect())
    assert len(by_key) == n_spans


def test_corpus_sample_layout_independent(spark, docs):
    big = docs.unionByName(docs.selectExpr(
        "doc_id + 100 AS doc_id", "text", "source"))
    a = {r.doc_id for r in C.corpus_sample(big.repartition(1), 500_000).collect()}
    b = {r.doc_id for r in C.corpus_sample(big.repartition(7), 500_000).collect()}
    assert a == b  # pure function of (id, seed): layout-independent
    assert C.corpus_sample(big, 0).count() == 0
    assert C.corpus_sample(big, 1_000_000).count() == big.count()
    c = {r.doc_id for r in C.corpus_sample(big, 500_000, seed=99).collect()}
    assert c != a  # a new seed draws a different sample
    with pytest.raises(ValueError):
        C.corpus_sample(big, 1_000_001)


def test_substring_dup_spans_ground_truth(spark):
    # doc 0 and doc 1 share the 6-token run "p q r s t u" (positions
    # 2..7 in doc 0, 0..5 in doc 1); with k=3 every 3-gram inside the
    # run is duplicated, and nothing else repeats corpus-wide.
    rows = [
        (0, "w1 w2 p q r s t u w3 w4"),
        (1, "p q r s t u v1 v2"),
        (2, "z1 z2 z3 z4 z5 z6 z7"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           C.substring_dup_spans(docs, k=3, min_count=2).collect()}
    assert set(out) == {0, 1}
    assert (out[0].span_start, out[0].span_end, out[0].n_tokens) == (2, 7, 6)
    assert (out[1].span_start, out[1].span_end, out[1].n_tokens) == (0, 5, 6)
    # 4 duplicated 3-gram start positions inside a 6-token run
    assert out[0].n_dup_grams == out[1].n_dup_grams == 4


def test_substring_dup_within_doc_and_island_split(spark):
    # one doc repeats its own 3-gram ("a b c") in two places separated
    # by a >k gap -> two islands in the same doc; no cross-doc dup.
    docs = spark.createDataFrame(
        [(0, "a b c x1 x2 x3 x4 x5 a b c"),
         (1, "m n o p q r s t u v")],
        "doc_id long, text string",
    )
    out = sorted(C.substring_dup_spans(docs, k=3, min_count=2).collect(),
                 key=lambda r: r.span_start)
    assert [r.doc_id for r in out] == [0, 0]
    assert [(r.span_start, r.span_end) for r in out] == [(0, 2), (8, 10)]


def test_substring_dup_adjacent_islands_merge(spark):
    # duplicated grams whose starts differ by exactly k are contiguous
    # text (ranges touch) and must merge into ONE span.
    docs = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c z y x"), (2, "q w d e f r")],
        "doc_id long, text string",
    )
    # doc 0: "a b c" dup at pos 0 (with doc 1), "d e f" dup at pos 3
    # (with doc 2) -> gap == k == 3 -> single island 0..5
    out = {r.doc_id: r for r in
           C.substring_dup_spans(docs, k=3, min_count=2).collect()}
    assert (out[0].span_start, out[0].span_end, out[0].n_tokens) == (0, 5, 6)


def test_domain_mix_weights_rebalance(spark):
    # weighted token shares must be uniform: weight_s * share_s == 1/n
    docs = spark.createDataFrame(
        [(0, "one two three four five six seven eight", "big"),
         (1, "one two three four five six", "big"),
         (2, "a b", "small")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in C.domain_mix_weights(docs).collect()}
    assert out["big"].n_docs == 2 and out["small"].n_docs == 1
    total = sum(r.n_tokens for r in out.values())
    for r in out.values():
        assert r.token_share == pytest.approx(r.n_tokens / total, abs=1e-12)
        assert r.mix_weight * r.token_share == pytest.approx(0.5, abs=1e-12)
    # the cap binds on the tiny domain
    capped = {r.source: r for r in
              C.domain_mix_weights(docs, max_weight=1.5).collect()}
    assert capped["small"].mix_weight == pytest.approx(1.5, abs=1e-12)
    assert capped["big"].mix_weight == out["big"].mix_weight


def test_corpus_shard_layout_independent(spark, docs):
    a = C.corpus_shard(docs, n_shards=3, seed=1).collect()
    b = C.corpus_shard(docs.repartition(7), n_shards=3, seed=1).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # every doc exactly once; positions dense 0..n-1 within each shard
    assert len(a) == docs.count()
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard_id, []).append(r.position)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))
    # a different seed reshuffles (some doc moves shard or position)
    c = C.corpus_shard(docs, n_shards=3, seed=2).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_scrub_dup_spans_keeps_canonical(spark):
    # docs 0 and 1 share "p q r s"; doc 0 is the corpus-first occurrence
    # and keeps its text; doc 1 loses the duplicated range only.
    docs = spark.createDataFrame(
        [(0, "p q r s tail0"), (1, "head1 p q r s tail1"),
         (2, "all unique words here now")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           C.scrub_dup_spans(docs, k=3, min_count=2).collect()}
    assert out[0].clean_text == "p q r s tail0" and out[0].n_removed == 0
    assert out[1].clean_text == "head1 tail1" and out[1].n_removed == 4
    assert out[2].clean_text == "all unique words here now"
    # token accounting is total
    for r in out.values():
        assert r.n_tokens - r.n_removed == len(r.clean_text.split()) \
            or (r.n_tokens == r.n_removed and r.clean_text == "")


def test_scrub_dup_spans_within_doc(spark):
    # a doc repeating its own trigram keeps the FIRST occurrence
    docs = spark.createDataFrame(
        [(0, "a b c x1 x2 x3 x4 a b c"), (1, "q w e r t y")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           C.scrub_dup_spans(docs, k=3, min_count=2).collect()}
    assert out[0].clean_text == "a b c x1 x2 x3 x4"
    assert out[0].n_removed == 3
    assert out[1].n_removed == 0


def test_pack_sequences_totality_and_shape(spark, docs):
    L = 8
    out = C.pack_sequences(docs, seq_len=L, n_shards=4, seed=1).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    # every document's tokens are packed exactly once, in order
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == set(texts)
    total_tokens = 0
    for did, rows in per_doc.items():
        rows.sort(key=lambda r: r.doc_off)
        n = len(texts[did].split())
        total_tokens += n
        assert sum(r.n_in_seq for r in rows) == n
        # doc pieces are contiguous and gapless in doc offsets
        off = 0
        for r in rows:
            assert r.doc_off == off
            off += r.n_in_seq
        # consecutive pieces land in consecutive sequences
        for a, b in zip(rows, rows[1:]):
            assert b.seq_id == a.seq_id + 1
    # every sequence is exactly L tokens except the final tail;
    # sequence ids are dense from 0
    per_seq = {}
    for r in out:
        per_seq[r.seq_id] = per_seq.get(r.seq_id, 0) + r.n_in_seq
    n_seq = max(per_seq) + 1
    assert set(per_seq) == set(range(n_seq))
    for sid, tot in per_seq.items():
        assert tot == (L if sid < n_seq - 1 else total_tokens - L * (n_seq - 1))
    # within a sequence, pieces tile [0, L) without overlap
    by_seq = {}
    for r in out:
        by_seq.setdefault(r.seq_id, []).append((r.seq_off, r.n_in_seq))
    for sid, pieces in by_seq.items():
        pieces.sort()
        pos = 0
        for s, n in pieces:
            assert s == pos
            pos += n


def test_pack_sequences_layout_and_shards_independent(spark, docs):
    a = C.pack_sequences(docs, seq_len=8, n_shards=4, seed=1).collect()
    b = C.pack_sequences(docs.repartition(7), seq_len=8, n_shards=4,
                         seed=1).collect()
    # n_shards is a pure parallelism knob: hash-RANGE blocks keep the
    # global (k, id) order, so the packing must not change with it
    c = C.pack_sequences(docs, seq_len=8, n_shards=1, seed=1).collect()
    d = C.pack_sequences(docs, seq_len=8, n_shards=64, seed=1).collect()
    key = lambda rows: sorted(map(tuple, rows))
    assert key(a) == key(b) == key(c) == key(d)
    # a different seed produces a different concatenation order
    e = C.pack_sequences(docs, seq_len=8, n_shards=4, seed=2).collect()
    assert key(a) != key(e)


def test_pack_sequences_text_reconstructs_stream(spark, docs):
    L = 8
    out = C.pack_sequences_text(docs, seq_len=L, n_shards=4, seed=1).collect()
    out.sort(key=lambda r: r.seq_id)
    # sequence ids dense, every sequence L tokens except the tail
    assert [r.seq_id for r in out] == list(range(len(out)))
    for r in out[:-1]:
        assert r.n_tokens == L
        assert len(r.seq_text.split()) == L
    assert len(out[-1].seq_text.split()) == out[-1].n_tokens
    # concatenating the sequences reproduces the corpus concatenated in
    # the same deterministic (md5, id) order used by the plan
    plan = C.pack_sequences(docs, seq_len=L, n_shards=4, seed=1).collect()
    first = {}
    for r in plan:
        if r.doc_off == 0:
            first[r.doc_id] = (r.seq_id, r.seq_off)
    order = sorted(first, key=lambda d: first[d])
    texts = {r.doc_id: r.text for r in docs.collect()}
    stream = " ".join(texts[d].strip() for d in order).split()
    packed = " ".join(r.seq_text for r in out).split()
    assert packed == stream


def test_lm_bigram_scores_orders_quality(spark):
    rows = [(0, "the cat sat on the mat and the cat sat on the mat"),
            (1, "the cat sat on the mat and the dog ran to the hill"),
            (2, "zx qy wv ut sr qp on ml kj ih gf ed cb az yx wu"),
            (3, "solo")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in C.lm_bigram_scores(docs).collect()}
    # <2-token docs have no bigrams and are omitted
    assert set(out) == {0, 1, 2}
    assert out[0].n_bigrams == 12 and out[2].n_bigrams == 15
    # repeated high-probability transitions score lower cross-entropy
    # than a doc of one-off transitions over a rare vocabulary
    assert out[0].h_bits < out[1].h_bits < out[2].h_bits
    # full sequential reference model: add-one smoothed bigram counts
    # over the corpus, H = -(1/B) sum log2((c12+1)/(c1+V))
    import math
    from collections import Counter
    toks = {d: t.split() for d, t in rows}
    big = Counter(b for t in toks.values() for b in zip(t, t[1:]))
    pre = Counter()
    for (w1, _), c in big.items():
        pre[w1] += c
    vocab = len({w for t in toks.values() for w in t})
    for did in (0, 1, 2):
        bs = list(zip(toks[did], toks[did][1:]))
        h = -sum(math.log2((big[b] + 1) / (pre[b[0]] + vocab))
                 for b in bs) / len(bs)
        assert abs(out[did].h_bits - round(h, 4)) < 5e-4


def _ref_bpe(texts, n_merges):
    """Sequential reference BPE: greedy left-to-right merges, argmax by
    (count desc, pair lexicographic asc), stop when best count < 2."""
    from collections import Counter
    vocab = Counter(w for t in texts for w in t.split() if w)
    seqs = {w: tuple(w) for w in vocab}
    merges = []
    for r in range(1, n_merges + 1):
        pc = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += vocab[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        if c < 2:
            break
        merges.append((r, a, b, a + b, c))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges, seqs, vocab


def test_bpe_train_matches_sequential_reference(spark):
    rows = [(i, t) for i, t in enumerate([
        "low lower lowest slow slower slowest",
        "new newer newest few fewer fewest",
        "low low low new new slow",
        "wider wide widest ow ow ow",
    ])]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    mdf, merges = C.bpe_train(docs, n_merges=6)
    ref_merges, ref_seqs, vocab = _ref_bpe([t for _, t in rows], 6)
    assert merges == ref_merges
    assert [tuple(r) for r in mdf.collect()] == ref_merges
    # encode agrees with the reference segmentation symbol counts
    enc = {r.doc_id: r for r in C.bpe_encode(docs, merges).collect()}
    for did, t in rows:
        words = [w for w in t.split() if w]
        assert enc[did].n_tokens == len(words)
        assert enc[did].n_symbols == sum(len(ref_seqs[w]) for w in words)


def test_bpe_merge_is_greedy_left_to_right(spark):
    # 'aaaa' -> two (a,a) merges; 'aaa' -> one merge + lone 'a'
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaa")], "doc_id long, text string")
    _, merges = C.bpe_train(docs, n_merges=1)
    # vocab = {aaaa: 2, aaa: 1}; adjacent (a,a) pairs: 'aaaa' has 3,
    # 'aaa' has 2 -> weighted count 2*3 + 1*2 = 8
    assert merges == [(1, "a", "a", "aa", 8)]
    ref_merges, ref_seqs, _ = _ref_bpe(["aaaa aaaa aaa"], 1)
    assert merges == ref_merges
    enc = {r.doc_id: r for r in C.bpe_encode(docs, merges).collect()}
    # aaaa -> [aa, aa] (2), aaa -> [aa, a] (2): 2 + 2 + 2 = 6 symbols
    assert enc[0].n_symbols == 6 and enc[0].n_tokens == 3


def test_bpe_train_early_stop(spark):
    docs = spark.createDataFrame(
        [(0, "ab cd ef")], "doc_id long, text string")
    mdf, merges = C.bpe_train(docs, n_merges=5)
    # every pair occurs once -> best count < 2 -> no merges at all
    assert merges == [] and mdf.count() == 0
    enc = C.bpe_encode(docs, merges).collect()[0]
    assert enc.n_tokens == 3 and enc.n_symbols == 6


def test_temperature_mix_limits_and_ordering(spark):
    rows = [(i, "w " * (200 if i < 8 else 10), "big" if i < 8 else "small")
            for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # alpha=1: q == p (natural mixture), upsample == 1
    nat = {r.source: r for r in
           C.temperature_mix_weights(docs, alpha=1.0).collect()}
    for r in nat.values():
        assert abs(r.temp_prob - r.token_share) <= 1e-4
        assert abs(r.upsample - 1.0) <= 1e-4
    # alpha=0: uniform over sources regardless of size
    uni = {r.source: r for r in
           C.temperature_mix_weights(docs, alpha=0.0).collect()}
    assert abs(uni["big"].temp_prob - 0.5) <= 1e-4
    assert abs(uni["small"].temp_prob - 0.5) <= 1e-4
    # 0 < alpha < 1: strictly between — rare source upsampled, big
    # source downsampled, probabilities still sum to 1
    mid = {r.source: r for r in
           C.temperature_mix_weights(docs, alpha=0.3).collect()}
    assert mid["small"].token_share < mid["small"].temp_prob < 0.5
    assert 0.5 < mid["big"].temp_prob < mid["big"].token_share
    assert abs(mid["big"].temp_prob + mid["small"].temp_prob - 1.0) <= 2e-4
    assert mid["small"].upsample > 1.0 > mid["big"].upsample


class TestDsirWeights:
    def test_matches_reference_and_separates_domains(self, spark):
        import hashlib
        import math
        from collections import Counter

        from whitebox_tools_spark.operators.curation import dsir_weights

        target_vocab = ["alpha", "beta", "gamma", "delta"]
        other_vocab = ["one", "two", "three", "four"]
        rows = []
        for i in range(20):
            vocab = target_vocab if i % 2 == 0 else other_vocab
            toks = [vocab[(i + j) % 4] for j in range(6)]
            rows.append((i, " ".join(toks)))
        rows.append((20, "   "))  # no tokens -> omitted
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               dsir_weights(docs, "doc_id % 2 = 0").collect()}

        def bucket(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:4], 16)

        def grams(text):
            t = text.split()
            return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

        B = 65536
        db = {i: Counter(bucket(g) for g in grams(txt))
              for i, txt in rows[:-1]}
        tc, rc = Counter(), Counter()
        for i, c in db.items():
            rc.update(c)
            if i % 2 == 0:
                tc.update(c)
        T, R = sum(tc.values()), sum(rc.values())
        assert 20 not in out and len(out) == 20
        for i, c in db.items():
            want = sum(n * (math.log((tc[b] + 1) / (T + B))
                            - math.log((rc[b] + 1) / (R + B)))
                       for b, n in c.items())
            assert abs(out[i]["log_w"] - round(want, 4)) < 2e-4
            assert out[i]["n_grams"] == sum(c.values())
        # the importance ratio separates the domains strictly
        tmin = min(out[i]["log_w"] for i in range(0, 20, 2))
        omax = max(out[i]["log_w"] for i in range(1, 20, 2))
        assert tmin > 0 > omax
