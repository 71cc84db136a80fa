"""Ranked-retrieval and corpus-bucketing operators over the documents
table: TF-IDF keyword extraction, BM25 search, CCNet-style perplexity
terciles.

Public references:
- Sparck Jones 1972 (IDF); the smoothed form used here is the one
  scikit-learn's TfidfTransformer documents:
  tfidf = tf * (ln((N + 1) / (df + 1)) + 1).
- Robertson et al., Okapi at TREC-3 (1994), BM25:
  idf = ln(1 + (N - df + 0.5) / (df + 0.5)),
  score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
- Wenzek et al. 2020 (CCNet): the corpus splits into head/middle/tail
  perplexity terciles and training recipes sample per bucket.

Scale shape (10^12 docs):
- term frequencies are ONE explode + groupBy (doc_id, term); the frame
  feeds 3 consumers but stays LAZY — the identical shuffle subtree is
  deduplicated by Spark's ReusedExchange, so the corpus explode runs
  once (a localCheckpoint pin measured 1.4-2.5x slower at 16M docs —
  materializing the ~200M-row frame costs more than reuse saves).
  Document frequencies reduce that frame again by term. Corpus scalars
  (N, sum(dl)) ride as a broadcast 1-row frame (the lm_bigram_scores
  pattern) — no driver collect anywhere.
- tfidf's top-k window is PARTITIONED BY doc_id: millions of tiny
  partitions, never a global sort.
- bm25 joins only the posting lists of the Q query terms (Q-row frame,
  broadcast) to per-doc lengths; per-term top-k runs the SALTED
  two-phase exact top-k (row_number within (term, salt) capped at k,
  then a final window over the <= n_salt*k survivors) so the hottest
  posting list — df ~ N for a stopword query — never sorts in a single
  task. The two-phase form is exact, not approximate.
- perplexity buckets rank h_bits with plans/rank.global_row_number
  (range-partitioned distributed row_number, P-row driver offset table)
  and assign the tercile with the same closed-form NTILE arithmetic
  raster.quantiles() uses (first n%k buckets hold ceil(n/k) rows).

Float discipline: every emitted double is ROUND(expr, 6) where every
input of expr is EXACT — integer counts cast to double, and avgdl
written as the exact ratio CAST(sum_dl AS DOUBLE)/CAST(n AS DOUBLE),
never an engine AVG (whose summation order differs between engines).
The score expression TEXT is shared verbatim with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def _tfidf_score_expr() -> str:
    """Shared Spark/DuckDB text; reads columns tf, df, __n."""
    return (
        "ROUND(CAST(tf AS DOUBLE) * (LN((CAST(__n AS DOUBLE) + 1.0) / "
        "(CAST(df AS DOUBLE) + 1.0)) + 1.0), 6)"
    )


def _bm25_term_expr(k1: float, b: float) -> str:
    """One term's unrounded BM25 contribution; shared Spark/DuckDB
    text; reads columns tf, df, dl, __n, __sdl."""
    nd = "CAST(__n AS DOUBLE)"
    dfd = "CAST(df AS DOUBLE)"
    tfd = "CAST(tf AS DOUBLE)"
    dld = "CAST(dl AS DOUBLE)"
    avgdl = "(CAST(__sdl AS DOUBLE) / CAST(__n AS DOUBLE))"
    return (
        f"LN(1.0 + ({nd} - {dfd} + 0.5) / ({dfd} + 0.5)) * "
        f"({tfd} * ({k1!r} + 1.0)) / "
        f"({tfd} + {k1!r} * (1.0 - {b!r} + {b!r} * {dld} / {avgdl}))"
    )


def _bm25_score_expr(k1: float, b: float) -> str:
    """Shared Spark/DuckDB text; reads columns tf, df, dl, __n, __sdl."""
    return f"ROUND({_bm25_term_expr(k1, b)}, 6)"


def _term_freqs(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id_col, term, tf) over whitespace tokens; empty tokens dropped
    (an all-whitespace doc splits to [''])."""
    s_toks = T.tokens_expr(text_col)[0]
    return (
        docs.selectExpr(id_col, f"{s_toks} AS __t")
        .select(id_col, F.explode("__t").alias("term"))
        .where("term <> ''")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _salted_topk(df: DataFrame, part_cols: list[str], order_cols: list,
                 k: int, salt_on: list[str], n_salt: int = 32) -> DataFrame:
    """Exact distributed top-k per part_cols group (global when empty):
    phase 1 ranks within (part_cols, salt) and keeps <= k per salt cell,
    phase 2 ranks the <= n_salt*k survivors. Any row in the true top-k
    is in the top-k of its salt cell, so the composition is exact."""
    d = df.withColumn("__salt", F.pmod(F.xxhash64(*salt_on), F.lit(n_salt)))
    w1 = Window.partitionBy(*(part_cols + ["__salt"])).orderBy(*order_cols)
    # the phase-2 frame holds <= n_salt*k rows per group; the constant
    # partition key keeps Spark from warning about the (intentional,
    # provably tiny) single-partition window in the global case
    w2 = (Window.partitionBy(*part_cols) if part_cols
          else Window.partitionBy(F.lit(0))).orderBy(*order_cols)
    return (
        d.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
        .drop("__salt", "__r1")
    )


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Per-document top-k keywords by smoothed TF-IDF.

    N is the number of documents with >= 1 token (the set the tf frame
    ranges over). Ties in the rounded score break on term ASC.
    Output: (id_col, term, tf, df, tfidf, rank).
    """
    # r06 restructure: the df reduction and the N scalar no longer hang
    # off the tf frame (AQE in Spark 4.1 does NOT reuse the (doc, term)
    # exchange across the three branches — event-log verified: the
    # partial-agg map stage executed once per consumer). Instead each
    # branch aggregates map-side from the token arrays directly:
    #   df(term)  = COUNT per term over EXPLODE(ARRAY_DISTINCT(tokens))
    #               (one row per (doc, term) by construction — exactly
    #               tf.groupBy(term).count, all-integer, bit-equal) and
    #               the partial agg collapses to ~|vocab| rows per task
    #               BEFORE the exchange — strictly less shuffle at any
    #               scale than re-keying the corpus-sized tf frame;
    #   N         = one count of docs with >= 1 non-empty token — a
    #               scalar aggregate, zero exchange, zero explode.
    toks = docs.selectExpr(
        id_col, f"FILTER({T.tokens_expr(text_col)[0]}, t -> t <> '') AS __t"
    ).where("SIZE(__t) > 0")
    tf = _term_freqs(docs, text_col, id_col)
    dfq = toks.select(F.explode(F.array_distinct("__t")).alias("term")) \
        .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = toks.agg(F.count(F.lit(1)).alias("__n"))
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        tf.join(dfq, "term")
        .crossJoin(F.broadcast(stats))
        .selectExpr(id_col, "term", "tf", "df",
                    f"{_tfidf_score_expr()} AS tfidf")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(id_col, "term", F.col("tf").cast("long").alias("tf"),
                F.col("df").cast("long").alias("df"), "tfidf", "rank")
    )


def bm25_topk(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_query_terms: int = 20,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_salt: int = 32,
) -> DataFrame:
    """Okapi BM25 top-k documents for each of the top-`n_query_terms`
    corpus terms by document frequency (single-term queries — the
    inverted-index shape; a multi-term query is a SUM over these rows).

    avgdl is the exact ratio sum(dl)/N so both engines compute the
    identical double. Ties in the rounded score break on id ASC.
    Output: (term, id_col, tf, df, dl, score, rank).
    """
    # r06 restructure (same rows, all-integer bit-equal inputs):
    #   dl  rides the tf frame as a per-row column — SIZE of the
    #       non-empty token array IS sum(tf) per doc, so the former
    #       corpus-sized dl aggregation + (doc_id) re-key join vanish;
    #   N, sum(dl) reduce per-row from the token arrays (scalar agg,
    #       zero exchange);
    #   df  aggregates map-side from EXPLODE(ARRAY_DISTINCT(tokens))
    #       (~|vocab| rows per task pre-exchange) instead of re-keying
    #       the corpus-sized tf frame — AQE 4.1 does not reuse the
    #       (doc, term) exchange across branches (event-log verified),
    #       so each tf-derived branch was a full extra corpus pass.
    toks = docs.selectExpr(
        id_col, f"FILTER({T.tokens_expr(text_col)[0]}, t -> t <> '') AS __t"
    ).where("SIZE(__t) > 0")
    tf = (
        toks.selectExpr(id_col, "SIZE(__t) AS dl", "EXPLODE(__t) AS term")
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = toks.agg(F.count(F.lit(1)).alias("__n"),
                     F.sum(F.size("__t")).alias("__sdl"))
    dfq = toks.select(F.explode(F.array_distinct("__t")).alias("term")) \
        .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = (
        _salted_topk(dfq, [], [F.desc("df"), F.asc("term")],
                     n_query_terms, salt_on=["term"], n_salt=n_salt)
        .select("term", "df")
    )
    cand = (
        tf.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .selectExpr("term", id_col, "tf", "df", "dl",
                    f"{_bm25_score_expr(k1, b)} AS score")
    )
    ranked = _salted_topk(cand, ["term"], [F.desc("score"), F.asc(id_col)],
                          k, salt_on=[id_col], n_salt=n_salt)
    return ranked.select(
        "term", id_col, F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        F.col("dl").cast("long").alias("dl"), "score", "rank")


_BUCKET_CASE = ("CASE __nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' "
                "ELSE 'tail' END")


def perplexity_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet head/middle/tail terciles of the bigram-LM cross-entropy
    (curation.lm_bigram_scores): head = most-probable third. The global
    ordering (h_bits, id) runs as a distributed row_number; the tercile
    is the closed-form NTILE(3) of (rank, n). Docs with < 2 tokens have
    no bigrams and are omitted (the lm contract).
    Output: (id_col, n_bigrams, h_bits, bucket).
    """
    from ..plans.rank import global_row_number
    from .curation import lm_bigram_scores

    scored = lm_bigram_scores(docs, text_col, id_col)
    ranked, n = global_row_number(scored, ["h_bits", id_col], out="__rn")
    q, m = divmod(n, 3)
    if q == 0:
        nt = "CAST(__rn AS INT)"
    else:
        cut = m * (q + 1)
        nt = (f"CAST(CASE WHEN __rn <= {cut} THEN ((__rn + {q}) DIV {q + 1}) "
              f"ELSE {m} + ((__rn - {cut} + {q - 1}) DIV {q}) END AS INT)")
    return (
        ranked.selectExpr(id_col, "n_bigrams", "h_bits", f"{nt} AS __nt")
        .selectExpr(id_col, "n_bigrams", "h_bits", f"{_BUCKET_CASE} AS bucket")
    )


# ---------------------------------------------------------------------------
# DuckDB oracles (shared score-expression text; plain windows replace the
# salted two-phase — exact, so the results agree bit-for-bit)

def _tf_ctes(table: str, text_col: str, id_col: str) -> str:
    d_toks = T.tokens_expr(text_col)[1]
    return (
        f"t AS (SELECT {id_col}, unnest({d_toks}) AS term FROM {table}), "
        f"tf0 AS (SELECT {id_col}, term, COUNT(*) AS tf FROM t "
        f"WHERE term <> '' GROUP BY 1, 2)"
    )


def tfidf_oracle_sql(table: str = "documents", text_col: str = "text",
                     id_col: str = "doc_id", k: int = 5) -> str:
    return f"""
WITH {_tf_ctes(table, text_col, id_col)},
dfq AS (SELECT term, COUNT(*) AS df FROM tf0 GROUP BY 1),
nd AS (SELECT COUNT(DISTINCT {id_col}) AS __n FROM tf0),
s AS (SELECT tf0.{id_col}, tf0.term, tf0.tf, dfq.df,
             {_tfidf_score_expr()} AS tfidf
      FROM tf0 JOIN dfq USING (term) CROSS JOIN nd),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY {id_col}
                ORDER BY tfidf DESC, term) AS rank FROM s)
SELECT {id_col}, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       tfidf, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def bm25_oracle_sql(table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id", n_query_terms: int = 20,
                    k: int = 10, k1: float = 1.2, b: float = 0.75) -> str:
    return f"""
WITH {_tf_ctes(table, text_col, id_col)},
dl AS (SELECT {id_col}, SUM(tf) AS dl FROM tf0 GROUP BY 1),
stats AS (SELECT COUNT(*) AS __n, SUM(dl) AS __sdl FROM dl),
dfq AS (SELECT term, COUNT(*) AS df FROM tf0 GROUP BY 1),
qt AS (SELECT term, df FROM (SELECT term, df, ROW_NUMBER() OVER
       (ORDER BY df DESC, term) AS qr FROM dfq) q WHERE qr <= {n_query_terms}),
s AS (SELECT tf0.term, tf0.{id_col}, tf0.tf, qt.df, dl.dl,
             {_bm25_score_expr(k1, b)} AS score
      FROM tf0 JOIN qt USING (term) JOIN dl USING ({id_col})
      CROSS JOIN stats),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY term
                ORDER BY score DESC, {id_col}) AS rank FROM s)
SELECT term, {id_col}, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(dl AS BIGINT) AS dl, score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def perplexity_buckets_oracle_sql(table: str = "documents",
                                  text_col: str = "text",
                                  id_col: str = "doc_id") -> str:
    from .curation import lm_bigram_oracle_sql

    lm = lm_bigram_oracle_sql(table, text_col, id_col)
    return f"""
SELECT {id_col}, n_bigrams, h_bits, {_BUCKET_CASE} AS bucket
FROM (SELECT lm.*, NTILE(3) OVER (ORDER BY h_bits, {id_col}) AS __nt
      FROM ({lm}) lm) q
"""


def bm25_query(
    docs: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_salt: int = 32,
) -> DataFrame:
    """Multi-term BM25 search: score = sum of per-term BM25
    contributions over the query's distinct whitespace tokens
    (Robertson TREC-3 — a document matching several query terms
    outranks single-term matches), global top-k.

    Scale shape: the query's distinct terms enter as LITERALS (IN
    filter pushed to the tf frame — at 10^12 docs the posting lists
    of the query terms are the only rows that move), one groupBy on
    the doc id sums the contributions, and the global top-k is the
    salted two-phase exact form. Rounding happens once, on the summed
    score (the lm aggregate-float discipline).
    Output: (id_col, n_hit_terms, score, rank).
    """
    terms = sorted({t for t in query.split() if t})
    if not terms:
        raise ValueError("query has no tokens")
    # escape for the Spark dialect: backslash is an escape character in
    # Spark SQL literals (it is not in DuckDB), so a term ending in \
    # would otherwise eat the closing quote (ADVICE r05)
    lit = ", ".join(
        "'" + t.replace("\\", "\\\\").replace("'", "''") + "'" for t in terms)
    # r06 restructure — same shape change as bm25_topk (AQE 4.1 does not
    # reuse the (doc, term) exchange across branches): dl rides tf as a
    # per-row SIZE column, N/sum(dl) reduce per-row with zero exchange,
    # df aggregates map-side from the distinct-token explode. The IN
    # filter sits below the tf groupBy, so only query-term postings move.
    toks = docs.selectExpr(
        id_col, f"FILTER({T.tokens_expr(text_col)[0]}, t -> t <> '') AS __t"
    ).where("SIZE(__t) > 0")
    tf = (
        toks.selectExpr(id_col, "SIZE(__t) AS dl", "EXPLODE(__t) AS term")
        .where(f"term IN ({lit})")
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = toks.agg(F.count(F.lit(1)).alias("__n"),
                     F.sum(F.size("__t")).alias("__sdl"))
    dfq = toks.select(F.explode(F.array_distinct("__t")).alias("term")) \
        .where(f"term IN ({lit})") \
        .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(stats))
        .selectExpr(id_col, "term", f"{_bm25_term_expr(k1, b)} AS __s")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit_terms"),
             F.expr("ROUND(SUM(__s), 6)").alias("score"))
    )
    return _salted_topk(scored, [], [F.desc("score"), F.asc(id_col)], k,
                        salt_on=[id_col], n_salt=n_salt)


def bm25_query_oracle_sql(query: str, table: str = "documents",
                          text_col: str = "text", id_col: str = "doc_id",
                          k: int = 10, k1: float = 1.2,
                          b: float = 0.75) -> str:
    terms = sorted({t for t in query.split() if t})
    lit = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH {_tf_ctes(table, text_col, id_col)},
dl AS (SELECT {id_col}, SUM(tf) AS dl FROM tf0 GROUP BY 1),
stats AS (SELECT COUNT(*) AS __n, SUM(dl) AS __sdl FROM dl),
dfq AS (SELECT term, COUNT(*) AS df FROM tf0 GROUP BY 1),
s AS (SELECT tf0.{id_col}, COUNT(*) AS n_hit_terms,
             ROUND(SUM({_bm25_term_expr(k1, b)}), 6) AS score
      FROM tf0 JOIN dfq USING (term) JOIN dl USING ({id_col})
      CROSS JOIN stats
      WHERE term IN ({lit}) GROUP BY 1),
r AS (SELECT {id_col}, CAST(n_hit_terms AS BIGINT) AS n_hit_terms, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, {id_col}) AS rank
      FROM s)
SELECT {id_col}, n_hit_terms, score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""
