"""Text-analysis expression builders for the training-data pipeline.

Each helper returns a PAIR of SQL strings (spark_sql, duckdb_sql) with
identical semantics, so every text operator gets an exact DuckDB oracle:
language-ID scoring, quality scoring, token counting, shingling,
MinHash signatures, SimHash fingerprints, winnowing fingerprints.

Design notes for 100 TB:
- everything is built-in-function SQL over arrays (codegen/vectorized,
  zero Python); per-doc work is O(tokens)
- md5 is the only hash used (available and identical on both engines);
  Spark's xxhash64 is faster but engine-specific, so md5 stays the
  parity hash while xxhash64 backs the non-gated fast paths
"""

from __future__ import annotations

# token split: whitespace runs. Spark split() takes a Java regex; DuckDB
# needs regexp_split_to_array.
def tokens_expr(col: str) -> tuple[str, str]:
    return (
        f"SPLIT(TRIM({col}), '\\\\s+')",
        f"regexp_split_to_array(trim({col}), '\\s+')",
    )


def token_count_expr(col: str) -> tuple[str, str]:
    s, d = tokens_expr(col)
    return (f"SIZE({s})", f"len({d})")


# BPE-ish pre-tokenizer (the GPT-2 pattern family, simplified to the
# subset Java regex and RE2 evaluate identically — no lookahead, ASCII
# classes): contraction suffixes, space-prefixed letter runs, digit
# runs, punctuation runs. Counts the segments a byte-pair encoder would
# merge within — the standard "token budget" estimator when the real
# tokenizer isn't on the cluster.
_BPE_PAT_SPARK = "''(s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\\\s]+"
_BPE_PAT_DUCK = "''(s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"


def bpe_token_count_expr(col: str) -> tuple[str, str]:
    return (
        f"SIZE(REGEXP_EXTRACT_ALL({col}, '{_BPE_PAT_SPARK}'))",
        f"len(regexp_extract_all({col}, '{_BPE_PAT_DUCK}'))",
    )


# ---------------------------------------------------------------------------
# Language ID: fixed marker-word lists, hit-count scoring, argmax with
# deterministic tie-break on list order.
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "value", "fast"),
    "es": ("data", "row", "stream", "slow"),
    "de": ("hash", "vector", "key", "agg"),
    "zh": ("join", "merge", "window", "big"),
    "fr": ("order", "query", "small", "line"),
}


def lang_scores_expr(col: str) -> dict[str, tuple[str, str]]:
    s_toks, d_toks = tokens_expr(col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = ", ".join(f"'{m}'" for m in markers)
        out[lang] = (
            f"SIZE(FILTER({s_toks}, t -> ARRAY_CONTAINS(ARRAY({marker_arr}), t)))",
            f"len(list_filter({d_toks}, t -> list_contains([{marker_arr}], t)))",
        )
    return out


def lang_id_expr(col: str) -> tuple[str, str]:
    """Predicted language = highest marker-hit count; ties resolve to the
    first language in LANG_MARKERS order (struct/row comparison: score
    desc via negation, then insertion index)."""
    scores = lang_scores_expr(col)
    s_structs, d_structs = [], []
    for i, (lang, (s, d)) in enumerate(scores.items()):
        s_structs.append(f"STRUCT(-({s}) AS neg, {i} AS ord, '{lang}' AS lang)")
        d_structs.append(f"{{'neg': -({d}), 'ord': {i}, 'lang': '{lang}'}}")
    spark = f"ARRAY_MIN(ARRAY({', '.join(s_structs)})).lang"
    duck = f"list_aggregate([{', '.join(d_structs)}], 'min').lang"
    return spark, duck


# ---------------------------------------------------------------------------
# Quality scoring: integer-arithmetic components, one final division.
# ---------------------------------------------------------------------------


def quality_score_exprs(col: str) -> dict[str, tuple[str, str]]:
    s_toks, d_toks = tokens_expr(col)
    stop = "'a', 'the', 'of', 'and'"
    return {
        "q_chars": (f"LENGTH({col})", f"length({col})"),
        "q_tokens": (f"SIZE({s_toks})", f"len({d_toks})"),
        "q_stopwords": (
            f"SIZE(FILTER({s_toks}, t -> ARRAY_CONTAINS(ARRAY({stop}), t)))",
            f"len(list_filter({d_toks}, t -> list_contains([{stop}], t)))",
        ),
        "q_mean_token_len": (
            f"CAST(LENGTH(REPLACE({col}, ' ', '')) AS DOUBLE) / CAST(SIZE({s_toks}) AS DOUBLE)",
            f"CAST(length(replace({col}, ' ', '')) AS DOUBLE) / CAST(len({d_toks}) AS DOUBLE)",
        ),
        "q_stopword_ratio": (
            f"CAST(SIZE(FILTER({s_toks}, t -> ARRAY_CONTAINS(ARRAY({stop}), t))) AS DOUBLE)"
            f" / CAST(SIZE({s_toks}) AS DOUBLE)",
            f"CAST(len(list_filter({d_toks}, t -> list_contains([{stop}], t))) AS DOUBLE)"
            f" / CAST(len({d_toks}) AS DOUBLE)",
        ),
    }


# ---------------------------------------------------------------------------
# Shingles / MinHash / fingerprints
# ---------------------------------------------------------------------------


def shingles_expr(col: str, n: int = 3) -> tuple[str, str]:
    """Word n-gram shingle strings (space-joined).

    Docs with fewer than n tokens yield an EMPTY array on both engines
    (Spark SEQUENCE's default step is -1 when stop < start, so the
    unguarded form would count DOWN into out-of-bounds ELEMENT_AT
    indices — an ANSI-mode job killer on any short doc; the guard makes
    it total). SLICE(toks, 1, 0) is the typed empty array<string>.
    """
    s_toks, d_toks = tokens_expr(col)
    parts = []
    for j in range(n):
        if j:
            parts.append("' '")
        parts.append(f"ELEMENT_AT(__tk, i + {j + 1})")
    # let-binding via a 1-element TRANSFORM: higher-order functions run
    # interpreted (no whole-stage codegen, no common-subexpression
    # elimination), so an inlined {s_toks} would re-run the regex SPLIT
    # for EVERY lambda element reference — measured 19x slower on the
    # sf0.1 corpus (8.3 s -> 0.4 s for the gram explode). Binding the
    # token array to __tk evaluates SPLIT once per row.
    spark = (
        f"ELEMENT_AT(TRANSFORM(ARRAY({s_toks}), __tk -> "
        f"CASE WHEN SIZE(__tk) < {n} THEN SLICE(__tk, 1, 0) "
        f"ELSE TRANSFORM(SEQUENCE(0, SIZE(__tk) - {n}), i -> CONCAT({', '.join(parts)})) END), 1)"
    )
    d_parts = []
    for j in range(n):
        if j:
            d_parts.append("' '")
        d_parts.append(f"{d_toks}[i + {j}]")
    duck = (
        f"list_transform(range(1, len({d_toks}) - {n - 1} + 1), "
        f"i -> concat({', '.join(d_parts)}))"
    )
    return spark, duck


def minhash_sig_expr(col: str, perm: int, n: int = 3) -> tuple[str, str]:
    """One MinHash signature element: lexicographic min of salted md5
    over the doc's shingle set."""
    s_sh, d_sh = shingles_expr(col, n)
    spark = f"ARRAY_MIN(TRANSFORM({s_sh}, s -> MD5(CONCAT('{perm}:', s))))"
    duck = f"list_aggregate(list_transform({d_sh}, s -> md5(concat('{perm}:', s))), 'min')"
    return spark, duck


def band_key_expr(col: str, band: int, rows_per_band: int, n: int = 3) -> tuple[str, str]:
    """LSH band key: md5 over the concatenation of `rows_per_band`
    signature elements."""
    s_parts, d_parts = [], []
    for r in range(rows_per_band):
        perm = band * rows_per_band + r
        s, d = minhash_sig_expr(col, perm, n)
        s_parts.append(s)
        d_parts.append(d)
    return (
        f"MD5(CONCAT({', '.join(s_parts)}))",
        f"md5(concat({', '.join(d_parts)}))",
    )


def doc_fingerprint_expr(col: str, n: int = 5) -> tuple[str, str]:
    """Winnowing-lite document fingerprint: min md5 over word n-gram
    shingles — a content-defined stable id for near-dup blocking."""
    s_sh, d_sh = shingles_expr(col, n)
    return (
        f"ARRAY_MIN(TRANSFORM({s_sh}, s -> MD5(s)))",
        f"list_aggregate(list_transform({d_sh}, s -> md5(s)), 'min')",
    )


# ---------------------------------------------------------------------------
# SimHash (16-bit, md5-derived per-token hashes)
# ---------------------------------------------------------------------------

_HEXD = "0123456789abcdef"


def _hex_digit(src_expr: str, pos: int, duck: bool) -> str:
    fn = "strpos" if duck else "INSTR"
    return f"({fn}('{_HEXD}', SUBSTR({src_expr}, {pos}, 1)) - 1)"


def token_hash16_expr(tok: str, duck: bool) -> str:
    """16-bit token hash from the first 4 hex digits of md5(token)."""
    md5 = f"md5({tok})" if duck else f"MD5({tok})"
    ds = [_hex_digit(md5, i + 1, duck) for i in range(4)]
    return f"({ds[0]} * 4096 + {ds[1]} * 256 + {ds[2]} * 16 + {ds[3]})"


def simhash16_exprs(col: str) -> tuple[str, str]:
    """SimHash-16: per bit, sum +1/-1 over token hashes; bit set iff the
    sum is > 0. Pure array-fold SQL on both engines."""
    s_toks, d_toks = tokens_expr(col)
    s_h = token_hash16_expr("t", duck=False)
    d_h = token_hash16_expr("t", duck=True)
    s_bits, d_bits = [], []
    for b in range(16):
        s_vote = (
            f"AGGREGATE({s_toks}, 0, (acc, t) -> acc + "
            f"(CASE WHEN (CAST({s_h} AS BIGINT) >> {b}) % 2 = 1 THEN 1 ELSE -1 END))"
        )
        d_vote = (
            f"list_sum(list_transform({d_toks}, t -> "
            f"CASE WHEN (CAST({d_h} AS BIGINT) >> {b}) % 2 = 1 THEN 1 ELSE -1 END))"
        )
        s_bits.append(f"(CASE WHEN ({s_vote}) > 0 THEN {1 << b} ELSE 0 END)")
        d_bits.append(f"(CASE WHEN ({d_vote}) > 0 THEN {1 << b} ELSE 0 END)")
    return (
        "(" + " + ".join(s_bits) + ")",
        "(" + " + ".join(d_bits) + ")",
    )


# ---------------------------------------------------------------------------
# SimHash-64 with 4 x 16-bit band keys — the design-scale fingerprint.
# 16-bit simhash has only 65 536 buckets (quadratic in-bucket joins at
# 10^12 docs); 64 bits with 4 banded 16-bit keys gives 4 x 65 536-way
# partitioning AND an EXACT candidate guarantee for hamming <= 3
# (pigeonhole: 4 bands, at most 3 differing bits -> >= 1 identical band).
# ---------------------------------------------------------------------------


def simhash64_band_exprs(col: str) -> tuple[list[str], list[str]]:
    """Four 16-bit band keys of the 64-bit SimHash (band j = bits
    16j..16j+15, j=0 least significant). The per-token 64-bit hash is
    md5(token)'s first 16 hex digits (digit i covers bits 60-4i..63-4i);
    per bit, tokens vote +1/-1 and the bit is set iff the vote is > 0.
    The md5 is materialized ONCE per token via a TRANSFORM column; every
    vote folds over that array. Returns (spark_exprs, duck_exprs), each
    a 4-list over a column named __th (the md5 array) — callers stage
    __th = TRANSFORM(tokens, t -> MD5(t)) first."""
    def digit(h: str, pos: int, duck: bool) -> str:
        fn = "strpos" if duck else "INSTR"
        return f"({fn}('{_HEXD}', SUBSTR({h}, {pos}, 1)) - 1)"

    def band(j: int, duck: bool) -> str:
        bits = []
        for b16 in range(16):
            b = 16 * j + b16          # global bit index, 0 = lsb
            dig_idx = 15 - b // 4     # 0-based digit position from the left
            bit_in_digit = b % 4
            d = digit("h", dig_idx + 1, duck)
            bit = f"((({d}) >> {bit_in_digit}) & 1)"
            if duck:
                vote = f"list_sum(list_transform(__th, h -> CASE WHEN {bit} = 1 THEN 1 ELSE -1 END))"
            else:
                vote = f"AGGREGATE(__th, 0, (acc, h) -> acc + (CASE WHEN {bit} = 1 THEN 1 ELSE -1 END))"
            bits.append(f"(CASE WHEN ({vote}) > 0 THEN {1 << b16} ELSE 0 END)")
        return "(" + " + ".join(bits) + ")"

    return ([band(j, False) for j in range(4)], [band(j, True) for j in range(4)])


def token_md5s_exprs(col: str) -> tuple[str, str]:
    """Per-token md5 array (staged once; simhash64 votes fold over it)."""
    s_toks, d_toks = tokens_expr(col)
    return (
        f"TRANSFORM({s_toks}, t -> MD5(t))",
        f"list_transform({d_toks}, t -> md5(t))",
    )


# ---------------------------------------------------------------------------
# PII scrubbing: patterns restricted to the Java-regex / RE2-identical
# subset (ASCII classes, bounded quantifiers, no lookaround, no capture
# groups) so the Spark plan and the DuckDB oracle run the SAME regex.
# The fixture corpus carries no PII, so the gated query INJECTS
# deterministic synthetic emails/phones first (pii_inject_expr) — the
# scrubber is then exercised against known ground truth.
# ---------------------------------------------------------------------------

# Spark SQL string literals process backslash escapes; DuckDB standard
# single-quoted literals do not — hence the two spellings of `\.`.
_EMAIL_PAT_SPARK = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\\\.[A-Za-z]{2,}"
_EMAIL_PAT_DUCK = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_PAT = "[0-9]{3}-[0-9]{4}"


def pii_inject_expr(col: str, id_col: str) -> tuple[str, str]:
    """Deterministically append a synthetic email (ids % 3 = 0) and/or
    phone number (ids % 5 = 0) to the text — test ground truth."""
    spark = (
        f"CONCAT({col}, "
        f"CASE WHEN {id_col} % 3 = 0 THEN CONCAT(' contact user', "
        f"CAST({id_col} AS STRING), '@example.com now') ELSE '' END, "
        f"CASE WHEN {id_col} % 5 = 0 THEN CONCAT(' call 555-', "
        f"LPAD(CAST({id_col} % 10000 AS STRING), 4, '0')) ELSE '' END)"
    )
    duck = (
        f"concat({col}, "
        f"CASE WHEN {id_col} % 3 = 0 THEN concat(' contact user', "
        f"CAST({id_col} AS VARCHAR), '@example.com now') ELSE '' END, "
        f"CASE WHEN {id_col} % 5 = 0 THEN concat(' call 555-', "
        f"lpad(CAST({id_col} % 10000 AS VARCHAR), 4, '0')) ELSE '' END)"
    )
    return spark, duck


def pii_scrub_exprs(col: str) -> dict[str, tuple[str, str]]:
    """Redaction counts + scrubbed text. Group index 0 is passed
    explicitly (Spark's REGEXP_EXTRACT_ALL defaults to group 1)."""
    return {
        "n_emails": (
            f"SIZE(REGEXP_EXTRACT_ALL({col}, '{_EMAIL_PAT_SPARK}', 0))",
            f"len(regexp_extract_all({col}, '{_EMAIL_PAT_DUCK}', 0))",
        ),
        # phones are counted on the email-scrubbed text, so counts always
        # reconcile with the <PHONE> markers in `clean` (a phone-shaped
        # substring inside an email local part is an email, not a phone)
        "n_phones": (
            f"SIZE(REGEXP_EXTRACT_ALL(REGEXP_REPLACE({col}, '{_EMAIL_PAT_SPARK}', "
            f"'<EMAIL>'), '{_PHONE_PAT}', 0))",
            f"len(regexp_extract_all(regexp_replace({col}, '{_EMAIL_PAT_DUCK}', "
            f"'<EMAIL>', 'g'), '{_PHONE_PAT}', 0))",
        ),
        "clean": (
            f"REGEXP_REPLACE(REGEXP_REPLACE({col}, '{_EMAIL_PAT_SPARK}', "
            f"'<EMAIL>'), '{_PHONE_PAT}', '<PHONE>')",
            f"regexp_replace(regexp_replace({col}, '{_EMAIL_PAT_DUCK}', "
            f"'<EMAIL>', 'g'), '{_PHONE_PAT}', '<PHONE>', 'g')",
        ),
    }
