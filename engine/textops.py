"""Text-analysis operators for a training-data pipeline: token stats,
language-ID heuristic, quality scoring, document fingerprinting.

These are JVM-side (whole-stage-codegen) implementations over the SAME
token regex as the engine tokenizer: Java regex, RE2 (DuckDB) and
Python ``re.ASCII`` agree byte-for-byte on the pattern (verified in
tests/test_sql_parity.py), so each operator ships an exact DuckDB
oracle. The BM25 build keeps its pandas-UDF tokenizer (stemming +
BASELINE.json:15's Arrow-UDF mandate); here the hot path stays inside
codegen because no stemming is needed — at 100 TB these scans are
bottlenecked by tokenization throughput.

All formulas are pinned here and mirrored 1:1 in the SQL strings
(engine/driver_queries.py); floats are rounded before comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .stopwords import ALL_STOPWORDS, stopwords_sql_list
from .tokenizer import TOKEN_PATTERN

ROUND = 6

# tiny vendored function-word lists for the language-ID heuristic
LANG_WORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "it", "you", "that", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ich", "mit", "ein", "zu"],
    "es": ["el", "los", "que", "es", "por", "con", "para", "una", "del", "las"],
    "fr": ["le", "les", "et", "est", "pas", "pour", "que", "dans", "une", "sur"],
}
# deterministic tie priority (first wins ties)
LANG_PRIORITY = ["en", "de", "es", "fr"]

FP_MOD = 2_147_483_647  # 2^31-1: keeps acc*31+x inside int64 (ANSI-safe)
FP_MULT = 31


def tokens_all_col(content: Column) -> Column:
    """Ordered regex tokens, NO stopword removal (array<string>)."""
    return F.regexp_extract_all(F.lower(content), F.lit(TOKEN_PATTERN), 0)


def tokens_filtered_col(content: Column) -> Column:
    """Ordered regex tokens minus stopwords (order-preserving).

    isin over >10 literals compiles to Catalyst InSet (hash lookup);
    array_contains against the ~200-word stopword array would be a
    linear scan PER TOKEN (measured: 158 s vs ~8 s for the title-terms
    stage over 1.2 M docs at local[4])."""
    return F.filter(
        tokens_all_col(content), lambda t: ~t.isin(*sorted(ALL_STOPWORDS))
    )


def with_array_barrier(df: DataFrame, expr: Column, out: str) -> DataFrame:
    """Materialize an array expression as a bound column behind a
    Generate barrier: ``explode(array(expr))`` emits exactly one row
    per input row, and Catalyst's CollapseProject cannot merge a
    Project across a Generate node.

    Why this exists: a higher-order lambda that references ``expr``
    per element — ``transform(sequence(...), i -> element_at(t, i))``
    or ``slice(t, i, n)`` — gets ``expr`` RE-INLINED at every
    reference once CollapseProject folds the defining Project into
    the consumer. With ``t = regexp_extract_all(...)`` that means one
    full re-tokenization per gram/pair: the bigram pair stream over
    20k synthetic docs (4.1M pairs, local[8]) measured 80.1 s inlined
    vs 0.7 s behind this barrier; the 13-gram stream 38.5 s vs ~1 s.
    Subexpression elimination does not save it because higher-order
    functions are evaluated outside whole-stage codegen."""
    return df.select("*", F.explode(F.array(expr)).alias(out))


def pairs_from_tokens(t: Column) -> Column:
    """array<struct<w1,w2>> of ADJACENT ordered token pairs from a
    BOUND token-array column (empty below 2 tokens). zip-of-slices,
    not per-pair element_at: references ``t`` O(1) times per doc, so
    it is safe even without with_array_barrier (and fastest with it)."""
    return F.when(
        F.size(t) >= 2,
        F.arrays_zip(
            F.slice(t, 1, F.size(t) - 1).alias("w1"),
            F.slice(t, 2, F.size(t) - 1).alias("w2"),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def term_hash_col(term: Column) -> Column:
    """60-bit deterministic term hash: int(md5(term)[:15], 16) — the
    cross-engine hash shared with DuckDB (engine/driver_queries.py)."""
    return F.conv(F.substring(F.md5(term), 1, 15), 16, 10).cast("long")


def term_hash_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::bigint)"


def token_stats(corpus: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_unique, n_stop, avg_token_len) per doc —
    zero-token docs included with zeros/nulls→0."""
    stop = F.lit(sorted(ALL_STOPWORDS))
    toks = corpus.select(
        "doc_id", F.explode_outer(tokens_all_col(F.col("content"))).alias("term")
    )
    return toks.groupBy("doc_id").agg(
        F.count("term").alias("n_tokens"),
        F.count_distinct("term").alias("n_unique"),
        F.coalesce(
            F.sum(F.when(F.array_contains(stop, F.col("term")), 1).otherwise(0)),
            F.lit(0),
        ).alias("n_stop"),
        F.round(F.coalesce(F.avg(F.length("term")), F.lit(0.0)), 4).alias(
            "avg_token_len"
        ),
    )


def lang_profile(corpus: DataFrame) -> DataFrame:
    """(doc_id, en_hits, de_hits, es_hits, fr_hits, lang_pred) — n-gram
    (function-word) heuristic language ID."""
    toks = corpus.select(
        "doc_id", F.explode_outer(tokens_all_col(F.col("content"))).alias("term")
    )
    aggs = [
        F.coalesce(
            F.sum(F.when(F.array_contains(F.lit(LANG_WORDS[lang]), F.col("term")), 1).otherwise(0)),
            F.lit(0),
        ).alias(f"{lang}_hits")
        for lang in LANG_PRIORITY
    ]
    hits = toks.groupBy("doc_id").agg(*aggs)
    en, de, es, fr = (F.col(f"{lang}_hits") for lang in LANG_PRIORITY)
    pred = (
        F.when((en >= de) & (en >= es) & (en >= fr), "en")
        .when((de >= es) & (de >= fr), "de")
        .when(es >= fr, "es")
        .otherwise("fr")
    )
    return hits.withColumn("lang_pred", pred)


def quality_score(corpus: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, stop_ratio, quality) — pinned formula:
    quality = round(least(n_tokens,200)/200 * (1 - |stop_ratio - 0.4|), 6)
    (length credit saturating at 200 tokens × closeness of the stopword
    ratio to a natural-text 0.4)."""
    st = token_stats(corpus)
    ratio = F.when(
        F.col("n_tokens") > 0, F.col("n_stop") / F.col("n_tokens")
    ).otherwise(F.lit(0.0))
    q = (F.least(F.col("n_tokens"), F.lit(200)) / 200.0) * (
        1.0 - F.abs(ratio - 0.4)
    )
    return st.select(
        "doc_id",
        "n_tokens",
        F.round(ratio, ROUND).alias("stop_ratio"),
        F.round(q, ROUND).alias("quality"),
    )


# GPT-2-style byte-pair pre-tokenizer shape: contraction suffixes,
# space-prefixed letter/digit runs, punct runs, leftover whitespace.
# Verified byte-identical between Java regex and RE2 on the corpus
# alphabet (tests/test_textops_budget.py); Unicode category tables
# can differ between engines at exotic codepoints, so the ASCII punct
# class is pinned explicitly.
BPE_PIECE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\sA-Za-z0-9]+|\s+"


def token_budget(corpus: DataFrame) -> DataFrame:
    """(doc_id, n_ws, n_bpe, n_words) — the three token-count bases a
    training pipeline budgets with: whitespace fields, GPT-2-ish BPE
    pre-tokenizer pieces (whitespace-only pieces excluded — they carry
    no token cost), and the engine's word-regex tokens. Pure
    projection, zero shuffle; chunk_plan budgets in engine tokens,
    this operator is the conversion table."""
    c = F.coalesce(F.col("content"), F.lit(""))
    trimmed = F.trim(c)
    n_ws = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    pieces = F.regexp_extract_all(c, F.lit(BPE_PIECE_RE), 0)
    n_bpe = F.size(F.filter(pieces, lambda x: F.trim(x) != ""))
    return corpus.select(
        "doc_id",
        n_ws.cast("long").alias("n_ws"),
        n_bpe.cast("long").alias("n_bpe"),
        F.size(tokens_all_col(c)).cast("long").alias("n_words"),
    )


def token_budget_sql() -> str:
    """DuckDB mirror of token_budget over the driver ``documents``."""
    pat = BPE_PIECE_RE.replace("'", "''")
    return f"""
WITH c AS (SELECT doc_id, coalesce(text, '') AS content FROM documents)
SELECT doc_id,
       (CASE WHEN len(trim(content)) = 0 THEN 0
             ELSE len(regexp_split_to_array(trim(content), '\\s+'))
        END)::BIGINT AS n_ws,
       len(list_filter(regexp_extract_all(content, '{pat}'),
                       x -> trim(x) <> ''))::BIGINT AS n_bpe,
       len(regexp_extract_all(lower(content), '{_re2_pat()}'))::BIGINT
         AS n_words
FROM c
"""


def _re2_pat() -> str:
    from .tokenizer import TOKEN_PATTERN_RE2

    return TOKEN_PATTERN_RE2.replace("'", "''")


DUP_LINE_MAX = 0.3      # Gopher: drop when >30% of lines are repeats
TOP_2GRAM_MAX = 0.2     # Gopher: drop when the top 2-gram covers >20%


def gopher_repetition(corpus: DataFrame) -> DataFrame:
    """(doc_id, n_lines, dup_line_frac, top_2gram_frac, gopher_pass) —
    the Gopher/MassiveText repetition quality rules, pinned as:

    - dup_line_frac: fraction of non-empty lines (whitespace-trimmed
      before comparison) that repeat an earlier line —
      (n_lines − n_distinct)/n_lines, 0 for line-less docs;
    - top_2gram_frac: tokens covered by the MOST FREQUENT token 2-gram
      — 2·max_count/n_tokens over the unfiltered token stream, 0 when
      n_tokens < 2;
    - gopher_pass: both fractions (ROUNDED, so the boundary compare is
      cross-engine-stable) within the published Gopher thresholds
      (0.3 / 0.2).

    Scale shape: line metrics are a pure projection (split + distinct
    inside the row); the 2-gram mode is explode → map-side-combined
    count per (doc, gram) → per-doc max — the same one-shuffle-class
    gram-level exchange as tokenize→tf, linear in corpus tokens (the
    per-row O(G²) array-mode alternative dies on 10k-token docs).
    DuckDB mirror: gopher_repetition_sql."""
    # token array behind a Generate barrier: the 2-gram kernel below
    # would otherwise re-tokenize per element once CollapseProject
    # inlines the regexp (with_array_barrier has the measured numbers)
    bar = with_array_barrier(
        corpus.select("doc_id", "content"),
        tokens_all_col(F.col("content")),
        "_t",
    )
    toks = F.col("_t")
    # single-arg lambda, NOT bare F.trim: transform() feeds (element,
    # index) to two-parameter callables, silently binding trim's
    # trimStr overload to the index
    lines = F.filter(
        F.transform(F.split(F.col("content"), "\n"), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )
    base = bar.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(F.array_distinct(lines)).cast("long").alias("n_distinct"),
        F.when(
            F.size(toks) >= 2,
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("grams"),
    )
    top = (
        base.select("doc_id", F.explode("grams").alias("g"))
        .groupBy("doc_id", "g")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("maxc"))
    )
    dup = F.when(
        F.col("n_lines") > 0,
        (F.col("n_lines") - F.col("n_distinct"))
        / F.col("n_lines").cast("double"),
    ).otherwise(F.lit(0.0))
    tg = F.when(
        F.col("n_tokens") >= 2,
        F.coalesce(F.col("maxc"), F.lit(0)).cast("double") * 2.0
        / F.col("n_tokens").cast("double"),
    ).otherwise(F.lit(0.0))
    out = base.join(top, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.round(dup, ROUND).alias("dup_line_frac"),
        F.round(tg, ROUND).alias("top_2gram_frac"),
    )
    return out.withColumn(
        "gopher_pass",
        (F.col("dup_line_frac") <= DUP_LINE_MAX)
        & (F.col("top_2gram_frac") <= TOP_2GRAM_MAX),
    )


def doc_fingerprint(corpus: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) — rolling polynomial hash over the ordered
    token sequence: fold(acc*31 + md5hash(term) % p) % p, p=2^31-1.
    Order-sensitive (unlike a bag-of-words hash) → detects reorderings."""
    hashes = F.transform(
        tokens_all_col(F.col("content")), lambda t: term_hash_col(t) % FP_MOD
    )
    fp = F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FP_MULT + x) % FP_MOD,
    )
    return corpus.select("doc_id", fp.alias("fingerprint"))


# ------------------------------------------------------------------ SQL

def _tok_all_cte() -> str:
    pat = TOKEN_PATTERN.replace("'", "''")
    return (
        "tok_all AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
        f"'{pat}')) AS term FROM documents)"
    )


def token_stats_sql() -> str:
    stop = stopwords_sql_list()
    return f"""
WITH {_tok_all_cte()}
SELECT d.doc_id,
       count(t.term)::BIGINT AS n_tokens,
       count(DISTINCT t.term)::BIGINT AS n_unique,
       coalesce(sum(CASE WHEN t.term IN {stop} THEN 1 ELSE 0 END), 0)::BIGINT AS n_stop,
       round(coalesce(avg(length(t.term)), 0.0), 4) AS avg_token_len
FROM documents d LEFT JOIN tok_all t USING (doc_id)
GROUP BY d.doc_id
"""


def lang_profile_sql() -> str:
    cols = []
    for lang in LANG_PRIORITY:
        words = ", ".join(f"'{w}'" for w in LANG_WORDS[lang])
        cols.append(
            f"coalesce(sum(CASE WHEN t.term IN ({words}) THEN 1 ELSE 0 END), 0)"
            f"::BIGINT AS {lang}_hits"
        )
    return f"""
WITH {_tok_all_cte()},
hits AS (
  SELECT d.doc_id, {', '.join(cols)}
  FROM documents d LEFT JOIN tok_all t USING (doc_id)
  GROUP BY d.doc_id
)
SELECT *, CASE
  WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
  WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
  WHEN es_hits >= fr_hits THEN 'es'
  ELSE 'fr' END AS lang_pred
FROM hits
"""


def quality_score_sql() -> str:
    stop = stopwords_sql_list()
    return f"""
WITH {_tok_all_cte()},
st AS (
  SELECT d.doc_id,
         count(t.term)::BIGINT AS n_tokens,
         coalesce(sum(CASE WHEN t.term IN {stop} THEN 1 ELSE 0 END), 0)::BIGINT AS n_stop
  FROM documents d LEFT JOIN tok_all t USING (doc_id)
  GROUP BY d.doc_id
)
SELECT doc_id, n_tokens,
       round(CASE WHEN n_tokens > 0 THEN n_stop / n_tokens::DOUBLE ELSE 0.0 END, {ROUND}) AS stop_ratio,
       round((least(n_tokens, 200) / 200.0)
             * (1.0 - abs(CASE WHEN n_tokens > 0 THEN n_stop / n_tokens::DOUBLE ELSE 0.0 END - 0.4)),
             {ROUND}) AS quality
FROM st
"""


def gopher_repetition_sql() -> str:
    """DuckDB mirror of gopher_repetition over the driver `documents`
    view — same rounded-fraction flags (lead() window for the 2-grams,
    list ops for the trimmed-line distinct)."""
    pat = TOKEN_PATTERN.replace("'", "''")
    return f"""
WITH tk AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{pat}') AS toks,
         list_filter(list_transform(string_split(text, chr(10)),
                                    l -> trim(l)),
                     s -> len(s) > 0) AS lines
  FROM documents
),
tokp AS (SELECT doc_id, unnest(toks) AS term,
                generate_subscripts(toks, 1) AS pos
         FROM tk),
g AS (SELECT doc_id,
             term || ' ' || lead(term) OVER (PARTITION BY doc_id
                                             ORDER BY pos) AS gram
      FROM tokp QUALIFY gram IS NOT NULL),
gc AS (SELECT doc_id, gram, count(*)::BIGINT AS c FROM g GROUP BY doc_id, gram),
topg AS (SELECT doc_id, max(c)::BIGINT AS maxc FROM gc GROUP BY doc_id),
base AS (
  SELECT tk.doc_id, len(tk.toks)::BIGINT AS n_tokens,
         len(tk.lines)::BIGINT AS n_lines,
         len(list_distinct(tk.lines))::BIGINT AS n_distinct, t.maxc
  FROM tk LEFT JOIN topg t USING (doc_id)
),
r AS (
  SELECT doc_id, n_lines,
         round(CASE WHEN n_lines > 0
               THEN (n_lines - n_distinct) / n_lines::DOUBLE
               ELSE 0.0 END, {ROUND}) AS dup_line_frac,
         round(CASE WHEN n_tokens >= 2
               THEN coalesce(maxc, 0) * 2.0 / n_tokens::DOUBLE
               ELSE 0.0 END, {ROUND}) AS top_2gram_frac
  FROM base
)
SELECT doc_id, n_lines, dup_line_frac, top_2gram_frac,
       (dup_line_frac <= {DUP_LINE_MAX} AND top_2gram_frac <= {TOP_2GRAM_MAX})
         AS gopher_pass
FROM r
"""


def doc_fingerprint_sql() -> str:
    pat = TOKEN_PATTERN.replace("'", "''")
    h = term_hash_sql("t")
    return f"""
SELECT doc_id,
  CASE WHEN len(regexp_extract_all(lower(text), '{pat}')) = 0 THEN 0::BIGINT
  ELSE list_reduce(
    list_prepend(0::BIGINT,
      list_transform(regexp_extract_all(lower(text), '{pat}'),
                     t -> {h} % {FP_MOD})),
    (acc, x) -> (acc * {FP_MULT} + x) % {FP_MOD})
  END AS fingerprint
FROM documents
"""
