"""BM25F — fielded BM25 over (title, body) with per-field length
normalization (Robertson & Zaragoza's simple-BM25F variant, published
in "Simple BM25 Extension to Multiple Weighted Fields", CIKM 2004).

The reference family scores title and body as SEPARATE signals fused
by hand-tuned weights (engine/ranking.fusion_topk); BM25F is the
principled alternative every fielded search engine also exposes: field
term frequencies are combined into ONE pseudo-frequency BEFORE the
BM25 saturation, so a term hit in a short title is worth more than the
same hit diluted in a long body, and saturation applies once per term
rather than once per field.

Pinned semantics (the DuckDB mirror is the oracle)
---------------------------------------------------
- Fields: ``title`` = the repo's derived title (first TITLE_TOKENS
  stopword-filtered unstemmed tokens of the content — the same field
  engine/ranking.title_terms_df serves); ``body`` = the full
  unstemmed token stream. Title tokens are a prefix of the body
  stream, so document df == body df.
- Per doc and term:
    B_f      = (1 - b) + b * len_f(doc) / avg_len_f       (per field)
    tf̃      = w_title * tf_title / B_title + w_body * tf_body / B_body
    partial  = qtf * idf * min(tf̃, TF_CAP) * (k1 + 1) / (k1 + tf̃)
  with the repo's pinned idf = ln(1 + (N - df + 0.5) / (df + 0.5)),
  k1 = BM25_K1, b = BM25_B shared across fields, w_title = 2.0,
  w_body = 1.0. Zero-token docs count in both field averages (the
  engine's doc-stats convention).
- score = Σ_terms partial; top-k by (score DESC, doc_id ASC);
  ``round_scores`` applies the rounded-sort-key float discipline.

Scale shape
-----------
One tokenize pass feeds body tf / doc_len / df; the title slice is a
second cheap projection of the same pass (array slice + explode of
≤ TITLE_TOKENS elements). Query terms broadcast-join BEFORE the score
math, so only matching postings flow; the two corpus-wide aggregates
(avg body len, avg title len) are 1-row broadcast frames. The whole
plan is the exhaustive-BM25 shape with one extra tiny join — no new
shuffle class, no Python in the hot path.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import BM25_B, BM25_K1, TF_CAP, TITLE_TOKENS
from .tokenizer import tokenize

W_TITLE = 2.0
W_BODY = 1.0


def _title_col(content):
    from .textops import tokens_filtered_col

    return F.slice(tokens_filtered_col(content), 1, TITLE_TOKENS)


def bm25f_topk(
    spark: SparkSession,
    corpus: DataFrame,
    query: str,
    k: int = 10,
    *,
    w_title: float = W_TITLE,
    w_body: float = W_BODY,
    round_scores: int | None = None,
) -> DataFrame:
    """(rank, doc_id, score) — BM25F over (title, body); see module
    docstring for the pinned formula. DuckDB mirror: bm25f_topk_sql."""
    from .build import corpus_stats_df, doc_stats_df, tokens_df
    from .query import idf_col
    from .ranking import _ranked

    qtf = Counter(tokenize(query, use_stem=False))
    if not qtf:
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    qterms = spark.createDataFrame(
        sorted((t, int(c)) for t, c in qtf.items()), "term string, qtf long"
    )

    toks = tokens_df(corpus, use_stem=False).persist()
    # body side: stats + df from the full stream (title ⊆ body prefix,
    # so body df IS document df)
    body_stats = corpus_stats_df(doc_stats_df(corpus, toks))
    hits = toks.join(F.broadcast(qterms), "term")
    dfq = hits.groupBy("term").agg(F.count("*").alias("df"))

    # title side: slice projection of the same tokenize pass
    tl = corpus.select("doc_id", _title_col(F.col("content")).alias("ttoks"))
    tlen = tl.select("doc_id", F.size("ttoks").cast("long").alias("title_len"))
    t_stats = tlen.agg(F.avg("title_len").alias("avg_tlen"))
    ttf = (
        tl.select("doc_id", F.explode("ttoks").alias("term"))
        .join(F.broadcast(qterms.select("term")), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf_title"))
    )

    scored = (
        hits.join(ttf, ["doc_id", "term"], "left")
        .join(tlen, "doc_id")
        .join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(body_stats))
        .crossJoin(F.broadcast(t_stats))
        .select(
            "doc_id",
            (
                F.col("qtf").cast("double")
                * idf_col(
                    F.col("df").cast("double"), F.col("n_docs").cast("double")
                )
                * _sat(
                    F.lit(w_title)
                    * F.coalesce(F.col("tf_title"), F.lit(0)).cast("double")
                    / _bnorm(F.col("title_len"), F.col("avg_tlen"))
                    + F.lit(w_body) * F.col("tf").cast("double")
                    / _bnorm(F.col("doc_len").cast("double"), F.col("avgdl"))
                )
            ).alias("partial"),
        )
    )
    agg = scored.groupBy("doc_id").agg(F.sum("partial").alias("score"))
    if round_scores is not None:
        agg = agg.select("doc_id", F.round("score", round_scores).alias("score"))
    return _ranked(agg, "score", k)


def dismax_topk(
    spark: SparkSession,
    corpus: DataFrame,
    query: str,
    k: int = 10,
    *,
    tie_breaker: float = 0.3,
    most_fields: bool = False,
    round_scores: int | None = None,
) -> DataFrame:
    """Lucene DisjunctionMaxQuery over the (title, body) fields: per
    query term, score the term in EACH field with the field's own BM25
    saturation, take the best field plus ``tie_breaker`` × the other —

        s_title = idf * sat(tf_title / B_title)
        s_body  = idf * sat(tf_body  / B_body)
        term    = qtf * (max(s_title, s_body)
                         + tie_breaker * min(s_title, s_body))

    where sat/B/idf/k1/b/TF_CAP and the field definitions are exactly
    bm25f_topk's (title ⊆ body prefix ⇒ shared document idf). Contrast
    with BM25F, which merges tfs BEFORE saturation; dis_max keeps the
    fields independent and rewards the best one — the standard Lucene
    multi-field front door (``type: best_fields``). Same plan shape as
    bm25f_topk: one tokenize pass, broadcast query join, no new
    shuffle class. DuckDB mirror: dismax_topk_sql."""
    from .build import corpus_stats_df, doc_stats_df, tokens_df
    from .query import idf_col
    from .ranking import _ranked

    qtf = Counter(tokenize(query, use_stem=False))
    if not qtf:
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    qterms = spark.createDataFrame(
        sorted((t, int(c)) for t, c in qtf.items()), "term string, qtf long"
    )

    toks = tokens_df(corpus, use_stem=False).persist()
    body_stats = corpus_stats_df(doc_stats_df(corpus, toks))
    hits = toks.join(F.broadcast(qterms), "term")
    dfq = hits.groupBy("term").agg(F.count("*").alias("df"))

    tl = corpus.select("doc_id", _title_col(F.col("content")).alias("ttoks"))
    tlen = tl.select("doc_id", F.size("ttoks").cast("long").alias("title_len"))
    t_stats = tlen.agg(F.avg("title_len").alias("avg_tlen"))
    ttf = (
        tl.select("doc_id", F.explode("ttoks").alias("term"))
        .join(F.broadcast(qterms.select("term")), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf_title"))
    )

    idf = idf_col(F.col("df").cast("double"), F.col("n_docs").cast("double"))
    s_title = idf * _sat(
        F.coalesce(F.col("tf_title"), F.lit(0)).cast("double")
        / _bnorm(F.col("title_len"), F.col("avg_tlen"))
    )
    s_body = idf * _sat(
        F.col("tf").cast("double")
        / _bnorm(F.col("doc_len").cast("double"), F.col("avgdl"))
    )
    combined = (
        s_title + s_body
        if most_fields
        else F.greatest(s_title, s_body)
        + F.lit(float(tie_breaker)) * F.least(s_title, s_body)
    )
    scored = (
        hits.join(ttf, ["doc_id", "term"], "left")
        .join(tlen, "doc_id")
        .join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(body_stats))
        .crossJoin(F.broadcast(t_stats))
        .select(
            "doc_id",
            (F.col("qtf").cast("double") * combined).alias("partial"),
        )
    )
    agg = scored.groupBy("doc_id").agg(F.sum("partial").alias("score"))
    if round_scores is not None:
        agg = agg.select("doc_id", F.round("score", round_scores).alias("score"))
    return _ranked(agg, "score", k)


def most_fields_topk(
    spark: SparkSession,
    corpus: DataFrame,
    query: str,
    k: int = 10,
    *,
    round_scores: int | None = None,
) -> DataFrame:
    """ES ``multi_match type: most_fields`` over (title, body): the
    per-field BM25 scores SUM instead of dis_max's best-plus-tiebreak —
    the multi-field type that rewards matching in MANY fields. Same
    fields/saturation/idf and plan shape as dismax_topk (this is
    dismax with the combine swapped); completes the multi_match trio:
    best_fields = dismax_topk, cross_fields = bm25f_topk (tfs merged
    BEFORE saturation), most_fields = this. DuckDB mirror:
    most_fields_sql."""
    return dismax_topk(
        spark, corpus, query, k, most_fields=True,
        round_scores=round_scores,
    )


def _bnorm(len_col, avg_col):
    return F.lit(1.0 - BM25_B) + F.lit(BM25_B) * len_col / avg_col


def _sat(tfw):
    tfc = F.least(tfw, F.lit(float(TF_CAP)))
    return tfc * (BM25_K1 + 1.0) / (F.lit(BM25_K1) + tfc)


# ------------------------------------------------------------------ SQL

def bm25f_topk_sql(
    query: str,
    k: int = 10,
    *,
    w_title: float = W_TITLE,
    w_body: float = W_BODY,
    round_scores: int = 6,
) -> str:
    """DuckDB mirror of bm25f_topk over the driver `documents` view."""
    from .phrase import _tokd_cte

    qtf = Counter(tokenize(query, use_stem=False))
    if not qtf:
        return (
            "SELECT 0::INTEGER AS rank, 0::BIGINT AS doc_id, "
            "0::DOUBLE AS score WHERE false"
        )
    rows = ", ".join(
        "('" + t.replace("'", "''") + f"', {c}::BIGINT)"
        for t, c in sorted(qtf.items())
    )
    b, k1, cap = BM25_B, BM25_K1, TF_CAP
    return f"""
WITH {_tokd_cte()},
q(term, qtf) AS (VALUES {rows}),
tfv AS (SELECT doc_id, term, count(*)::BIGINT AS tf
        FROM (SELECT doc_id, unnest(toks) AS term FROM tokd) GROUP BY doc_id, term),
dl AS (SELECT d.doc_id, coalesce(sum(tfv.tf), 0)::BIGINT AS doc_len
       FROM documents d LEFT JOIN tfv USING (doc_id) GROUP BY d.doc_id),
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doc_len)::DOUBLE AS avgdl FROM dl),
dfq AS (SELECT term, count(*)::BIGINT AS df FROM tfv JOIN q USING (term) GROUP BY term),
tl AS (SELECT doc_id, toks[1:{TITLE_TOKENS}] AS ttoks FROM tokd),
tlen AS (SELECT doc_id, len(ttoks)::BIGINT AS title_len FROM tl),
tstats AS (SELECT avg(title_len)::DOUBLE AS avg_tlen FROM tlen),
ttf AS (SELECT doc_id, term, count(*)::BIGINT AS tf_title
        FROM (SELECT doc_id, unnest(ttoks) AS term FROM tl)
        WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term),
scored AS (
  SELECT tfv.doc_id,
         q.qtf * ln(1.0 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
               * least({w_title} * coalesce(ttf.tf_title, 0)
                         / ((1.0 - {b}) + {b} * tlen.title_len / ts.avg_tlen)
                       + {w_body} * tfv.tf
                         / ((1.0 - {b}) + {b} * dl.doc_len / s.avgdl), {cap})
               * ({k1} + 1.0)
               / ({k1} + least({w_title} * coalesce(ttf.tf_title, 0)
                         / ((1.0 - {b}) + {b} * tlen.title_len / ts.avg_tlen)
                       + {w_body} * tfv.tf
                         / ((1.0 - {b}) + {b} * dl.doc_len / s.avgdl), {cap}))
           AS partial
  FROM tfv JOIN q USING (term) JOIN dfq USING (term)
       LEFT JOIN ttf ON tfv.doc_id = ttf.doc_id AND tfv.term = ttf.term
       JOIN tlen ON tfv.doc_id = tlen.doc_id
       JOIN dl ON tfv.doc_id = dl.doc_id
  CROSS JOIN stats s CROSS JOIN tstats ts
),
agg AS (SELECT doc_id, round(sum(partial), {int(round_scores)}) AS score
        FROM scored GROUP BY doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INTEGER AS rank,
       doc_id, score
FROM agg ORDER BY score DESC, doc_id ASC LIMIT {int(k)}
"""


def dismax_topk_sql(
    query: str,
    k: int = 10,
    *,
    tie_breaker: float = 0.3,
    most_fields: bool = False,
    round_scores: int = 6,
) -> str:
    """DuckDB mirror of dismax_topk (and, with ``most_fields=True``,
    of most_fields_topk) over the driver `documents` view."""
    from .phrase import _tokd_cte

    qtf = Counter(tokenize(query, use_stem=False))
    if not qtf:
        return (
            "SELECT 0::INTEGER AS rank, 0::BIGINT AS doc_id, "
            "0::DOUBLE AS score WHERE false"
        )
    rows = ", ".join(
        "('" + t.replace("'", "''") + f"', {c}::BIGINT)"
        for t, c in sorted(qtf.items())
    )
    b, k1, cap, tie = BM25_B, BM25_K1, TF_CAP, float(tie_breaker)
    sat = (
        "least({{tfw}}, {cap}) * ({k1} + 1.0) / ({k1} + least({{tfw}}, {cap}))"
    ).format(cap=cap, k1=k1)
    tfw_t = (
        "(coalesce(ttf.tf_title, 0)::DOUBLE"
        f" / ((1.0 - {b}) + {b} * tlen.title_len / ts.avg_tlen))"
    )
    tfw_b = f"(tfv.tf::DOUBLE / ((1.0 - {b}) + {b} * dl.doc_len / s.avgdl))"
    st = f"(idf * {sat.format(tfw=tfw_t)})"
    sb = f"(idf * {sat.format(tfw=tfw_b)})"
    combined = (
        f"({st} + {sb})" if most_fields
        else f"(greatest({st}, {sb}) + {tie} * least({st}, {sb}))"
    )
    return f"""
WITH {_tokd_cte()},
q(term, qtf) AS (VALUES {rows}),
tfv AS (SELECT doc_id, term, count(*)::BIGINT AS tf
        FROM (SELECT doc_id, unnest(toks) AS term FROM tokd) GROUP BY doc_id, term),
dl AS (SELECT d.doc_id, coalesce(sum(tfv.tf), 0)::BIGINT AS doc_len
       FROM documents d LEFT JOIN tfv USING (doc_id) GROUP BY d.doc_id),
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doc_len)::DOUBLE AS avgdl FROM dl),
dfq AS (SELECT term, count(*)::BIGINT AS df FROM tfv JOIN q USING (term) GROUP BY term),
tl AS (SELECT doc_id, toks[1:{TITLE_TOKENS}] AS ttoks FROM tokd),
tlen AS (SELECT doc_id, len(ttoks)::BIGINT AS title_len FROM tl),
tstats AS (SELECT avg(title_len)::DOUBLE AS avg_tlen FROM tlen),
ttf AS (SELECT doc_id, term, count(*)::BIGINT AS tf_title
        FROM (SELECT doc_id, unnest(ttoks) AS term FROM tl)
        WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term),
scored AS (
  SELECT tfv.doc_id,
         q.qtf * {combined} AS partial
  FROM (SELECT tfv.*, ln(1.0 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) AS idf
        FROM tfv JOIN dfq USING (term) CROSS JOIN stats s) tfv
  JOIN q USING (term)
  LEFT JOIN ttf ON tfv.doc_id = ttf.doc_id AND tfv.term = ttf.term
  JOIN tlen ON tfv.doc_id = tlen.doc_id
  JOIN dl ON tfv.doc_id = dl.doc_id
  CROSS JOIN stats s CROSS JOIN tstats ts
),
agg AS (SELECT doc_id, round(sum(partial), {int(round_scores)}) AS score
        FROM scored GROUP BY doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INTEGER AS rank,
       doc_id, score
FROM agg ORDER BY score DESC, doc_id ASC LIMIT {int(k)}
"""


def most_fields_sql(query: str, k: int = 10, *, round_scores: int = 6) -> str:
    """DuckDB mirror of most_fields_topk."""
    return dismax_topk_sql(
        query, k, most_fields=True, round_scores=round_scores
    )
