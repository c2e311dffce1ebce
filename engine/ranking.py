"""The reference frontend's non-BM25 ranking surfaces, Spark-first.

The reference family (SURVEY.md §2.6 Q3/Q4, §2.4 J4, §2.9 — public
knowledge; /root/reference was empty, see SURVEY.md §0) serves four
more query endpoints besides BM25: tf-idf cosine body search
(`/search_body`), binary title/anchor match (`/search_title`,
`/search_anchor`), weighted multi-signal fusion (`/search`), and
PageRank scores (`/get_pagerank`). This module re-expresses each as a
declarative DataFrame plan with a pinned, DuckDB-mirrorable semantics
so a reference user can run every query they run today.

Pinned semantics (SURVEY.md §5.3 discipline — the empty reference
forces us to freeze them here; each is mirrored 1:1 in the *_sql()
strings):

- tf-idf weight  w(t,d) = (1 + log10(tf)) * log10(N / df)
  query weight   w(t,q) = (1 + log10(qtf)) * log10(N / df)
  cosine(d,q)    = Σ_t w(t,d)·w(t,q) / (||d|| · ||q||)
  with FULL-document norms ||d|| (precomputed over all terms, as the
  reference precomputes doc norms) and ||q|| over dictionary-matched
  query terms only (unknown terms have no df).
- title field   = first TITLE_TOKENS stopword-filtered tokens of the
  content (the driver `documents` table has no title column; the
  prefix is the deterministic title analog — for the code-corpus
  schema the natural field would be `path`).
  title score   = count of DISTINCT query terms in the title field.
- fusion score  = 0.6 · bm25/max_bm25 + 0.4 · title_hits/|q_terms|
  (max-normalized signals, full-outer-joined per doc, missing → 0).
- PageRank: damping 0.85, PR_ITERS fixed iterations from uniform
  1/N, over the deterministic 2-regular demo graph
  rank(u) → (2·rank(u)+1) mod N and (3·rank(u)+2) mod N
  (dense-rank based; every node has out-degree 2, so no dangling
  mass). At 10^12-doc scale the dense rank would be replaced by the
  corpus link table itself — the iteration body (join + groupBy-sum
  per step) is the part that carries over.

All scores are rounded to ROUND decimals and the rounded value is the
sort key on both engines (see engine/driver_queries.py float
discipline). Scale notes: every join against query-derived frames is
a broadcast; the only wide exchanges are the per-doc aggregations,
which shuffle on doc_id exactly once per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .build import corpus_stats_df, dictionary_df, doc_stats_df, tokens_df
from .query import query_terms_df
from .stopwords import ALL_STOPWORDS
from .textops import ROUND, tokens_filtered_col
from .tokenizer import TOKEN_PATTERN

from . import TITLE_TOKENS  # noqa: E402  (pinned in engine/__init__)

FUSE_W_BODY = 0.6
FUSE_W_TITLE = 0.4
PR_DAMP = 0.85
PR_ITERS = 5


def _ranked(df: DataFrame, score: str, k: int) -> DataFrame:
    """desc-score / asc-doc_id top-k with a rank column; the global
    window runs AFTER limit(k) so it only ever sees k rows."""
    topk = df.orderBy(F.desc(score), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc(score), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", score
    )


def _ranked_asc(df: DataFrame, score: str, k: int) -> DataFrame:
    """asc-score / asc-doc_id top-k (smaller is better — e.g. proximity
    min-span); same limit-before-window discipline as _ranked."""
    topk = df.orderBy(F.asc(score), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.asc(score), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", score
    )


# ------------------------------------------------- tf-idf cosine (Q3)

def tfidf_cosine_topk(
    spark: SparkSession,
    corpus: DataFrame,
    query: str,
    k: int = 10,
    *,
    use_stem: bool = False,
) -> DataFrame:
    """(rank, doc_id, cos) — reference `/search_body` analog."""
    # toks feeds the dictionary, the corpus stats AND the weight frame —
    # persisted so the corpus tokenizes once per query, not once per
    # consumer. Round-4 re-A/B (interleaved, same session, 3 reps):
    # persist 2.56 s vs lazy-checkpointed weights 2.86 s vs nothing
    # 2.24 s at sf0.1 — the unmaterialized shape wins only because
    # re-tokenizing 5k docs is launch-bound cheap; at scale it pays
    # the corpus scan per consumer, so persist is the pinned shape
    # (the indexed twin IndexReader.tfidf_topk is the serving path).
    toks = tokens_df(corpus, use_stem=use_stem).persist()
    d = dictionary_df(toks)
    n_docs = corpus_stats_df(doc_stats_df(corpus, toks)).select("n_docs")
    qterms = query_terms_df(spark, query, use_stem=use_stem)

    from . import TF_CAP

    # tf capped at TF_CAP — matches the posting-block bound so the
    # index-backed serving path (IndexReader.tfidf_topk) agrees exactly
    wtd = (1.0 + F.log10(F.least(F.col("tf"), F.lit(TF_CAP)))) * F.log10(
        F.col("n_docs") / F.col("df")
    )
    weights = (
        toks.join(F.broadcast(d.select("term", "df")), "term")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "term", wtd.alias("w"))
    )
    norms = weights.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("dnorm")
    )
    qw = (
        qterms.join(d.select("term", "df"), "term")
        .crossJoin(n_docs)
        .select(
            "term",
            ((1.0 + F.log10("qtf")) * F.log10(F.col("n_docs") / F.col("df"))).alias("qw"),
        )
    )
    qnorm = qw.agg(F.sqrt(F.sum(F.col("qw") * F.col("qw"))).alias("qnorm"))
    scored = (
        weights.join(F.broadcast(qw), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
        .join(norms, "doc_id")
        .crossJoin(F.broadcast(qnorm))
        .select(
            "doc_id",
            F.round(
                F.when(
                    (F.col("dnorm") > 0) & (F.col("qnorm") > 0),
                    F.col("dot") / (F.col("dnorm") * F.col("qnorm")),
                ).otherwise(0.0),
                ROUND,
            ).alias("cos"),
        )
        .where(F.col("cos") > 0)
    )
    ranked = _ranked(scored, "cos", k)
    # materialize the k-row result, then UNPERSIST toks: returning the
    # lazy frame would leak one cached DataFrame per query in a
    # long-lived serving process (executor storage accumulates until
    # the ContextCleaner happens to GC it — round-4 ADVICE). The k-row
    # collect is the repo's documented driver-side cut size.
    rows = ranked.collect()
    toks.unpersist()
    return spark.createDataFrame(rows, ranked.schema)


# --------------------------------------------- binary title match (Q4)

def title_terms_df(corpus: DataFrame) -> DataFrame:
    """(doc_id, term) DISTINCT terms of the title field (first
    TITLE_TOKENS filtered tokens)."""
    title = F.slice(tokens_filtered_col(F.col("content")), 1, TITLE_TOKENS)
    return (
        corpus.select("doc_id", F.explode(title).alias("term")).distinct()
    )


def title_match_topk(
    spark: SparkSession, corpus: DataFrame, query: str, k: int = 100
) -> DataFrame:
    """(rank, doc_id, n_hits) — reference `/search_title` analog:
    docs ranked by count of distinct query terms in the title field."""
    qterms = query_terms_df(spark, query, use_stem=False).select("term").distinct()
    hits = (
        title_terms_df(corpus)
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return _ranked(hits, "n_hits", k)


# ------------------------------------------- anchor-text match (Q4 anchor)

def _anchor_from_title_arrays(
    spark: SparkSession, title_arrays: DataFrame, ranked: DataFrame, n: int
) -> DataFrame:
    """(doc_id, term) anchor table from (doc_id, title_terms ARRAY) rows
    and a (doc_id, r) rank map. The graph's destinations are FUNCTIONS
    of the source rank ((2r+1)%N, (3r+2)%N), so each doc's title ARRAY
    ships straight to its two destination ranks — 2 compact rows per
    doc through the shuffle instead of 2×|title| exploded rows, deduped
    per destination with array_distinct(flatten(...)) (in-degree is 2,
    so the per-group flatten is tiny). The naive 3-join + 28 M-row
    distinct shape cost 32 s at 1.2 M docs / 4 cores and scaled 1.3×."""
    if n == 0:
        return spark.createDataFrame([], "doc_id long, term string")
    src = title_arrays.join(ranked, "doc_id").select("r", "title_terms")
    dsts = F.array((F.col("r") * 2 + 1) % n, (F.col("r") * 3 + 2) % n)
    per_dst = src.select(F.explode(dsts).alias("dst_r"), "title_terms")
    agg = per_dst.groupBy("dst_r").agg(
        F.array_distinct(F.flatten(F.collect_list("title_terms"))).alias("terms")
    )
    return (
        agg.join(ranked.select(F.col("r").alias("dst_r"), "doc_id"), "dst_r")
        .select("doc_id", F.explode("terms").alias("term"))
    )


def _anchor_terms_from_titles(
    spark: SparkSession, title_terms: DataFrame, ranked: DataFrame, n: int
) -> DataFrame:
    """Same output from an EXPLODED (doc_id, term) title table (used
    when the array-form checkpoint is unavailable, e.g. segment merge):
    collapse to arrays first, then the array path."""
    arrays = title_terms.groupBy("doc_id").agg(
        F.collect_list("term").alias("title_terms")
    )
    return _anchor_from_title_arrays(spark, arrays, ranked, n)


def anchor_terms_df(corpus: DataFrame) -> DataFrame:
    """(doc_id, term): DISTINCT anchor terms of each doc — the terms of
    pages LINKING TO it. The reference scores `/search_anchor` over the
    anchor text of inbound links [REF? H]; the driver corpus has no
    link/anchor data, so the pinned analog uses the same deterministic
    demo graph as PageRank (rank r links to (2r+1)%N and (3r+2)%N) with
    each link's anchor text = the SOURCE page's title field."""
    ranked = _dense_rank_by_doc_id(corpus)
    n = ranked.count()
    title_arrays = corpus.select(
        "doc_id",
        F.slice(tokens_filtered_col(F.col("content")), 1, TITLE_TOKENS).alias(
            "title_terms"
        ),
    )
    return _anchor_from_title_arrays(
        corpus.sparkSession, title_arrays, ranked, n
    )


def anchor_match_topk(
    spark: SparkSession, corpus: DataFrame, query: str, k: int = 100
) -> DataFrame:
    """(rank, doc_id, n_hits) — `/search_anchor`: docs ranked by count
    of distinct query terms in their inbound-link anchor text."""
    qterms = query_terms_df(spark, query, use_stem=False).select("term").distinct()
    hits = (
        anchor_terms_df(corpus)
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return _ranked(hits, "n_hits", k)


# ----------------------------------------------------- score fusion (J4)

def _fusion_signals(
    spark: SparkSession, corpus: DataFrame, query: str
) -> tuple[DataFrame | None, DataFrame | None, int]:
    """(body_n, title, n_q) — the two per-doc fusion signals from ONE
    cached tokenize pass: doc_tokens_df's array checkpoint shape carries
    both the (term, tf) stream (body BM25) and the title arrays, so the
    corpus is tokenized once per query instead of once per signal
    (VERDICT r2 #9 — body and title each re-tokenized before)."""
    from .build import doc_tokens_df, explode_doc_tokens
    from .query import bm25_scored_terms

    qterms = query_terms_df(spark, query, use_stem=False)
    n_q = qterms.count()
    if n_q == 0:
        return None, None, 0

    arr = doc_tokens_df(corpus, use_stem=False).persist()
    toks = explode_doc_tokens(arr)
    body = (
        bm25_scored_terms(corpus, qterms, use_stem=False, tokens=toks)
        .groupBy("doc_id")
        .agg(F.sum("partial_score").alias("bm25"))
        # consumed twice (max-norm agg + normalized join); the lazy
        # checkpoint materializes (doc_id, bm25) once instead of
        # re-running the scored-terms agg per consumer — a
        # materialization boundary, values untouched
        .localCheckpoint(eager=False)
    )
    body_max = body.agg(F.max("bm25").alias("max_bm25"))
    body_n = body.crossJoin(F.broadcast(body_max)).select(
        "doc_id", (F.col("bm25") / F.col("max_bm25")).alias("body_score")
    )
    title = (
        arr.select("doc_id", F.explode("title_terms").alias("term"))
        .distinct()
        .join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id")
        .agg((F.count("*") / F.lit(float(n_q))).alias("title_score"))
    )
    return body_n, title, n_q


def fusion_topk(
    spark: SparkSession, corpus: DataFrame, query: str, k: int = 10
) -> DataFrame:
    """(rank, doc_id, score) — reference `/search` analog: weighted sum
    of max-normalized BM25 body score and title hit-ratio."""
    body_n, title, n_q = _fusion_signals(spark, corpus, query)
    if n_q == 0:
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    fused = (
        body_n.join(title, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                FUSE_W_BODY * F.coalesce("body_score", F.lit(0.0))
                + FUSE_W_TITLE * F.coalesce("title_score", F.lit(0.0)),
                ROUND,
            ).alias("score"),
        )
    )
    return _ranked(fused, "score", k)


FUSE3_W_BODY = 0.5
FUSE3_W_TITLE = 0.3
FUSE3_W_PR = 0.2


def fusion_pr_topk(
    spark: SparkSession, corpus: DataFrame, query: str, k: int = 10
) -> DataFrame:
    """(rank, doc_id, score) — `/search` with the PageRank signal fused
    in (the reference family hand-tunes BM25 + title + PageRank weights
    [REF? M], SURVEY.md §2.4 J4). Pinned formula:

      score = 0.5·bm25/max_bm25 + 0.3·title_hits/|q| + 0.2·pr/max_pr

    Candidates are docs with a body OR title match (PageRank alone
    never surfaces a doc — it is a quality prior, not a retrieval
    signal); pr is LEFT-joined onto the candidate set."""
    body_n, title, n_q = _fusion_signals(spark, corpus, query)
    if n_q == 0:
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    pr = pagerank(corpus)
    pr_max = pr.agg(F.max("pr").alias("max_pr"))
    pr_n = pr.crossJoin(F.broadcast(pr_max)).select(
        "doc_id", (F.col("pr") / F.col("max_pr")).alias("pr_score")
    )
    fused = (
        body_n.join(title, "doc_id", "full_outer")
        .join(pr_n, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                FUSE3_W_BODY * F.coalesce("body_score", F.lit(0.0))
                + FUSE3_W_TITLE * F.coalesce("title_score", F.lit(0.0))
                + FUSE3_W_PR * F.coalesce("pr_score", F.lit(0.0)),
                ROUND,
            ).alias("score"),
        )
    )
    return _ranked(fused, "score", k)


FUSE4_W_BODY = 0.45
FUSE4_W_TITLE = 0.25
FUSE4_W_PR = 0.15
FUSE4_W_PV = 0.15


def fusion_pv_topk(
    spark: SparkSession, corpus: DataFrame, query: str, k: int = 10
) -> DataFrame:
    """(rank, doc_id, score) — the FULL reference `/search` signal set
    (SURVEY.md §2.4 J4: BM25 body + title + PageRank + pageviews).
    Pinned formula:

      score = 0.45·bm25/max + 0.25·title_hits/|q|
            + 0.15·pr/max_pr + 0.15·ln(1+views)/ln(1+max_views)

    Candidates are body OR title matches; PageRank and pageviews are
    LEFT-joined quality priors (they never surface a doc alone). The
    pageview signal is the deterministic synthetic table
    (engine/pageviews.py — the sandbox has no real pageview data)."""
    from .pageviews import synthetic_pageviews

    body_n, title, n_q = _fusion_signals(spark, corpus, query)
    if n_q == 0:
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    pr = pagerank(corpus)
    pr_max = pr.agg(F.max("pr").alias("max_pr"))
    pr_n = pr.crossJoin(F.broadcast(pr_max)).select(
        "doc_id", (F.col("pr") / F.col("max_pr")).alias("pr_score")
    )
    pv = synthetic_pageviews(corpus)
    pv_max = pv.agg(F.max("views").alias("max_views"))
    pv_n = pv.crossJoin(F.broadcast(pv_max)).select(
        "doc_id",
        (
            F.log(F.lit(1.0) + F.col("views"))
            / F.log(F.lit(1.0) + F.col("max_views"))
        ).alias("pv_score"),
    )
    fused = (
        body_n.join(title, "doc_id", "full_outer")
        .join(pr_n, "doc_id", "left")
        .join(pv_n, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                FUSE4_W_BODY * F.coalesce("body_score", F.lit(0.0))
                + FUSE4_W_TITLE * F.coalesce("title_score", F.lit(0.0))
                + FUSE4_W_PR * F.coalesce("pr_score", F.lit(0.0))
                + FUSE4_W_PV * F.coalesce("pv_score", F.lit(0.0)),
                ROUND,
            ).alias("score"),
        )
    )
    return _ranked(fused, "score", k)


# ----------------------------------------------------------- PageRank

def _dense_rank_by_doc_id(corpus: DataFrame) -> DataFrame:
    """(doc_id, r) with r = 0-based global rank by doc_id — WITHOUT a
    single-partition Window (a global `row_number()` moves every row to
    one task). Range-repartition + local sort gives a globally sorted
    RDD; zipWithIndex then assigns contiguous indices with one extra
    count job. Scales to any table size."""
    spark = corpus.sparkSession
    p = max(2, spark.sparkContext.defaultParallelism)
    ordered = (
        corpus.select("doc_id").repartitionByRange(p, "doc_id")
        .sortWithinPartitions("doc_id")
    )
    rdd = ordered.rdd.map(lambda row: row[0]).zipWithIndex()
    return spark.createDataFrame(rdd, "doc_id long, r long")


def pagerank(corpus: DataFrame, *, iters: int = PR_ITERS) -> DataFrame:
    """(doc_id, pr) — fixed-iteration PageRank over the deterministic
    demo graph (module docstring). The iteration body — contributions =
    pr/outdeg joined to edges, grouped by destination — is the
    production shape; only the edge derivation is demo-specific."""
    ranked = _dense_rank_by_doc_id(corpus)
    n_row = ranked.agg(F.count("*").alias("n")).collect()[0]
    n = int(n_row["n"])
    if n == 0:
        return ranked.select("doc_id", F.lit(0.0).alias("pr"))

    dst1 = (F.col("r") * 2 + 1) % n
    dst2 = (F.col("r") * 3 + 2) % n
    edges = (
        ranked.select(F.col("r").alias("src_r"), dst1.alias("dst_r"))
        .unionAll(ranked.select(F.col("r").alias("src_r"), dst2.alias("dst_r")))
    )
    pr = ranked.select("r", F.lit(1.0 / n).alias("pr"))
    for _ in range(iters):
        contrib = (
            edges.join(pr, edges.src_r == pr.r)
            .select("dst_r", (F.col("pr") / 2.0).alias("c"))
            .groupBy("dst_r")
            .agg(F.sum("c").alias("c"))
        )
        pr = ranked.select("r").join(
            contrib, ranked.r == contrib.dst_r, "left"
        ).select(
            "r",
            (F.lit((1.0 - PR_DAMP) / n) + PR_DAMP * F.coalesce("c", F.lit(0.0))).alias("pr"),
        )
    return (
        ranked.join(pr, "r")
        .select("doc_id", F.round("pr", ROUND).alias("pr"))
    )


# ------------------------------------------------------------------ SQL
# DuckDB mirrors; `documents` view has (doc_id, text, ...).

def _stop_arr() -> str:
    return (
        "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(ALL_STOPWORDS)) + "]"
    )


def _tfv_cte() -> str:
    from .stopwords import stopwords_sql_list

    pat = TOKEN_PATTERN.replace("'", "''")
    return f"""
tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '{pat}')) AS term
        FROM documents),
ft AS (SELECT doc_id, term FROM tok WHERE term NOT IN {stopwords_sql_list()}),
tfv AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM ft GROUP BY doc_id, term),
dict AS (SELECT term, count(*)::BIGINT AS df FROM tfv GROUP BY term),
stats AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
"""


def _q_values_cte(query: str) -> tuple[str, int]:
    from collections import Counter

    from .tokenizer import tokenize

    qtf = Counter(tokenize(query, use_stem=False))
    # TOKEN_PATTERN admits apostrophes ("don't") — escape for VALUES
    rows = ", ".join(
        "('" + t.replace("'", "''") + f"', {c}::BIGINT)" for t, c in sorted(qtf.items())
    )
    return f"q(term, qtf) AS (VALUES {rows})", len(qtf)


def tfidf_cosine_sql(query: str, k: int = 10) -> str:
    qcte, _ = _q_values_cte(query)
    return f"""
WITH {_tfv_cte()},
{qcte},
weights AS (
  SELECT tfv.doc_id, tfv.term,
         (1.0 + log10(least(tfv.tf, 65535))) * log10(s.n_docs / dict.df::DOUBLE) AS w
  FROM tfv JOIN dict USING (term) CROSS JOIN stats s
),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS dnorm FROM weights GROUP BY doc_id),
qw AS (
  SELECT q.term, (1.0 + log10(q.qtf)) * log10(s.n_docs / dict.df::DOUBLE) AS qw
  FROM q JOIN dict USING (term) CROSS JOIN stats s
),
qn AS (SELECT sqrt(sum(qw * qw)) AS qnorm FROM qw),
scored AS (
  SELECT w.doc_id,
         round(CASE WHEN n.dnorm > 0 AND qn.qnorm > 0
                    THEN sum(w.w * qw.qw) / (n.dnorm * qn.qnorm)
                    ELSE 0.0 END, {ROUND}) AS cos
  FROM weights w JOIN qw USING (term) JOIN norms n ON w.doc_id = n.doc_id
  CROSS JOIN qn
  GROUP BY w.doc_id, n.dnorm, qn.qnorm
)
SELECT row_number() OVER (ORDER BY cos DESC, doc_id ASC)::INTEGER AS rank, doc_id, cos
FROM scored WHERE cos > 0 ORDER BY cos DESC, doc_id ASC LIMIT {k}
"""


def _title_cte() -> str:
    pat = TOKEN_PATTERN.replace("'", "''")
    return f"""
title AS (
  SELECT DISTINCT doc_id, unnest(list_slice(
    list_filter(regexp_extract_all(lower(text), '{pat}'),
                t -> NOT list_contains({_stop_arr()}, t)),
    1, {TITLE_TOKENS})) AS term
  FROM documents)
"""


def title_match_sql(query: str, k: int = 100) -> str:
    qcte, _ = _q_values_cte(query)
    return f"""
WITH {_title_cte()},
{qcte},
hits AS (
  SELECT doc_id, count(*)::BIGINT AS n_hits
  FROM title JOIN (SELECT DISTINCT term FROM q) qq USING (term)
  GROUP BY doc_id
)
SELECT row_number() OVER (ORDER BY n_hits DESC, doc_id ASC)::INTEGER AS rank,
       doc_id, n_hits
FROM hits ORDER BY n_hits DESC, doc_id ASC LIMIT {k}
"""


def _anchor_cte() -> str:
    """rk/nn/edges (graph) + title → anchor(doc_id, term)."""
    return f"""
rk AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS r FROM documents
),
nn AS (SELECT count(*)::BIGINT AS n FROM rk),
edges AS (
  SELECT r AS src_r, (r * 2 + 1) % (SELECT n FROM nn) AS dst_r FROM rk
  UNION ALL
  SELECT r AS src_r, (r * 3 + 2) % (SELECT n FROM nn) AS dst_r FROM rk
),
{_title_cte().strip()},
anchor AS (
  SELECT DISTINCT d.doc_id, t.term
  FROM edges e
  JOIN rk s ON s.r = e.src_r
  JOIN rk d ON d.r = e.dst_r
  JOIN title t ON t.doc_id = s.doc_id
)"""


def anchor_match_sql(query: str, k: int = 100) -> str:
    qcte, _ = _q_values_cte(query)
    return f"""
WITH {_anchor_cte()},
{qcte},
hits AS (
  SELECT doc_id, count(*)::BIGINT AS n_hits
  FROM anchor JOIN (SELECT DISTINCT term FROM q) qq USING (term)
  GROUP BY doc_id
)
SELECT row_number() OVER (ORDER BY n_hits DESC, doc_id ASC)::INTEGER AS rank,
       doc_id, n_hits
FROM hits ORDER BY n_hits DESC, doc_id ASC LIMIT {k}
"""


def fusion_sql(query: str, k: int = 10) -> str:
    # Inlines the same pinned BM25 scored/agg shape as
    # driver_queries._bm25_sql, but un-truncated (fusion normalizes by
    # the global max before taking top-k).
    qcte, n_q = _q_values_cte(query)
    return f"""
WITH {_tfv_cte()},
dl AS (SELECT d.doc_id, coalesce(sum(tfv.tf), 0)::BIGINT AS doc_len
       FROM documents d LEFT JOIN tfv USING (doc_id) GROUP BY d.doc_id),
st2 AS (SELECT count(*)::BIGINT AS n_docs, avg(doc_len)::DOUBLE AS avgdl FROM dl),
{qcte},
scored AS (
  SELECT tfv.doc_id,
         q.qtf * ln(1.0 + (s.n_docs - dict.df + 0.5) / (dict.df + 0.5))
               * least(tfv.tf, 65535) * 2.5
               / (least(tfv.tf, 65535) + 1.5 * (1.0 - 0.75 + 0.75 * dl.doc_len / s.avgdl))
           AS partial
  FROM tfv JOIN q USING (term) JOIN dict USING (term) JOIN dl USING (doc_id)
  CROSS JOIN st2 s
),
body AS (SELECT doc_id, sum(partial) AS bm25 FROM scored GROUP BY doc_id),
body_n AS (SELECT doc_id, bm25 / (SELECT max(bm25) FROM body) AS body_score FROM body),
{_title_cte().strip().rstrip()},
tscore AS (
  SELECT doc_id, count(*) / {float(n_q)} AS title_score
  FROM title JOIN (SELECT DISTINCT term FROM q) qq USING (term)
  GROUP BY doc_id
),
fused AS (
  SELECT coalesce(b.doc_id, t.doc_id) AS doc_id,
         round({FUSE_W_BODY} * coalesce(b.body_score, 0.0)
             + {FUSE_W_TITLE} * coalesce(t.title_score, 0.0), {ROUND}) AS score
  FROM body_n b FULL OUTER JOIN tscore t ON b.doc_id = t.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INTEGER AS rank,
       doc_id, score
FROM fused ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def _pagerank_ctes(iters: int = PR_ITERS) -> tuple[str, str]:
    """(cte_sql, final_cte) — the unrolled PageRank chain; final CTE
    ``prank`` has (doc_id, pr) with pr rounded to ROUND (matching the
    Spark pagerank() output exactly)."""
    prev = "pr0"
    iter_ctes = []
    for i in range(1, iters + 1):
        iter_ctes.append(f"""
pr{i} AS (
  SELECT rk.r,
         (1.0 - {PR_DAMP}) / (SELECT n FROM nn)
         + {PR_DAMP} * coalesce(sum(p.pr / 2.0), 0.0) AS pr
  FROM rk LEFT JOIN edges e ON e.dst_r = rk.r
          LEFT JOIN {prev} p ON p.r = e.src_r
  GROUP BY rk.r
)""")
        prev = f"pr{i}"
    ctes = f"""rk AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS r FROM documents
),
nn AS (SELECT count(*)::BIGINT AS n FROM rk),
edges AS (
  SELECT r AS src_r, (r * 2 + 1) % (SELECT n FROM nn) AS dst_r FROM rk
  UNION ALL
  SELECT r AS src_r, (r * 3 + 2) % (SELECT n FROM nn) AS dst_r FROM rk
),
pr0 AS (SELECT r, 1.0 / (SELECT n FROM nn) AS pr FROM rk),
{','.join(iter_ctes)},
prank AS (
  SELECT rk.doc_id, round(p.pr, {ROUND}) AS pr
  FROM rk JOIN {prev} p USING (r)
)"""
    return ctes, "prank"


def pagerank_sql(*, iters: int = PR_ITERS) -> str:
    ctes, final = _pagerank_ctes(iters)
    return f"WITH {ctes} SELECT doc_id, pr FROM {final}"


def fusion_pr_sql(query: str, k: int = 10) -> str:
    qcte, n_q = _q_values_cte(query)
    pr_ctes, pr_final = _pagerank_ctes()
    return f"""
WITH {_tfv_cte()},
dl AS (SELECT d.doc_id, coalesce(sum(tfv.tf), 0)::BIGINT AS doc_len
       FROM documents d LEFT JOIN tfv USING (doc_id) GROUP BY d.doc_id),
st2 AS (SELECT count(*)::BIGINT AS n_docs, avg(doc_len)::DOUBLE AS avgdl FROM dl),
{qcte},
scored AS (
  SELECT tfv.doc_id,
         q.qtf * ln(1.0 + (s.n_docs - dict.df + 0.5) / (dict.df + 0.5))
               * least(tfv.tf, 65535) * 2.5
               / (least(tfv.tf, 65535) + 1.5 * (1.0 - 0.75 + 0.75 * dl.doc_len / s.avgdl))
           AS partial
  FROM tfv JOIN q USING (term) JOIN dict USING (term) JOIN dl USING (doc_id)
  CROSS JOIN st2 s
),
body AS (SELECT doc_id, sum(partial) AS bm25 FROM scored GROUP BY doc_id),
body_n AS (SELECT doc_id, bm25 / (SELECT max(bm25) FROM body) AS body_score FROM body),
{_title_cte().strip()},
tscore AS (
  SELECT doc_id, count(*) / {float(n_q)} AS title_score
  FROM title JOIN (SELECT DISTINCT term FROM q) qq USING (term)
  GROUP BY doc_id
),
{pr_ctes},
prn AS (SELECT doc_id, pr / (SELECT max(pr) FROM {pr_final}) AS pr_score
        FROM {pr_final}),
fused AS (
  SELECT coalesce(b.doc_id, t.doc_id) AS doc_id,
         round({FUSE3_W_BODY} * coalesce(b.body_score, 0.0)
             + {FUSE3_W_TITLE} * coalesce(t.title_score, 0.0)
             + {FUSE3_W_PR} * coalesce(p.pr_score, 0.0), {ROUND}) AS score
  FROM body_n b FULL OUTER JOIN tscore t ON b.doc_id = t.doc_id
  LEFT JOIN prn p ON p.doc_id = coalesce(b.doc_id, t.doc_id)
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INTEGER AS rank,
       doc_id, score
FROM fused ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def fusion_pv_sql(query: str, k: int = 10) -> str:
    """DuckDB mirror of fusion_pv_topk — fusion_pr_sql's shape plus the
    synthetic-pageview prior (engine/pageviews.py formula inlined)."""
    from .pageviews import PV_MOD, PV_SCALE

    qcte, n_q = _q_values_cte(query)
    pr_ctes, pr_final = _pagerank_ctes()
    return f"""
WITH {_tfv_cte()},
dl AS (SELECT d.doc_id, coalesce(sum(tfv.tf), 0)::BIGINT AS doc_len
       FROM documents d LEFT JOIN tfv USING (doc_id) GROUP BY d.doc_id),
st2 AS (SELECT count(*)::BIGINT AS n_docs, avg(doc_len)::DOUBLE AS avgdl FROM dl),
{qcte},
scored AS (
  SELECT tfv.doc_id,
         q.qtf * ln(1.0 + (s.n_docs - dict.df + 0.5) / (dict.df + 0.5))
               * least(tfv.tf, 65535) * 2.5
               / (least(tfv.tf, 65535) + 1.5 * (1.0 - 0.75 + 0.75 * dl.doc_len / s.avgdl))
           AS partial
  FROM tfv JOIN q USING (term) JOIN dict USING (term) JOIN dl USING (doc_id)
  CROSS JOIN st2 s
),
body AS (SELECT doc_id, sum(partial) AS bm25 FROM scored GROUP BY doc_id),
body_n AS (SELECT doc_id, bm25 / (SELECT max(bm25) FROM body) AS body_score FROM body),
{_title_cte().strip()},
tscore AS (
  SELECT doc_id, count(*) / {float(n_q)} AS title_score
  FROM title JOIN (SELECT DISTINCT term FROM q) qq USING (term)
  GROUP BY doc_id
),
{pr_ctes},
prn AS (SELECT doc_id, pr / (SELECT max(pr) FROM {pr_final}) AS pr_score
        FROM {pr_final}),
pv AS (
  SELECT doc_id,
         CAST(floor({float(PV_SCALE)} /
              (1 + CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
                   % {PV_MOD})) AS BIGINT) AS views
  FROM documents
),
pvn AS (SELECT doc_id,
               ln(1.0 + views) / ln(1.0 + (SELECT max(views) FROM pv)) AS pv_score
        FROM pv),
fused AS (
  SELECT coalesce(b.doc_id, t.doc_id) AS doc_id,
         round({FUSE4_W_BODY} * coalesce(b.body_score, 0.0)
             + {FUSE4_W_TITLE} * coalesce(t.title_score, 0.0)
             + {FUSE4_W_PR} * coalesce(p.pr_score, 0.0)
             + {FUSE4_W_PV} * coalesce(v.pv_score, 0.0), {ROUND}) AS score
  FROM body_n b FULL OUTER JOIN tscore t ON b.doc_id = t.doc_id
  LEFT JOIN prn p ON p.doc_id = coalesce(b.doc_id, t.doc_id)
  LEFT JOIN pvn v ON v.doc_id = coalesce(b.doc_id, t.doc_id)
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INTEGER AS rank,
       doc_id, score
FROM fused ORDER BY score DESC, doc_id ASC LIMIT {k}
"""
