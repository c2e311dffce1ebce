"""Benchmark decontamination for a training-data pipeline.

The standard pre-training hygiene pass (GPT-3 appendix C, PaLM, Llama):
a training document is CONTAMINATED if it shares at least one exact
n-token n-gram (n=13 here, the GPT-3 choice) with any document of a
held-out evaluation set. The operator reports, per training doc, how
many of its distinct 13-grams collide with the eval set — the decision
column a `clean_corpus`-style filter consumes.

Self-contained harness shape: the sandbox brief forbids external data,
so the "eval set" is a deterministic hash split of the corpus itself
(engine/sampling.py's mix — reproducible, join-stable, engine-portable)
and the training side is its complement. In a real deployment you pass
the actual benchmark table as ``eval_df``; everything downstream is
identical.

Scale shape (the part that must survive 100 TB):

- The eval side is benchmark-sized (10^5-10^7 grams, megabytes hashed),
  NEVER corpus-sized → its distinct 60-bit gram-hash set is a broadcast
  build side. No corpus-sized shuffle anywhere on the eval path.
- Training grams are formed JVM-side from the token array (transform +
  element_at over a sequence of start positions — the shingles_df
  pattern, engine/dedup.py:152) and exploded IN PLACE: explode keeps
  the producing partition, so every gram of a doc stays co-located and
  the final groupBy(doc_id) collapses map-side (partial_count) to ~one
  row per doc per partition BEFORE the exchange — shuffle volume is
  O(train docs), not O(gram stream).
- Grams are compared by the shared 60-bit md5 hash (textops.term_hash),
  not the 13-token string: it shrinks the broadcast ~10x and both
  engines hash identically, so the DuckDB oracle is exact (a 60-bit
  collision would have to collide in BOTH engines on different grams to
  break parity — and would then still agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _mix, _mix_sql
from .textops import (
    term_hash_col,
    term_hash_sql,
    tokens_all_col,
    with_array_barrier,
)
from .tokenizer import TOKEN_PATTERN

DECON_N = 13      # GPT-3 appendix C n-gram size
DECON_EVAL_PCT = 10  # harness eval split: mix(doc_id) % 100 < 10


def ngram_set_from_tokens(t, n: int = DECON_N):
    """array<string> of DISTINCT order-preserving n-token grams from a
    token-array column, zero shuffle (empty array below n tokens —
    sequence(1, 0) would generate a descending range). slice+concat_ws,
    NOT an element_at chain: one array copy per gram vs n catalyst
    lookups. ``t`` MUST be a bound column (with_array_barrier), not the
    raw tokenization expression: CollapseProject re-inlines an inlined
    regexp at every slice() — one full re-tokenization PER GRAM
    (measured 38.5 s vs ~1 s for the 13-gram stream at 20k docs,
    local[8]; engine/textops.py:with_array_barrier)."""
    return F.array_distinct(
        F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def ngram_set_col(content, n: int = DECON_N):
    """ngram_set_from_tokens over a content column — only safe for
    one-reference consumers; explode paths should go through
    with_array_barrier + ngram_set_from_tokens (see that docstring)."""
    return ngram_set_from_tokens(tokens_all_col(content), n)


def eval_split(corpus: DataFrame, pct: int = DECON_EVAL_PCT, *, salt: int = 0) -> DataFrame:
    """The harness's stand-in benchmark set: a deterministic ~pct% hash
    split (pure codegen filter, no shuffle, stable across engines)."""
    return corpus.where(_mix(F.col("doc_id"), salt) % 100 < pct)


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame | None = None,
    *,
    n: int = DECON_N,
    pct: int = DECON_EVAL_PCT,
    salt: int = 0,
) -> DataFrame:
    """(doc_id, n_ngrams, n_overlap, contaminated) for every TRAINING
    doc (the complement of the eval split when ``eval_df`` is None):
    n_ngrams = its distinct n-gram count, n_overlap = how many of those
    appear in the eval set, contaminated = n_overlap > 0 (the GPT-3
    any-collision rule). Docs shorter than n tokens get (0, 0, false).

    One broadcast hash join + one map-side-combined groupBy(doc_id);
    see the module docstring for why this is the 100 TB shape."""
    if eval_df is None:
        eval_df = eval_split(corpus, pct, salt=salt)
        train = corpus.where(_mix(F.col("doc_id"), salt) % 100 >= pct)
    else:
        train = corpus

    # token arrays behind a Generate barrier so the per-gram slice()
    # kernel references a bound column (textops.with_array_barrier)
    ev = (
        with_array_barrier(
            eval_df.select("content"), tokens_all_col(F.col("content")), "_t"
        )
        .select(F.explode(ngram_set_from_tokens(F.col("_t"), n)).alias("gram"))
        .select(term_hash_col(F.col("gram")).alias("gh"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    ex = with_array_barrier(
        train.select("doc_id", "content"), tokens_all_col(F.col("content")), "_t"
    ).select(
        "doc_id", ngram_set_from_tokens(F.col("_t"), n).alias("grams")
    ).select(
        "doc_id",
        F.size("grams").cast("long").alias("n_ngrams"),
        F.explode_outer("grams").alias("gram"),  # keeps <n-token docs (null gram)
    ).withColumn("gh", term_hash_col(F.col("gram")))
    joined = ex.join(F.broadcast(ev), "gh", "left")
    return (
        joined.groupBy("doc_id", "n_ngrams")
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_overlap"))
        .select(
            "doc_id",
            "n_ngrams",
            "n_overlap",
            (F.col("n_overlap") > 0).alias("contaminated"),
        )
    )


def decontaminate_sql(
    n: int = DECON_N, pct: int = DECON_EVAL_PCT, *, salt: int = 0
) -> str:
    """Exact DuckDB twin over the `documents` view (text column)."""
    pat = TOKEN_PATTERN.replace("'", "''")
    mix = _mix_sql("doc_id", salt)
    gh = term_hash_sql("g")
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{pat}') AS l FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(l) >= {n}
           THEN [array_to_string(l[i:i+{n - 1}], ' ') for i in range(1, len(l) - {n - 2})]
           ELSE []::VARCHAR[] END) AS gs
  FROM tok
),
ev AS (
  SELECT DISTINCT {gh} AS gh
  FROM (SELECT unnest(gs) AS g FROM grams WHERE {mix} % 100 < {pct})
),
base AS (
  SELECT doc_id, len(gs)::BIGINT AS n_ngrams FROM grams WHERE {mix} % 100 >= {pct}
),
trg AS (
  SELECT doc_id, unnest(gs) AS g FROM grams WHERE {mix} % 100 >= {pct}
),
hits AS (
  SELECT doc_id, count(*)::BIGINT AS n_overlap
  FROM trg JOIN ev ON {gh} = ev.gh GROUP BY doc_id
)
SELECT b.doc_id, b.n_ngrams,
       coalesce(h.n_overlap, 0)::BIGINT AS n_overlap,
       coalesce(h.n_overlap, 0) > 0 AS contaminated
FROM base b LEFT JOIN hits h USING (doc_id)
"""
