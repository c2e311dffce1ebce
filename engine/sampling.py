"""Deterministic sampling for training-data pipelines.

Two shapes a 100 TB pipeline needs:

- ``hash_sample`` — Bernoulli-style sampling that is REPRODUCIBLE and
  JOIN-STABLE: membership is a pure function of doc_id (a multiplicative
  hash, not rand()), so re-runs, retries, and downstream joins all see
  the same sample, and the predicate is whole-stage codegen pushed into
  the scan — ZERO shuffles, the only admissible shape at corpus scale.
- ``stratified_sample`` — exactly-n-per-stratum selection (eval sets,
  per-language calibration sets): rank docs inside each stratum by the
  same hash and keep the first n. One exchange (hash-partition by the
  stratum column); the per-stratum sort is bounded by the stratum size.
  A skew-heavy stratum sorts more rows, but the window never leaves its
  partition (documented alternative at extreme skew: two-phase
  threshold estimation over a pre-sample — same determinism, no full
  sort; unnecessary below ~10⁹ rows per stratum).

The mix function avoids engine-specific hashes (Spark's xxhash64 has no
DuckDB twin) and 64-bit overflow (DuckDB errors on BIGINT overflow,
Spark wraps): ``((doc_id % 1048573) * 2654435761 + doc_id % 97 + salt)
% 2147483647`` stays within int64 in both engines and mixes well enough
for sampling; ties (possible: the pre-modulus loses bits) are broken by
doc_id, so the order is total and both engines agree exactly.
doc_ids are non-negative by the engine's id contract (engine/ids.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.column import Column

MIX_PRE = 1_048_573
MIX_MUL = 2_654_435_761
MIX_MOD = 2_147_483_647


def _mix(doc_id: Column, salt: int) -> Column:
    return (
        (doc_id % MIX_PRE) * F.lit(MIX_MUL) + doc_id % 97 + F.lit(salt)
    ) % MIX_MOD


def _mix_sql(col: str, salt: int) -> str:
    return f"((({col} % {MIX_PRE}) * {MIX_MUL} + {col} % 97 + {salt}) % {MIX_MOD})"


def hash_sample(df: DataFrame, pct: int, *, salt: int = 0) -> DataFrame:
    """Rows whose mix(doc_id) falls in the first ``pct`` of 100 buckets
    — a deterministic ~pct% sample. Pure filter: no shuffle, no rand(),
    stable across retries and engines."""
    return df.where(_mix(F.col("doc_id"), salt) % 100 < pct)


def hash_sample_sql(pct: int, *, salt: int = 0) -> str:
    return f"""
SELECT doc_id, lang FROM documents
WHERE {_mix_sql('doc_id', salt)} % 100 < {pct}
"""


def stratified_sample(
    df: DataFrame, n_per: int, *, by: str = "lang", salt: int = 0
) -> DataFrame:
    """(by, doc_id, sample_rank): the first ``n_per`` docs of each
    stratum in deterministic hash order (mix asc, doc_id asc)."""
    w = Window.partitionBy(by).orderBy(
        _mix(F.col("doc_id"), salt).asc(), F.col("doc_id").asc()
    )
    return (
        df.select(by, "doc_id")
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n_per)
    )


def token_pack(
    df: DataFrame, budget: int = 2048, *, n_pack_shards: int = 8
) -> DataFrame:
    """(doc_id, pack_shard, n_tokens, bin_id, bin_offset): a
    deterministic fixed-token-budget PACKING PLAN — which training bin
    each document's first token lands in, and at what offset. Documents
    are packed in doc_id order within ``n_pack_shards`` independent
    shards (doc_id % n_pack_shards — engine-portable, unlike xxhash64),
    so the running sum is a per-shard window cumsum: one exchange, and
    each shard packs in parallel. At 100 TB raise n_pack_shards to the
    cluster's parallelism — bins are per-shard, so shards never
    coordinate. Token counts are the engine's own regex token count
    (JVM-side array length, no explode)."""
    from .textops import tokens_all_col

    t = df.select(
        "doc_id",
        (F.col("doc_id") % n_pack_shards).alias("pack_shard"),
        F.size(tokens_all_col(F.col("content"))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("pack_shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return t.withColumn("pre", pre).select(
        "doc_id",
        "pack_shard",
        "n_tokens",
        # exact integer division (Spark `div`), not F.floor(pre/budget):
        # `/` is double division, which loses exactness once a shard's
        # cumulative token count passes 2^53 — real at 100 TB. DIV keeps
        # both engines on integer semantics (DuckDB oracle uses `//`).
        F.expr(f"pre DIV {int(budget)}").cast("long").alias("bin_id"),
        (F.col("pre") % budget).alias("bin_offset"),
    )


def token_pack_sql(budget: int = 2048, *, n_pack_shards: int = 8) -> str:
    from .tokenizer import TOKEN_PATTERN

    pat = TOKEN_PATTERN.replace("'", "''")
    return f"""
WITH t AS (
  SELECT doc_id, doc_id % {n_pack_shards} AS pack_shard,
         len(regexp_extract_all(lower(text), '{pat}'))::BIGINT AS n_tokens
  FROM documents
),
p AS (
  SELECT doc_id, pack_shard, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY pack_shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
  FROM t
)
SELECT doc_id, pack_shard, n_tokens,
       (pre // {budget})::BIGINT AS bin_id,
       (pre % {budget})::BIGINT AS bin_offset
FROM p
"""


def stratified_sample_sql(n_per: int, *, by: str = "lang", salt: int = 0) -> str:
    return f"""
WITH ranked AS (
  SELECT {by}, doc_id,
         row_number() OVER (PARTITION BY {by}
                            ORDER BY {_mix_sql('doc_id', salt)} ASC,
                                     doc_id ASC) AS sample_rank
  FROM documents
)
SELECT {by}, doc_id, sample_rank::INTEGER AS sample_rank
FROM ranked WHERE sample_rank <= {n_per}
"""


CHUNK_TOKENS = 128


def chunk_plan(
    corpus: DataFrame, chunk: int = CHUNK_TOKENS, *, stride: int | None = None
) -> DataFrame:
    """Fixed-token training-chunk layout: split every doc's token
    stream into windows of ``chunk`` tokens starting every ``stride``
    tokens (default = chunk, i.e. non-overlapping; stride < chunk
    gives the overlapping-context shape used for long-doc pre-training
    splits). Output one row per chunk: (doc_id, chunk_id, tok_start,
    tok_end, n_chunk_tokens, chunk_sha256) where chunk_sha256 hashes
    the space-rejoined token slice — the actual training-example
    payload, so the whole rewrite is value-hash-attestable (the
    line_dedup_stats idiom). Docs with zero tokens emit no rows.

    Scale shape: a pure per-doc projection — tokenize, build the start
    positions with `sequence`, explode IN PLACE, slice + hash. ZERO
    exchanges; parallelism = input partitions, which is exactly how a
    100 TB chunking pass should look."""
    if stride is None:
        stride = chunk
    from .textops import tokens_all_col

    t = tokens_all_col(F.col("content"))
    starts = F.when(
        F.size(t) >= 1, F.sequence(F.lit(1), F.size(t), F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    ex = corpus.select(
        "doc_id",
        t.alias("toks"),
        F.explode(starts).alias("tok_start"),
    )
    n_chunk = F.least(
        F.lit(chunk), F.size("toks") - F.col("tok_start") + 1
    )
    return ex.select(
        "doc_id",
        # deterministic without ordinality: starts are 1, 1+stride, ...
        ((F.col("tok_start") - 1) / F.lit(stride)).cast("long").alias("chunk_id"),
        F.col("tok_start").cast("long").alias("tok_start"),
        (F.col("tok_start") + n_chunk - 1).cast("long").alias("tok_end"),
        n_chunk.cast("long").alias("n_chunk_tokens"),
        F.sha2(
            F.concat_ws(" ", F.slice(F.col("toks"), F.col("tok_start"), n_chunk)),
            256,
        ).alias("chunk_sha256"),
    )


def chunk_plan_sql(chunk: int = CHUNK_TOKENS, *, stride: int | None = None) -> str:
    """Exact DuckDB twin over the `documents` view (text column)."""
    if stride is None:
        stride = chunk
    from .tokenizer import TOKEN_PATTERN

    pat = TOKEN_PATTERN.replace("'", "''")
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{pat}') AS l FROM documents
),
ex AS (
  SELECT doc_id, l, unnest(range(1, len(l) + 1, {stride})) AS tok_start
  FROM tok WHERE len(l) >= 1
)
SELECT doc_id,
       ((tok_start - 1) // {stride})::BIGINT AS chunk_id,
       tok_start::BIGINT AS tok_start,
       least(tok_start + {chunk} - 1, len(l))::BIGINT AS tok_end,
       (least(tok_start + {chunk} - 1, len(l)) - tok_start + 1)::BIGINT
         AS n_chunk_tokens,
       sha256(array_to_string(
         l[tok_start:least(tok_start + {chunk} - 1, len(l))], ' '
       )) AS chunk_sha256
FROM ex
"""


MIX_TAU = 0.7  # the multilingual-sampling temperature (XLM-R / mT5 use 0.3-0.7)


def source_mix_weights(corpus: DataFrame, tau: float = MIX_TAU) -> DataFrame:
    """Temperature-scaled domain-mixing weights (the Pile / XLM-R
    sampling recipe): per `source`, its token share p_s, and the
    sampling weight w_s = p_s^tau / sum_s p_s^tau — tau < 1 upsamples
    small domains, tau = 1 is proportional. The output is the sampling
    table a data loader consumes; `expect_docs_per_epoch` is the
    per-source expectation under w (n_docs-weighted).

    Scale shape: one map-side-combined groupBy(source) over the corpus
    (domain cardinality is tiny), then window totals over the
    domain-sized frame — the second stage is O(#sources)."""
    from pyspark.sql import Window

    from .textops import ROUND, tokens_all_col

    per = corpus.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens_all_col(F.col("content")))).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy()
    share = F.col("n_tokens") / F.sum("n_tokens").over(w)
    pw = F.pow(share, F.lit(float(tau)))
    weight = pw / F.sum(pw).over(w)
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, ROUND).alias("token_share"),
        F.round(weight, ROUND).alias("mix_weight"),
        F.round(weight * F.sum("n_docs").over(w), 2).alias("expect_docs_per_epoch"),
    )


def source_mix_weights_sql(tau: float = MIX_TAU) -> str:
    """Exact DuckDB twin over the `documents` view (text/source)."""
    from .textops import ROUND
    from .tokenizer import TOKEN_PATTERN

    pat = TOKEN_PATTERN.replace("'", "''")
    return f"""
WITH per AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(len(regexp_extract_all(lower(text), '{pat}')))::BIGINT AS n_tokens
  FROM documents GROUP BY source
),
sh AS (
  SELECT source, n_docs, n_tokens,
         n_tokens / (sum(n_tokens) OVER ())::DOUBLE AS share,
         pow(n_tokens / (sum(n_tokens) OVER ())::DOUBLE, {float(tau)}) AS pw,
         sum(n_docs) OVER () AS total_docs
  FROM per
)
SELECT source, n_docs, n_tokens,
       round(share, {ROUND}) AS token_share,
       round(pw / sum(pw) OVER (), {ROUND}) AS mix_weight,
       round(pw / sum(pw) OVER () * total_docs, 2) AS expect_docs_per_epoch
FROM sh
"""
