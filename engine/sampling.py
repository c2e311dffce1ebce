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
