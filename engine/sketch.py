"""Mergeable sketches: HyperLogLog distinct-count + count-min heavy
hitters — the 100 TB cardinality/frequency answer.

At production scale ``count(distinct x)`` is a corpus-sized shuffle and
an exact per-term frequency table is dictionary-sized state; both
sketches below reduce to FIXED-size state (2^p registers / d×w
counters) built with one map-side-combinable aggregation, and two
sketch states merge by max/sum — exactly the shape a 1000-executor
tree aggregation wants. Spark's own approx_count_distinct is the same
HLL idea but its binary sketch state is not reproducible in DuckDB, so
these implementations pin a deterministic hash (the repo's 60-bit
md5 convention, engine/textops.term_hash_col) and exact integer
register state: the DuckDB oracles rebuild byte-identical registers
and the driver value-hash check covers the ESTIMATES, not just the
inputs.

Float discipline: the only non-integer steps are the final estimate
formulas. The harmonic-mean denominator is kept as an exact BIGINT
(sum of 2^(shift+1-M) over registers), so the raw estimate is a single
identical-IEEE expression in both engines; the linear-counting branch
(m·ln(m/zeros)) is rounded to 4 decimals before comparison.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textops import term_hash_col, term_hash_sql

HLL_P = 8                 # 2^8 = 256 registers
HLL_BITS = 60             # term_hash_col width
CMS_DEPTH = 4
CMS_WIDTH = 64
ROUND = 4


def _alpha(m: int) -> str:
    """HLL bias constant as a SQL-literal expression (kept symbolic so
    both engines evaluate the identical IEEE expression)."""
    if m == 16:
        return "0.673"
    if m == 32:
        return "0.697"
    if m == 64:
        return "0.709"
    return f"0.7213 / (1.0 + 1.079 / {m}.0)"


def hll_distinct(df: DataFrame, col: str, p: int = HLL_P) -> DataFrame:
    """One-row (m, used, est, exact) HyperLogLog estimate of
    count(distinct col), with the exact count alongside for accuracy
    reporting. Register build = one groupBy(bucket) max; final state is
    m-bounded, so the whole sketch is two tiny aggregations above the
    scan (the ``exact`` column is the only corpus-sized distinct and
    exists for the comparison — drop it at 100 TB).
    """
    m = 1 << p
    shift = HLL_BITS - p
    regs = hll_registers(df, col, p)
    # exact integer harmonic state: empty buckets contribute 2^(shift+1)
    state = regs.agg(
        F.count("*").cast("long").alias("used"),
        F.sum(F.expr(f"shiftleft(1L, {shift + 1} - M)")).cast("long").alias(
            "s_used"
        ),
    )
    exact = df.agg(F.count_distinct(F.col(col)).cast("long").alias("exact"))
    est = F.expr(
        f"CASE WHEN raw <= 2.5 * {m}.0 AND {m} - used > 0 "
        f"THEN {m}.0 * ln({m}.0 / (({m} - used) * 1.0)) ELSE raw END"
    )
    return (
        state.crossJoin(F.broadcast(exact))
        .withColumn(
            "raw",
            F.expr(
                f"({_alpha(m)}) * {m}.0 * {m}.0 * {float(1 << (shift + 1))} "
                f"/ (({m} - used) * shiftleft(1L, {shift + 1}) + s_used)"
            ),
        )
        .select(
            F.lit(m).cast("long").alias("m"),
            F.col("used"),
            F.round(est, ROUND).alias("est"),
            F.col("exact"),
        )
    )


def hll_distinct_sql(
    expr: str, from_clause: str, p: int = HLL_P
) -> str:
    """DuckDB mirror of hll_distinct over ``SELECT {expr} FROM
    {from_clause}`` — identical hash, registers, and estimate
    expressions."""
    m = 1 << p
    shift = HLL_BITS - p
    h = term_hash_sql(expr)
    return f"""
WITH vals AS (SELECT {h} AS h FROM {from_clause}),
parts AS (
  SELECT h >> {shift} AS bucket, h & {(1 << shift) - 1} AS w FROM vals
),
rho AS (
  SELECT bucket,
         CASE WHEN w = 0 THEN {shift + 1}
              ELSE {shift} - (length(bin(w)) - 1) END AS rho
  FROM parts
),
regs AS (SELECT bucket, max(rho) AS M FROM rho GROUP BY bucket),
state AS (
  SELECT count(*)::BIGINT AS used,
         sum((1::BIGINT << ({shift + 1} - M)))::BIGINT AS s_used
  FROM regs
),
ex AS (SELECT count(DISTINCT {expr})::BIGINT AS exact FROM {from_clause}),
calc AS (
  SELECT used, s_used, exact,
         ({_alpha(m)}) * {m}.0 * {m}.0 * {float(1 << (shift + 1))}
           / (({m} - used) * (1::BIGINT << {shift + 1}) + s_used) AS raw
  FROM state, ex
)
SELECT {m}::BIGINT AS m, used,
       round(CASE WHEN raw <= 2.5 * {m}.0 AND {m} - used > 0
                  THEN {m}.0 * ln({m}.0 / (({m} - used) * 1.0))
                  ELSE raw END, {ROUND}) AS est,
       exact
FROM calc
"""


# ------------------------------------------------------- KMV hit counts

KMV_K = 64
_H_MAX = float(1 << HLL_BITS)  # hash-space size (normalizes theta)


def kmv_term_sketches(
    tokens: DataFrame, terms: list[str], k: int = KMV_K
) -> DataFrame:
    """(term, h) — the k smallest 60-bit doc-id hashes per term: the
    KMV (bottom-k) sketch of each term's posting list. Index-time
    state, k-bounded per term, mergeable by keep-smallest-k. The
    rank<=k filter is a WindowGroupLimit: Spark evaluates it below the
    exchange, so each shard ships at most k rows per term."""
    from pyspark.sql import Window

    h = term_hash_col(F.col("doc_id").cast("string"))
    pos = tokens.where(F.col("term").isin(terms)).select(
        "term", h.alias("h")
    )
    w = Window.partitionBy("term").orderBy("h")
    return (
        pos.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_hit_counts(
    tokens: DataFrame, queries: dict[str, list[str]], k: int = KMV_K
) -> DataFrame:
    """(query_id, n_hits_est, n_hits_exact) — approximate total hits
    (distinct docs matching ANY query term) from per-term KMV sketches:
    the track_total_hits=false answer. Query time touches <= q*k sketch
    rows instead of decoding postings; union sketch = k smallest of the
    merged values, est = (k-1)/theta. Because all sketches share one
    hash, the merged kth minimum is always <= each contributing term's
    own theta, so the naive merge IS the correct KMV union; when the
    merged set has fewer than k values every contributing sketch was
    untruncated and the estimate equals the exact count. Every query
    emits a row (zero-hit queries report 0, never omitted). The exact
    count is computed alongside for the comparison — at scale you'd
    serve the estimate alone."""
    from pyspark.sql import Window

    spark = tokens.sparkSession
    qt = [(qid, t) for qid, ts in sorted(queries.items()) for t in sorted(set(ts))]
    qdf = spark.createDataFrame(qt, "query_id string, term string")
    qids = spark.createDataFrame(
        [(q,) for q in sorted(queries)], "query_id string"
    )
    terms = sorted({t for _, t in qt})
    sk = kmv_term_sketches(tokens, terms, k)
    merged = sk.join(F.broadcast(qdf), "term").select("query_id", "h")
    exact = (
        tokens.join(F.broadcast(qdf), "term")
        .groupBy("query_id")
        .agg(F.count_distinct("doc_id").cast("long").alias("n_exact"))
    )
    return (
        kmv_union_counts(merged, qids, k)
        .join(exact, "query_id", "left")
        .select(
            "query_id",
            "n_hits_est",
            F.coalesce("n_exact", F.lit(0)).alias("n_hits_exact"),
        )
    )


def kmv_union_counts(merged: DataFrame, qids: DataFrame, k: int = KMV_K) -> DataFrame:
    """(query_id, n_hits_est) from a (query_id, h) frame of merged
    sketch rows — the shared estimator of the recompute and
    artifact-served paths (engine/index.py hit_counts_approx). Input
    rows are deduped here (a doc matching several query terms
    contributes its hash once)."""
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("h")
    perq = (
        merged.distinct()
        .withColumn("rn", F.row_number().over(w))
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_sk"),
            F.max(F.when(F.col("rn") == k, F.col("h"))).alias("theta"),
        )
    )
    est = F.when(
        F.coalesce(F.col("n_sk"), F.lit(0)) < k,
        F.coalesce(F.col("n_sk"), F.lit(0)).cast("double"),
    ).otherwise(F.expr(f"({k - 1}.0 * {_H_MAX}) / theta"))
    return qids.join(perq, "query_id", "left").select(
        "query_id", F.round(est, ROUND).alias("n_hits_est")
    )


def kmv_hit_counts_sql(queries: dict[str, list[str]], k: int = KMV_K) -> str:
    """DuckDB mirror over the driver ``tfv`` CTE (compose as
    ``WITH {_base_ctes()}, {this}``)."""
    qt_rows = ", ".join(
        f"('{qid}', '" + t.replace("'", "''") + "')"
        for qid, ts in sorted(queries.items())
        for t in sorted(set(ts))
    )
    qid_rows = ", ".join(f"('{q}')" for q in sorted(queries))
    h = term_hash_sql("doc_id::VARCHAR")
    return f"""
qt(query_id, term) AS (VALUES {qt_rows}),
qids(query_id) AS (VALUES {qid_rows}),
pos AS (
  SELECT term, {h} AS h FROM tfv
  WHERE term IN (SELECT DISTINCT term FROM qt)
),
sk AS (
  SELECT term, h FROM (
    SELECT term, h, row_number() OVER (PARTITION BY term ORDER BY h) AS rn
    FROM pos
  ) WHERE rn <= {k}
),
merged AS (SELECT DISTINCT query_id, h FROM sk JOIN qt USING (term)),
perq AS (
  SELECT query_id, count(*)::BIGINT AS n_sk,
         max(CASE WHEN rn = {k} THEN h END) AS theta
  FROM (
    SELECT query_id, h,
           row_number() OVER (PARTITION BY query_id ORDER BY h) AS rn
    FROM merged
  ) GROUP BY query_id
),
ex AS (
  SELECT qt.query_id, count(DISTINCT tfv.doc_id)::BIGINT AS n_exact
  FROM tfv JOIN qt ON tfv.term = qt.term GROUP BY qt.query_id
)
SELECT qids.query_id,
       round(CASE WHEN coalesce(perq.n_sk, 0) < {k}
                  THEN coalesce(perq.n_sk, 0) * 1.0
                  ELSE ({k - 1}.0 * {_H_MAX}) / perq.theta END,
             {ROUND}) AS n_hits_est,
       coalesce(ex.n_exact, 0)::BIGINT AS n_hits_exact
FROM qids LEFT JOIN perq USING (query_id) LEFT JOIN ex USING (query_id)
"""


# ---------------------------------------------------------- sketch merge

def merge_kmv_sketches(*sketches: DataFrame, k: int = KMV_K) -> DataFrame:
    """Merge per-term KMV sketches from several corpus segments:
    union → keep the k smallest hashes per term. Because every segment
    uses the same hash, merge(keep-k(A), keep-k(B)) ≡ keep-k(A ∪ B)
    EXACTLY (a value in the merged bottom-k is below both segments'
    thetas, so neither segment dropped it) — the property that lets a
    1000-executor tree combine segment sketches without re-reading
    postings, and lets add_documents/merge lifecycles maintain the
    artifact incrementally. Exactness is pinned by
    tests/test_sketch.py::test_kmv_merge_equals_rebuild."""
    from functools import reduce

    from pyspark.sql import Window

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    w = Window.partitionBy("term").orderBy("h")
    return (
        u.distinct()
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def merge_hll_registers(*register_frames: DataFrame) -> DataFrame:
    """Merge HLL register frames ((bucket, M) as built inside
    hll_distinct): bucket-wise max. max is idempotent/commutative/
    associative, so any merge tree over any segmentation yields the
    registers of the full corpus exactly."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), register_frames)
    return u.groupBy("bucket").agg(F.max("M").alias("M"))


def hll_registers(df: DataFrame, col: str, p: int = HLL_P) -> DataFrame:
    """(bucket, M) register frame — the mergeable state hll_distinct
    aggregates; exposed so segments can build/store registers
    independently and combine via merge_hll_registers."""
    m = 1 << p
    shift = HLL_BITS - p
    h = term_hash_col(F.col(col))
    bucket = F.shiftrightunsigned(h, shift).alias("bucket")
    w = h.bitwiseAND(F.lit((1 << shift) - 1))
    # rho = leading zeros of the shift-bit remainder + 1;
    # floor(log2(w)) == length(bin(w)) - 1 exactly (no float log)
    rho = F.when(w == 0, F.lit(shift + 1)).otherwise(
        F.lit(shift) - (F.length(F.bin(w)) - F.lit(1))
    )
    return df.select(bucket, rho.alias("rho")).groupBy("bucket").agg(
        F.max("rho").alias("M")
    )


# ------------------------------------------------------------ count-min

def _cms_bucket(term: F.Column, row: int, width: int) -> F.Column:
    return term_hash_col(F.concat(F.lit(f"{row}:"), term)) % width


def cms_heavy_hitters(
    tokens: DataFrame,
    candidates: list[str],
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    tf_cap: int = 65535,
) -> DataFrame:
    """(term, cf_est, cf_exact) — count-min sketch estimate of the
    (capped) collection term frequency for each candidate term, with
    the exact value alongside. Sketch build: each (doc,term,tf) row
    lands in ``depth`` of the d×w counters (posexplode of a d-element
    bucket array), one groupBy over ≤ d·w keys — map-side combined,
    fixed-size state, mergeable by cell-wise sum. The probe joins a
    broadcast candidate×row frame against the tiny sketch; CMS
    guarantees cf_est >= cf_exact (asserted in tests).
    ``tokens`` is tokens_df(...) output: (doc_id, term, tf)."""
    spark = tokens.sparkSession
    tfc = F.least(F.col("tf"), F.lit(tf_cap))
    buckets = F.array(
        *[_cms_bucket(F.col("term"), i, width) for i in range(depth)]
    )
    cells = (
        tokens.select(tfc.alias("tfc"), F.posexplode(buckets))
        .groupBy(F.col("pos").alias("row_i"), F.col("col").alias("bucket"))
        .agg(F.sum("tfc").cast("long").alias("cell"))
    )
    probe_rows = [
        (t, i, _cms_py_bucket(t, i, width))
        for t in candidates
        for i in range(depth)
    ]
    probe = spark.createDataFrame(
        probe_rows, "term string, row_i int, bucket long"
    )
    est = (
        F.broadcast(probe)
        .join(cells, ["row_i", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cell"), F.lit(0))).alias("cf_est"))
    )
    exact = (
        tokens.where(F.col("term").isin(candidates))
        .groupBy("term")
        .agg(F.sum(tfc).cast("long").alias("cf_exact"))
    )
    return (
        est.join(exact, "term", "left")
        .select(
            "term",
            "cf_est",
            F.coalesce(F.col("cf_exact"), F.lit(0)).alias("cf_exact"),
        )
    )


def _cms_py_bucket(term: str, row: int, width: int) -> int:
    """Driver-side twin of _cms_bucket (same md5 60-bit convention)."""
    return int(hashlib.md5(f"{row}:{term}".encode()).hexdigest()[:15], 16) % width


def cms_heavy_hitters_sql(
    candidates: list[str],
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB mirror over the driver ``tfv`` CTE (must be composed as
    ``WITH {_base_ctes()}, {this}`` — see engine/driver_queries.py)."""
    rows = ", ".join(f"({i})" for i in range(depth))
    cand = ", ".join("('" + t.replace("'", "''") + "')" for t in candidates)
    bucket = term_hash_sql("r.row_i::VARCHAR || ':' || tfv.term")
    pbucket = term_hash_sql("r.row_i::VARCHAR || ':' || c.term")
    return f"""
rows(row_i) AS (VALUES {rows}),
cand(term) AS (VALUES {cand}),
cells AS (
  SELECT r.row_i, {bucket} % {width} AS bucket,
         sum(least(tfv.tf, 65535))::BIGINT AS cell
  FROM tfv, rows r GROUP BY 1, 2
),
probe AS (
  SELECT c.term, r.row_i, {pbucket} % {width} AS bucket
  FROM cand c, rows r
),
est AS (
  SELECT p.term, min(coalesce(cells.cell, 0))::BIGINT AS cf_est
  FROM probe p LEFT JOIN cells USING (row_i, bucket) GROUP BY p.term
),
ex AS (
  SELECT term, sum(least(tf, 65535))::BIGINT AS cf_exact FROM tfv
  WHERE term IN (SELECT term FROM cand) GROUP BY term
)
SELECT est.term, est.cf_est, coalesce(ex.cf_exact, 0)::BIGINT AS cf_exact
FROM est LEFT JOIN ex USING (term)
"""
