"""Deduplication operators for a training-data pipeline.

- exact: sha256 hash-groupBy — one shuffle on the hash, scales linearly.
- n-gram Jaccard: exact pairwise similarity via an inverted shingle
  join — correct but quadratic in the worst case; the small-scale
  verifier for the two approximate methods below.
- MinHash signatures + LSH banding: the 100 TB path — signature cost is
  linear, banding turns pair discovery into an equi-join on band keys
  (shuffle on band key; hot buckets are bounded by band width).
- SimHash + pigeonhole banding: 60-bit simhash; pairs within Hamming
  distance d are found EXACTLY by joining on (d+1) disjoint bit-bands
  (≤d differing bits leave ≥1 band intact) — no quadratic cross-join.

Everything is deterministic: the term/shingle hash is md5-based
(cross-engine, engine/textops.py), MinHash coefficients are pinned
literals, so each operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stopwords import stopwords_sql_list
from .textops import ROUND, term_hash_col, term_hash_sql, tokens_filtered_col
from .tokenizer import TOKEN_PATTERN

MH_P = 2_147_483_647  # 2^31-1
MH_K = 16             # signature length
MH_BAND_ROWS = 4      # → 4 bands
SIM_BITS = 60
SIM_BANDS = 4         # exact for hamming <= SIM_BANDS - 1
SIM_HAMMING = 3
JACCARD_MIN = 0.5


def _mh_params() -> list[tuple[int, int, int]]:
    """Pinned (j, a_j, b_j) MinHash coefficients (deterministic)."""
    out = []
    for j in range(MH_K):
        a = (2654435761 * (j + 1)) % MH_P
        if a == 0:
            a = 1
        b = (40503 * (j + 1) * (j + 1) + 17) % MH_P
        out.append((j, a, b))
    return out


# ------------------------------------------------------------ exact dedup

def exact_dedup(corpus: DataFrame) -> DataFrame:
    """(content_sha256, n_dups, keeper_doc_id): group identical content,
    keep the smallest doc_id."""
    return corpus.groupBy(F.sha2(F.col("content"), 256).alias("content_sha256")).agg(
        F.count("*").alias("n_dups"), F.min("doc_id").alias("keeper_doc_id")
    )


def exact_dedup_sql() -> str:
    return (
        "SELECT sha256(text) AS content_sha256, count(*)::BIGINT AS n_dups, "
        "min(doc_id) AS keeper_doc_id FROM documents GROUP BY sha256(text)"
    )


LINE_DEDUP_MIN_DOCS = 3  # RefinedWeb-style: a line in ≥3 docs is boilerplate


def line_dedup_stats(
    corpus: DataFrame, min_docs: int = LINE_DEDUP_MIN_DOCS
) -> DataFrame:
    """(doc_id, n_lines, n_dropped, clean_sha256) — CROSS-DOCUMENT line
    dedup, the C4/RefinedWeb boilerplate-removal pass: a non-empty
    (whitespace-trimmed key) line occurring in ≥ ``min_docs`` DISTINCT
    docs is dropped from every doc; blank lines are structural and
    always kept. ``clean_sha256`` hashes the kept RAW lines rejoined
    with newline — the cleaned corpus round trips bit-exactly across
    engines, so the whole rewrite is value-hash-attestable without
    shipping the text.

    Scale shape: posexplode lines (corpus-sized, ~rows = lines), one
    map-side-combined countDistinct per trimmed key (the heavy key
    space is line-cardinality, like tokenize→tf), a key-partitioned
    join marking common lines, and one per-doc re-aggregation whose
    ordered rebuild is sort_array over (pos, line) structs — every
    exchange linear in corpus lines, nothing quadratic. DuckDB mirror:
    line_dedup_sql."""
    ex = corpus.select(
        "doc_id",
        F.posexplode(F.split(F.col("content"), "\n")).alias("pos", "line"),
    ).withColumn("key", F.trim("line"))
    common = (
        ex.where(F.length("key") > 0)
        .groupBy("key")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= int(min_docs))
        .select("key", F.lit(True).alias("is_common"))
    )
    marked = ex.join(common, "key", "left").select(
        "doc_id", "pos", "line",
        (F.col("is_common").isNotNull() & (F.length("key") > 0)).alias("dropped"),
    )
    kept_struct = F.when(
        ~F.col("dropped"), F.struct(F.col("pos"), F.col("line"))
    )
    agg = marked.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.col("dropped").cast("long")).cast("long").alias("n_dropped"),
        F.array_sort(
            F.collect_list(kept_struct)
        ).alias("kept"),
    )
    clean = F.array_join(
        F.transform(F.col("kept"), lambda s: s["line"]), "\n"
    )
    return agg.select(
        "doc_id", "n_lines", "n_dropped",
        F.sha2(clean, 256).alias("clean_sha256"),
    )


def line_dedup_sql(min_docs: int = LINE_DEDUP_MIN_DOCS) -> str:
    """DuckDB mirror of line_dedup_stats over the driver `documents`."""
    return f"""
WITH ex AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, chr(10)), 1)::BIGINT AS pos,
         unnest(string_split(text, chr(10))) AS line
  FROM documents
),
keyed AS (SELECT doc_id, pos, line, trim(line) AS key FROM ex),
common AS (
  SELECT key FROM keyed WHERE len(key) > 0
  GROUP BY key HAVING count(DISTINCT doc_id) >= {int(min_docs)}
),
marked AS (
  SELECT k.doc_id, k.pos, k.line,
         (c.key IS NOT NULL AND len(k.key) > 0) AS dropped
  FROM keyed k LEFT JOIN common c USING (key)
)
SELECT doc_id, count(*)::BIGINT AS n_lines,
       sum(CASE WHEN dropped THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
       sha256(coalesce(
         string_agg(CASE WHEN NOT dropped THEN line END, chr(10)
                    ORDER BY pos), '')) AS clean_sha256
FROM marked GROUP BY doc_id
"""


# ------------------------------------------------------------- shingles

def shingles_df(corpus: DataFrame, n: int = 3, *, distinct: bool = True) -> DataFrame:
    """(doc_id, shingle): n-gram token shingles (unstemmed,
    stopword-filtered, order-preserving), DISTINCT by default.

    Shingles are formed JVM-side from the token ARRAY (transform over a
    sequence of start positions + element_at) — zero shuffle before the
    (optional) distinct. The previous posexplode + lead()-over-window
    shape shuffled the entire token stream just to see 2 tokens ahead;
    this feeds both Jaccard and MinHash, the hottest dedup input path.
    ``distinct=False`` skips the dedup exchange for consumers whose
    aggregate is duplicate-insensitive (MinHash min)."""
    from .textops import with_array_barrier

    # token array behind a Generate barrier: a plain select would be
    # CollapseProject-merged into the per-gram lambda below, re-running
    # the regexp tokenization + stopword filter at every element_at
    # (textops.with_array_barrier has the measured numbers)
    toks = with_array_barrier(
        corpus.select("doc_id", "content"),
        tokens_filtered_col(F.col("content")),
        "toks",
    ).select("doc_id", "toks")
    t = F.col("toks")
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(t, i + j) for j in range(n)]
    )
    # sequence(1, 0) would generate a DESCENDING range — guard size < n
    sh = F.when(
        F.size(t) >= n,
        F.transform(F.sequence(F.lit(1), F.size(t) - (n - 1)), gram),
    ).otherwise(F.array().cast("array<string>"))
    out = toks.select("doc_id", F.explode(sh).alias("shingle"))
    return out.distinct() if distinct else out


def _shingle_cte() -> str:
    from .stopwords import ALL_STOPWORDS

    pat = TOKEN_PATTERN.replace("'", "''")
    stop_arr = (
        "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(ALL_STOPWORDS)) + "]"
    )
    return f"""
tokf AS (
  SELECT doc_id,
         unnest(l) AS term,
         unnest(range(1, len(l) + 1)) AS pos
  FROM (
    SELECT doc_id,
           list_filter(regexp_extract_all(lower(text), '{pat}'),
                       t -> NOT list_contains({stop_arr}, t)) AS l
    FROM documents)
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w AS shingle,
           lead(term, 2) OVER w AS _t2
    FROM tokf WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE _t2 IS NOT NULL
)
"""


# ------------------------------------------------- exact n-gram Jaccard

def ngram_jaccard_pairs(corpus: DataFrame, threshold: float = JACCARD_MIN) -> DataFrame:
    """(doc_a, doc_b, jaccard): exact shingle-set Jaccard ≥ threshold via
    inverted shingle join. Quadratic worst case — use MinHash-LSH at
    scale; this is the ground-truth verifier."""
    sh = shingles_df(corpus)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    j = (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), ROUND).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return j


def ngram_jaccard_pairs_sql(threshold: float = JACCARD_MIN) -> str:
    return f"""
WITH {_shingle_cte()},
sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(i / (sa.n + sb.n - i)::DOUBLE, {ROUND}) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(i / (sa.n + sb.n - i)::DOUBLE, {ROUND}) >= {threshold}
"""


# --------------------------------------------------------- MinHash + LSH

def _minhash_wide(corpus: DataFrame) -> DataFrame:
    """(doc_id, m0..m{k-1}): all k permutation minima in ONE
    groupBy(doc_id) — k min-agg columns instead of a k× params
    cross-join shuffled on (doc_id, j). min() is duplicate-insensitive,
    so the RAW (non-distinct) shingle stream feeds it directly: the
    whole signature stage costs one map-side-combined exchange of one
    row per doc."""
    sh = shingles_df(corpus, distinct=False).select(
        "doc_id", (term_hash_col(F.col("shingle")) % MH_P).alias("h")
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MH_P).alias(f"m{j}")
        for j, a, b in _mh_params()
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures(corpus: DataFrame) -> DataFrame:
    """(doc_id, j, minhash): k=16 permutation minima over the shingle
    set — h_j(x) = (a_j * (H(shingle) % p) + b_j) % p. Long form is
    unpivoted AFTER the per-doc aggregate (k rows/doc, post-shuffle)."""
    wide = _minhash_wide(corpus)
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), F.col(f"m{j}").alias("minhash")
            )
            for j in range(MH_K)
        ]
    )
    return wide.select("doc_id", F.explode(pairs).alias("e")).select(
        "doc_id", F.col("e.j").alias("j"), F.col("e.minhash").alias("minhash")
    )


def minhash_signatures_sql() -> str:
    rows = ", ".join(f"({j}, {a}::BIGINT, {b}::BIGINT)" for j, a, b in _mh_params())
    h = term_hash_sql("shingle")
    return f"""
WITH {_shingle_cte()},
params(j, a, b) AS (VALUES {rows})
SELECT doc_id, j, min((a * ({h} % {MH_P}) + b) % {MH_P}) AS minhash
FROM sh CROSS JOIN params
GROUP BY doc_id, j
"""


def _band_keys(corpus: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) — LSH band keys straight from the wide
    signature row (no per-(doc, band) collect_list regroup)."""
    wide = _minhash_wide(corpus)
    n_bands = MH_K // MH_BAND_ROWS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"m{b * MH_BAND_ROWS + i}").cast("string")
                        for i in range(MH_BAND_ROWS)
                    ],
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return wide.select("doc_id", F.explode(bands).alias("e")).select(
        "doc_id", F.col("e.band").alias("band"), F.col("e.band_key").alias("band_key")
    )


def minhash_candidate_pairs(corpus: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_bands): LSH band-collision candidates — docs
    agreeing on ALL rows of ≥1 band. The scale path: equi-join on
    (band, band_key), never a cross-join. NOTE: this is the DETECTOR
    (emits the full within-bucket clique); clustering consumers ride
    minhash_candidate_edges instead, which is linear in bucket size."""
    keys = _band_keys(corpus)
    a = keys.alias("a")
    b = keys.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_bands"))
    )


def minhash_candidate_pairs_sql() -> str:
    sig = minhash_signatures_sql().strip()
    return f"""
WITH sig AS ({sig}),
keys AS (
  SELECT doc_id, (j // {MH_BAND_ROWS})::INTEGER AS band,
         string_agg(minhash::VARCHAR, ',' ORDER BY j) AS band_key
  FROM sig GROUP BY doc_id, (j // {MH_BAND_ROWS})::INTEGER
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_bands
FROM keys a JOIN keys b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


def minhash_candidate_edges(corpus: DataFrame) -> DataFrame:
    """(doc_a, doc_b): connectivity-equivalent LSH edge stream for the
    CLUSTERING consumers (dup_clusters and everything composed on it).

    minhash_candidate_pairs emits the full within-bucket clique — the
    detector's contract, m(m-1)/2 pairs per bucket of m colliding
    docs. Connected components only need the bucket to be CONNECTED,
    so this emits a STAR instead: each member linked to its bucket's
    minimum doc_id — m-1 edges per bucket, and no self-join (a hot
    bucket is one groupBy bucket + one equi-join probe, not an m²
    task). Union-of-stars has exactly the same connected components
    as union-of-cliques (every within-bucket pair is connected through
    the bucket min), so dup_clusters output — and every downstream
    canonical/keep decision and its recursive-CTE DuckDB oracle — is
    unchanged (pinned by tests/test_cluster_sampling.py).

    Measured at 1.2 M generated docs (large dup families): the clique
    stream is 174.8 M pairs; the star stream is bounded by
    n_bands × n_docs rows before the cross-band distinct. At 100 TB
    the clique materialization is quadratic in family size — this is
    the difference between a dedup that finishes and one that doesn't.
    """
    keys = _band_keys(corpus)
    mins = keys.groupBy("band", "band_key").agg(
        F.min("doc_id").alias("doc_a"), F.count("*").alias("m")
    )
    return (
        keys.join(mins.where(F.col("m") > 1), ["band", "band_key"])
        .where(F.col("doc_id") != F.col("doc_a"))
        .select("doc_a", F.col("doc_id").alias("doc_b"))
        .distinct()
    )


# ----------------------------------------------------------------- SimHash

def simhash(corpus: DataFrame) -> DataFrame:
    """(doc_id, simhash): 60-bit SimHash over tf-weighted term hashes.

    ZERO shuffle: SimHash is a pure per-document function, so one
    Arrow-batched mapInPandas stage computes it — tokenize (the
    engine's single-source-of-truth tokenizer, unstemmed, identical to
    ``tokens_filtered_col``), md5-hash each distinct term once per
    batch, then one numpy bit-matrix product per batch. Docs with zero
    tokens emit no row (matching the previous groupBy shape and the
    DuckDB oracle's unnest).

    History: r1 exploded the tf stream ×60 bits through a (doc_id, bit)
    shuffle; r2 folded it into 60 conditional sums in one
    groupBy(doc_id) — right shuffle shape, but the 60 codegen `when()`
    branches per token occurrence regressed wall-clock 2.8→4.2 s at
    sf0.1. This shape drops the exchange entirely AND does the bit math
    vectorized."""

    def _kernel(it):
        import hashlib

        import numpy as np
        import pandas as pd

        from .tokenizer import term_frequencies

        shifts = np.arange(SIM_BITS, dtype=np.uint64)
        for pdf in it:
            counts = term_frequencies(pdf["content"], use_stem=False)
            lens = np.array([len(c) for c in counts], dtype=np.int64)
            keep = lens > 0
            if not keep.any():
                continue
            terms: list[str] = []
            tfs: list[int] = []
            for c, k in zip(counts, keep):
                if k:
                    terms.extend(c.keys())
                    tfs.append(np.fromiter(c.values(), np.int64, len(c)))
            uniq, inv = np.unique(np.asarray(terms, dtype=object), return_inverse=True)
            hvals = np.array(
                [
                    int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                    for t in uniq
                ],
                dtype=np.uint64,
            )
            h = hvals[inv]
            tf = np.concatenate(tfs)
            # s_b = Σ_terms ±tf  → sign matrix (2·bit−1) weighted by tf
            contrib = (2 * ((h[:, None] >> shifts) & 1).astype(np.int64) - 1) * tf[
                :, None
            ]
            starts = np.concatenate(([0], np.cumsum(lens[keep])[:-1]))
            s = np.add.reduceat(contrib, starts, axis=0)
            sim = ((s > 0).astype(np.uint64) << shifts).sum(axis=1).astype(np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(np.int64)[keep],
                    "simhash": sim,
                }
            )

    return corpus.select("doc_id", "content").mapInPandas(
        _kernel, "doc_id long, simhash long"
    )


def simhash_sql() -> str:
    pat = TOKEN_PATTERN.replace("'", "''")
    stop = stopwords_sql_list()
    h = term_hash_sql("term")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{pat}')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf, {h} AS hh
  FROM tok WHERE term NOT IN {stop} GROUP BY doc_id, term
),
bits AS (
  SELECT tf.doc_id, b.bit,
         sum(CASE WHEN (hh >> b.bit) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM tf CROSS JOIN (SELECT unnest(range(0, {SIM_BITS})) AS bit) b
  GROUP BY tf.doc_id, b.bit
)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
FROM bits GROUP BY doc_id
"""


def simhash_dup_pairs(corpus: DataFrame, max_hamming: int = SIM_HAMMING) -> DataFrame:
    """(doc_a, doc_b, hamming): pairs within Hamming distance d, found
    EXACTLY via pigeonhole banding — (d+1)=4 disjoint 15-bit bands; ≤d
    differing bits leave ≥1 band equal, so candidates come from 4
    equi-joins, not a cross-join (the 100 TB-safe plan)."""
    sh = simhash(corpus)
    width = SIM_BITS // SIM_BANDS
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(SIM_BANDS - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"(simhash >> (band * {width})) & {(1 << width) - 1}"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


def simhash_dup_pairs_sql(max_hamming: int = SIM_HAMMING) -> str:
    width = SIM_BITS // SIM_BANDS
    return f"""
WITH sh AS ({simhash_sql().strip()}),
bands AS (
  SELECT doc_id, simhash, b.band,
         (simhash >> (b.band * {width})) & {(1 << width) - 1} AS band_val
  FROM sh CROSS JOIN (SELECT unnest(range(0, {SIM_BANDS})) AS band) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS ha, b.simhash AS hb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(ha, hb))::INTEGER AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= {max_hamming}
"""


# ------------------------------------------------------- cross-doc n-grams

DUP_NGRAM_N = 13  # same n as engine/decontam.py (the GPT-3 choice)


def dup_ngram_stats(corpus: DataFrame, n: int = DUP_NGRAM_N) -> DataFrame:
    """ExactSubstr-lite (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): per doc, how much of it is made of
    n-grams that ALSO occur in other documents. Where line_dedup_stats
    catches shared boilerplate LINES, this catches shared runs at token
    granularity — the signal the suffix-array ExactSubstr pass uses,
    approximated with fixed-n grams so it stays one relational pipeline.

    Output per doc: n_ngrams (distinct n-grams), n_dup_ngrams (those
    whose gram also appears in >= 1 OTHER doc), dup_ngram_frac
    (rounded; NULL when the doc is shorter than n tokens).

    Scale shape: grams are per-doc DISTINCT (engine/decontam.py's
    ngram_set_col) and hashed to 60 bits, so the stream is corpus-
    token-sized, never quadratic. Cross-doc visibility = one window
    count over the gram hash — a single gram-keyed exchange (rows with
    the same gram land together; no self-join, no second shuffle of
    the stream) — then a map-side-combined groupBy(doc_id)."""
    from pyspark.sql import Window

    from .decontam import ngram_set_from_tokens
    from .textops import ROUND, term_hash_col, tokens_all_col, with_array_barrier

    ex = with_array_barrier(
        corpus.select("doc_id", "content"), tokens_all_col(F.col("content")), "_t"
    ).select(
        "doc_id", ngram_set_from_tokens(F.col("_t"), n).alias("grams")
    ).select(
        "doc_id",
        F.size("grams").cast("long").alias("n_ngrams"),
        F.explode_outer("grams").alias("gram"),
    ).select(
        "doc_id", "n_ngrams", term_hash_col(F.col("gram")).alias("gh")
    )
    # grams are distinct per doc, so count(*) per gh == doc frequency
    w = Window.partitionBy("gh")
    dup = (F.count("*").over(w) > 1) & F.col("gh").isNotNull()
    return (
        ex.withColumn("is_dup", dup.cast("long"))
        .groupBy("doc_id", "n_ngrams")
        .agg(
            F.sum(F.when(F.col("gh").isNotNull(), F.col("is_dup"))).cast("long")
        .alias("n_dup_ngrams_raw"))
        .select(
            "doc_id",
            "n_ngrams",
            F.coalesce(F.col("n_dup_ngrams_raw"), F.lit(0)).alias("n_dup_ngrams"),
            F.when(
                F.col("n_ngrams") > 0,
                F.round(
                    F.coalesce(F.col("n_dup_ngrams_raw"), F.lit(0))
                    / F.col("n_ngrams"),
                    ROUND,
                ),
            ).alias("dup_ngram_frac"),
        )
    )


def dup_ngram_stats_sql(n: int = DUP_NGRAM_N) -> str:
    """Exact DuckDB twin over the `documents` view (text column)."""
    from .textops import ROUND, term_hash_sql
    from .tokenizer import TOKEN_PATTERN

    pat = TOKEN_PATTERN.replace("'", "''")
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
ex AS (
  SELECT doc_id, {gh} AS gh
  FROM (SELECT doc_id, unnest(gs) AS g FROM grams)
),
marked AS (
  SELECT doc_id, (count(*) OVER (PARTITION BY gh) > 1)::BIGINT AS is_dup FROM ex
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_dup_base, sum(is_dup)::BIGINT AS n_dup
  FROM marked GROUP BY doc_id
)
SELECT g.doc_id,
       len(g.gs)::BIGINT AS n_ngrams,
       coalesce(a.n_dup, 0)::BIGINT AS n_dup_ngrams,
       CASE WHEN len(g.gs) > 0
            THEN round(coalesce(a.n_dup, 0) / len(g.gs)::DOUBLE, {ROUND})
       END AS dup_ngram_frac
FROM grams g LEFT JOIN agg a USING (doc_id)
"""
