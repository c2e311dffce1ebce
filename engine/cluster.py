"""Near-duplicate clustering + canonical selection — the step a
production dedup pipeline runs AFTER candidate-pair generation.
`engine/dedup.py` emits the near-dup pairs (MinHash-LSH band
collisions); this module turns the pair stream into connected
components and picks one canonical document per component, which is
what a 100 TB training-data dedup actually ships: "keep THIS doc, drop
those".

Scale notes: the pair stream is tiny relative to the corpus (band
collisions only), and near-dup components are overwhelmingly
small-diameter (pairs are LSH collisions, so components are cliques or
near-cliques of diameter ≤ 2-3). ``dup_clusters`` therefore runs
hash-to-min label propagation: each round is ONE equi-join (labels onto
the symmetric edge list) + ONE groupBy(dst).min — both shuffles carry
only edge-node rows, never the corpus — and converges in O(diameter)
rounds with a single-scalar convergence check per round.
``localCheckpoint`` truncates the growing lineage so round R's plan
does not replay rounds 0..R-1. For adversarial long-chain graphs the
round cap bounds the job (documented seam: alternating
large-star/small-star — Kiveris et al., "Connected Components in
MapReduce and Beyond", public algorithm — keeps the same join shape
with O(log² n) rounds; unnecessary for LSH pair streams).

Cluster ids are the component's MINIMUM doc_id — a unique fixpoint, so
the labeling is deterministic regardless of execution order, and the
DuckDB mirror (a recursive-CTE transitive closure, fine at oracle
scale) reaches the identical result.

Reference parity: the reference family (SURVEY.md §0) has no dedup
layer; this extends the engine's training-data-pipeline surface
(SURVEY.md §2 "LLM-data-pipeline operators") past pair generation to
the decision the pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import minhash_candidate_pairs_sql

MAX_ROUNDS = 15


def dup_clusters(
    corpus: DataFrame, pairs: DataFrame, *, max_rounds: int = MAX_ROUNDS
) -> DataFrame:
    """(doc_id, cluster_id) for EVERY corpus doc; cluster_id = the
    minimum doc_id of the doc's connected component in the pair graph
    (singletons label themselves). ``pairs`` must carry (doc_a, doc_b).

    Raises if the propagation has not reached the fixpoint within
    ``max_rounds`` — a truncated labeling would be silently wrong.
    """
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    # the edge list is consumed once per propagation round plus once
    # for the initial label frame — without this checkpoint each
    # consumer replays the WHOLE upstream pair generation (the full
    # MinHash chain when called from clean_corpus: tokenize → shingles
    # → signatures → band join, ~4-6 replays per clustering). Edge
    # rows are band collisions only — tiny at any corpus size.
    ).localCheckpoint(eager=True)
    # Propagate only over nodes that occur in edges; everything else is
    # a fixed singleton joined back at the end (at 100 TB the label
    # frame is |dup docs|, not |corpus|).
    lab = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_rounds):
        nbr = (
            sym.join(lab, sym.src == lab.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        stepped = (
            lab.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", F.col("cluster_id"))
                ).alias("cluster_id"),
                (
                    F.coalesce("nbr_min", F.col("cluster_id")) < F.col("cluster_id")
                ).cast("int").alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = stepped.agg(F.sum("chg").alias("c")).collect()[0]["c"] or 0
        lab = stepped.select("doc_id", "cluster_id")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dup_clusters did not converge in {max_rounds} rounds — "
            "component diameter exceeds the cap (see module docstring)"
        )
    return (
        corpus.select("doc_id")
        .join(lab, "doc_id", "left")
        .select("doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id"))
    )


def dedup_canonical(corpus: DataFrame, clusters: DataFrame) -> DataFrame:
    """(cluster_id, canonical_doc_id, n_members) for every cluster with
    ≥ 2 members: the doc the pipeline KEEPS is the longest one
    (length(content) desc), ties to the smallest doc_id — pinned so both
    engines agree. One groupBy (no window): the argmax rides a
    max(struct(len, -doc_id)) with map-side combine."""
    sized = clusters.join(
        corpus.select("doc_id", F.length("content").alias("len")), "doc_id"
    )
    agg = sized.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max(F.struct(F.col("len"), (-F.col("doc_id")).alias("nid"))).alias("m"),
    )
    return agg.where(F.col("n_members") >= 2).select(
        "cluster_id",
        (-F.col("m.nid")).alias("canonical_doc_id"),
        "n_members",
    )


def clean_corpus(corpus: DataFrame, *, min_quality: float = 0.15) -> DataFrame:
    """(doc_id, cluster_id, quality): the composed KEEP decision a
    training-data pipeline materializes — near-dup dedup (keep each
    cluster's canonical doc: longest, then smallest doc_id; singletons
    keep themselves) AND a quality floor (engine/textops.quality_score
    ≥ min_quality — 0.15 ≈ the synthetic corpus median). Chains dup_clusters over the MinHash-LSH pair
    stream, the canonical argmax (map-side-combined max(struct)), and
    the quality join — every stage is the already-plan-audited shape of
    its standalone operator."""
    from .dedup import minhash_candidate_edges
    from .textops import quality_score

    clusters = dup_clusters(corpus, minhash_candidate_edges(corpus))
    sized = clusters.join(
        corpus.select("doc_id", F.length("content").alias("len")), "doc_id"
    )
    canon = (
        sized.groupBy("cluster_id")
        .agg(F.max(F.struct("len", (-F.col("doc_id")).alias("nid"))).alias("m"))
        .select("cluster_id", (-F.col("m.nid")).alias("canonical_doc_id"))
    )
    q = quality_score(corpus).select("doc_id", "quality")
    return (
        clusters.join(canon, "cluster_id")
        .where(F.col("doc_id") == F.col("canonical_doc_id"))
        .join(q, "doc_id")
        .where(F.col("quality") >= min_quality)
        .select("doc_id", "cluster_id", "quality")
    )


# ------------------------------------------------------------------ SQL
# DuckDB mirrors. The edge set is the SAME SQL the minhash_candidate_pairs
# driver entry uses, so the oracle clusters exactly the pairs the engine
# clusters. The recursive closure is oracle-scale-only by design.

def _closure_ctes() -> str:
    pairs = minhash_candidate_pairs_sql().strip().rstrip(";")
    return f"""
pairs AS ({pairs}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
),
clus AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a)
"""


def dup_clusters_sql() -> str:
    return f"""
WITH RECURSIVE {_closure_ctes()}
SELECT doc_id, cluster_id FROM clus
"""


def clean_corpus_sql(*, min_quality: float = 0.15) -> str:
    from .textops import quality_score_sql

    qsql = quality_score_sql().strip().rstrip(";")
    return f"""
WITH RECURSIVE {_closure_ctes()},
canon AS (
  SELECT cluster_id, doc_id AS canonical_doc_id FROM (
    SELECT c.cluster_id, c.doc_id,
           row_number() OVER (PARTITION BY c.cluster_id
                              ORDER BY length(d.text) DESC, c.doc_id ASC) AS rn
    FROM clus c JOIN documents d ON d.doc_id = c.doc_id
  ) WHERE rn = 1
),
q AS ({qsql})
SELECT c.doc_id, c.cluster_id, q.quality
FROM clus c
JOIN canon n ON n.cluster_id = c.cluster_id AND n.canonical_doc_id = c.doc_id
JOIN q ON q.doc_id = c.doc_id
WHERE q.quality >= {min_quality}
"""


def dedup_canonical_sql() -> str:
    return f"""
WITH RECURSIVE {_closure_ctes()},
sized AS (
  SELECT c.cluster_id, c.doc_id, length(d.text) AS len
  FROM clus c JOIN documents d ON d.doc_id = c.doc_id
),
ranked AS (
  SELECT cluster_id, doc_id,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY len DESC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM sized
)
SELECT cluster_id, doc_id AS canonical_doc_id, n_members::BIGINT AS n_members
FROM ranked WHERE rn = 1 AND n_members >= 2
"""


DUP_NGRAM_MAX = 0.5  # drop when >50% of a doc's 13-grams are cross-doc dups


def hygiene_keep(
    corpus: DataFrame,
    *,
    min_quality: float = 0.15,
    max_dup_ngram: float = DUP_NGRAM_MAX,
) -> DataFrame:
    """The COMPLETE keep/drop decision table a pre-training pipeline
    materializes — every hygiene signal this engine computes, joined
    into one row per TRAINING doc (the decontamination eval split is
    excluded outright: benchmark docs never enter the training set):

    - is_canonical  — survives near-dup dedup (cluster's canonical doc
      or singleton; engine/cluster.dup_clusters + canonical argmax)
    - quality       — heuristic score, floored at ``min_quality``
    - gopher_pass   — Gopher repetition rules (engine/textops)
    - contaminated  — GPT-3 13-gram eval collision (engine/decontam)
    - dup_ngram_frac — cross-doc duplicated-13-gram fraction, capped
      at ``max_dup_ngram`` (engine/dedup.dup_ngram_stats)
    - keep          — the conjunction

    Every stage is the already-plan-audited shape of its standalone
    operator; the joins are all doc_id-keyed (one co-partitioned
    exchange each at worst), so the composition adds no new scale
    hazard beyond its parts."""
    from .decontam import decontaminate
    from .dedup import dup_ngram_stats, minhash_candidate_edges
    from .textops import gopher_repetition, quality_score

    clusters = dup_clusters(corpus, minhash_candidate_edges(corpus))
    sized = clusters.join(
        corpus.select("doc_id", F.length("content").alias("len")), "doc_id"
    )
    canon = (
        sized.groupBy("cluster_id")
        .agg(F.max(F.struct("len", (-F.col("doc_id")).alias("nid"))).alias("m"))
        .select("cluster_id", (-F.col("m.nid")).alias("canonical_doc_id"))
    )
    is_canon = (
        clusters.join(canon, "cluster_id")
        .select(
            "doc_id",
            (F.col("doc_id") == F.col("canonical_doc_id")).alias("is_canonical"),
        )
    )
    q = quality_score(corpus).select("doc_id", "quality")
    g = gopher_repetition(corpus).select("doc_id", "gopher_pass")
    dec = decontaminate(corpus).select("doc_id", "contaminated")
    dng = dup_ngram_stats(corpus).select("doc_id", "dup_ngram_frac")
    out = (
        dec.join(is_canon, "doc_id")
        .join(q, "doc_id")
        .join(g, "doc_id")
        .join(dng, "doc_id")
    )
    keep = (
        F.col("is_canonical")
        & (F.col("quality") >= min_quality)
        & F.col("gopher_pass")
        & ~F.col("contaminated")
        & (F.coalesce(F.col("dup_ngram_frac"), F.lit(0.0)) <= max_dup_ngram)
    )
    return out.select(
        "doc_id",
        "is_canonical",
        "quality",
        "gopher_pass",
        "contaminated",
        "dup_ngram_frac",
        keep.alias("keep"),
    )


def hygiene_keep_sql(
    *,
    min_quality: float = 0.15,
    max_dup_ngram: float = DUP_NGRAM_MAX,
) -> str:
    """Exact DuckDB twin: the same five signal CTEs (each the SQL twin
    of its standalone driver entry) joined on doc_id."""
    from .decontam import decontaminate_sql
    from .dedup import dup_ngram_stats_sql
    from .textops import gopher_repetition_sql, quality_score_sql

    qsql = quality_score_sql().strip().rstrip(";")
    gsql = gopher_repetition_sql().strip().rstrip(";")
    dsql = decontaminate_sql().strip().rstrip(";")
    ngsql = dup_ngram_stats_sql().strip().rstrip(";")
    return f"""
WITH RECURSIVE {_closure_ctes()},
canon AS (
  SELECT cluster_id, doc_id AS canonical_doc_id FROM (
    SELECT c.cluster_id, c.doc_id,
           row_number() OVER (PARTITION BY c.cluster_id
                              ORDER BY length(d.text) DESC, c.doc_id ASC) AS rn
    FROM clus c JOIN documents d ON d.doc_id = c.doc_id
  ) WHERE rn = 1
),
iscan AS (
  SELECT c.doc_id, (c.doc_id = n.canonical_doc_id) AS is_canonical
  FROM clus c JOIN canon n ON n.cluster_id = c.cluster_id
),
q AS ({qsql}),
g AS ({gsql}),
dec AS ({dsql}),
dng AS ({ngsql})
SELECT dec.doc_id, i.is_canonical, q.quality, g.gopher_pass,
       dec.contaminated, dng.dup_ngram_frac,
       (i.is_canonical AND q.quality >= {min_quality} AND g.gopher_pass
        AND NOT dec.contaminated
        AND coalesce(dng.dup_ngram_frac, 0.0) <= {max_dup_ngram}) AS keep
FROM dec
JOIN iscan i ON i.doc_id = dec.doc_id
JOIN q ON q.doc_id = dec.doc_id
JOIN g ON g.doc_id = dec.doc_id
JOIN dng ON dng.doc_id = dec.doc_id
"""
