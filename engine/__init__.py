"""PySpark-native inverted-index build + BM25 query engine.

A brand-new engine with the query/data-processing capabilities of the
reference ``RonitTsysar/Search_Engine`` (see SURVEY.md §0: the reference
snapshot was never materialized at ``/root/reference`` — BASELINE.json is
the binding spec, and ``oracle/bm25_ref.py`` is the in-repo embodiment of
the reference semantics).

Layout
------
- :mod:`engine.tokenizer`   — regex word-split + stopwords + Porter stemming
  (SURVEY.md §2.2 P1-P3), vectorized for pandas batches.
- :mod:`engine.codec`       — delta-gap + varint posting compression
  (SURVEY.md §2.6 Q6), pure numpy.
- :mod:`engine.build`       — distributed index build (SURVEY.md §3.1):
  tokenize → tf → salted term-bucket repartition → compressed posting
  blocks + dictionary + doc stats + manifest, checkpoint-resumable.
- :mod:`engine.query`       — BM25 top-k: exhaustive DataFrame path and
  index-backed block-max WAND path (SURVEY.md §3.2, §2.6 Q5).
- :mod:`engine.io`          — corpus source abstraction (Iceberg in prod,
  parquet in sandbox) + driver-testdata adapter (SURVEY.md §1.4).
- :mod:`engine.textops`     — training-data-pipeline text operators
  (lang-id, quality, token counts, fingerprints).
- :mod:`engine.dedup`       — exact / MinHash-LSH / SimHash / n-gram
  Jaccard deduplication + cross-doc duplicated-n-gram stats.
- :mod:`engine.decontam`    — benchmark decontamination (GPT-3 13-gram
  collision rule, broadcast eval-gram build side).
- :mod:`engine.lm`          — CCNet-style bigram-LM quality scoring
  (reference-split-trained, Laplace-smoothed).
- :mod:`engine.sim`         — embedding cosine top-k (brute force,
  sign-LSH single/multi-probe, IVF, PQ/IVF-PQ) + near-dup pairs.
- :mod:`engine.cluster`     — near-dup connected components + canonical
  selection + composed clean_corpus.
- :mod:`engine.sampling`    — deterministic hash/stratified sampling,
  token packing, fixed-token chunk plans, domain mix weights.
- :mod:`engine.merge`       — distributed segment merge (incremental
  ingestion; byte-identical to a full rebuild).
- :mod:`engine.reindex`     — rebuild from the index's own docstore
  (analyzer switch / reshard / tombstone compaction, no source access;
  byte-identical to a fresh build over the live corpus).
- :mod:`engine.ranking`     — tf-idf cosine, title/anchor match,
  weighted fusion (± PageRank), fixed-iteration PageRank.
- :mod:`engine.metrics`     — precision@k / MAP@40 retrieval evaluation.
- :mod:`engine.porter_sql`  — generated DuckDB SQL Porter stemmer
  (oracle-side twin of engine.stemmer).
- search-API layer — :mod:`engine.qparser` (Lucene query-string
  grammar), :mod:`engine.bm25f` (fielded BM25F), :mod:`engine.collapse`
  (field collapsing), :mod:`engine.searchafter` (cursor pagination),
  :mod:`engine.explain` (score breakdown), :mod:`engine.rescore`
  (two-phase rescoring), :mod:`engine.sortby` (sort-by-field),
  :mod:`engine.phrase` / :mod:`engine.positions` (positional search),
  :mod:`engine.boolean`, :mod:`engine.fuzzy` (incl. did_you_mean),
  :mod:`engine.wildcard` (prefix + regexp), :mod:`engine.mlt`,
  :mod:`engine.facets`, :mod:`engine.aggs` (ES aggregations),
  :mod:`engine.funcscore` (function_score / boosting /
  minimum_should_match), :mod:`engine.synonyms`,
  :mod:`engine.federated`, :mod:`engine.percolate`.
- :mod:`engine.frontend`    — reference-API Flask serving facade.
"""

__version__ = "0.1.0"

# BM25 constants pinned by BASELINE.json:6 ("BM25 (k1=1.5, b=0.75)").
BM25_K1 = 1.5
BM25_B = 0.75

# tf is capped at the reference's 2-byte posting encoding bound
# (SURVEY.md §5.3(b): TUPLE_SIZE=6 → 2-byte tf, TF_MASK=2**16-1).
TF_CAP = 65535

# Largest dictionary (term → df map) the norms stages will collect()
# and broadcast; beyond this they fall back to a shuffle join. 5M terms
# ≈ a few hundred MB driver-side — comfortably broadcastable; a
# 10^8-term source-code vocabulary takes the join path. Shared by
# engine/index.py stage 4 and engine/merge.py doc_norms so build and
# merge have the SAME scale contract.
BROADCAST_DICT_MAX_TERMS = 5_000_000

# title field = first TITLE_TOKENS stopword-filtered (unstemmed) tokens
# of the content (engine/ranking.py Q4; the driver corpus has no title
# column). Lives here because both the tokenizer (build-time carry) and
# ranking (recompute path) need it without a circular import.
TITLE_TOKENS = 12
