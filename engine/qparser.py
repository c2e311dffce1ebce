"""Lucene-style query-string front door (``QueryParser`` analog).

The reference family exposes each query shape as its own route; real
search frontends also need ONE string syntax that composes them. This
module parses a Lucene-ish query string and executes it by composing
the engine's existing operators — boolean must/should/must-not
(engine/boolean.py), exact phrase (engine/phrase.py), prefix wildcard
expansion (engine/wildcard.py), fuzzy expansion (engine/fuzzy.py) and
metadata filters (Lucene FILTER semantics, engine/index.filtered_topk)
— under a single pinned scoring rule.

Grammar (whitespace-separated clauses)
--------------------------------------
- ``term``            SHOULD: contributes to the score.
- ``+term``           MUST: doc must contain it (still scores).
- ``-term``           MUST_NOT: doc must not contain it (never scores).
- ``"a b c"``         phrase, MUST: must occur contiguously (its terms
                      score as ordinary terms); ``-"a b c"`` negates.
- ``pre*``            prefix wildcard: expanded against the UNSTEMMED
                      dictionary, capped ``max_expansions`` by
                      (df DESC, term ASC) — Lucene's maxExpansions
                      guard; expansions are SHOULD terms.
- ``term~``           fuzzy: dictionary terms within edit distance 1
                      (same candidate rule as engine/fuzzy.py),
                      capped ``max_expansions`` by (dist ASC, df DESC,
                      term ASC); expansions are SHOULD terms.
- ``term^2.5``        boost (Lucene ``^``): the term's BM25 partial is
                      multiplied by the boost (deboosting with < 1
                      works too). Allowed on plain and ``+`` terms;
                      rejected on ``-``/wildcard/fuzzy/field/phrase
                      clauses. Per term the EXPLICIT boost wins over
                      the implicit 1.0 of a bare appearance; multiple
                      explicit boosts of one term take the max.
- ``repo:x`` ``path:p`` ``lang:l``
                      metadata filter (AND of all): gates WHICH docs
                      may be emitted; ``path:`` is a prefix match.
                      Like a Lucene FILTER clause it never rescores.
- ``+``/``-`` on a wildcard/fuzzy/field clause is rejected — a
  MUST over an expansion set has no pinned Lucene meaning.

Pinned semantics (cross-engine, the DuckDB mirror is the oracle)
----------------------------------------------------------------
- Clause text is tokenized with the engine's UNSTEMMED pipeline (like
  boolean/phrase: expansions and user-visible syntax over stemmed
  forms would be wrong). A clause that tokenizes to nothing (pure
  stopword) drops silently — Lucene analyzers do the same.
- Scoring term set = DISTINCT(must ∪ should ∪ positive-phrase terms ∪
  expansions), each with weight 1 (Lucene's scoring-boolean rewrite)
  unless an explicit ``^boost`` sets it (resolve_scoring_weights).
  must_not terms never score.
- A doc matches iff it contains ALL must terms, NONE of the must_not
  terms, every positive phrase contiguously, no negated phrase, and
  passes every metadata filter. Containing ≥1 scoring term is implied
  by emission: only scored docs can be returned, which IS Lucene's
  "at least one SHOULD when no MUST" rule.
- score = Σ BM25(term, doc) over scoring terms present in the doc,
  with FULL-corpus weights (filters gate emission only); ties break
  (score DESC, doc_id ASC); ``round_scores`` applies the repo's
  rounded-sort-key float discipline.

Scale shape
-----------
Recompute: expansions are ordered limits over the (tiny) dictionary
collected to ≤ max_expansions driver rows per clause; the match
predicate is one whole-stage-codegen pass over the token array (same
HOF-binding discipline as boolean/phrase); scoring reuses
bm25_scored_terms (broadcast query terms, pruned join). Index-backed
(engine/index.IndexReader.query_string_topk): constraints become
per-shard keep/drop doc_id frames — must/must_not from isin-pruned
posting blocks, phrases from isin-pruned position blocks, metadata
from σ(doc_stats) — intersected survivor-sized, then COGROUPED into
the block-max kernel as a keep-mask (the filtered_topk mechanism), so
θ-pruning stays rank-safe under every constraint and nothing
corpus-sized ever visits the driver.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tokenizer import tokenize

MAX_EXPANSIONS = 50
FIELDS = ("repo", "path", "lang")

_QUOTED_RE = re.compile(r'([+-]?)"([^"]*)"')
_FIELD_RE = re.compile(r"^([a-z_]+):(.+)$")
_BOOST_RE = re.compile(r"^(.+)\^(\d+(?:\.\d+)?)$")


@dataclass(frozen=True)
class ParsedQuery:
    must: tuple[str, ...] = ()
    should: tuple[str, ...] = ()
    must_not: tuple[str, ...] = ()
    # (terms, negated)
    phrases: tuple[tuple[tuple[str, ...], bool], ...] = ()
    prefixes: tuple[str, ...] = ()
    fuzzies: tuple[str, ...] = ()
    filters: tuple[tuple[str, str], ...] = ()
    # explicit ^boosts, one (term, boost) per boosted-clause token
    boosts: tuple[tuple[str, float], ...] = ()

    @property
    def has_constraints(self) -> bool:
        return bool(self.must or self.must_not or self.phrases or self.filters)


def parse_query(qs: str) -> ParsedQuery:
    """Parse a query string into clause sets; see module docstring."""
    must: list[str] = []
    should: list[str] = []
    must_not: list[str] = []
    phrases: list[tuple[tuple[str, ...], bool]] = []
    prefixes: list[str] = []
    fuzzies: list[str] = []
    filters: list[tuple[str, str]] = []
    boosts: list[tuple[str, float]] = []

    def _phrase(m: re.Match) -> str:
        sign, text = m.group(1), m.group(2)
        if sign == "+":
            sign = ""  # phrases are MUST already
        terms = tuple(tokenize(text, use_stem=False))
        if terms:
            phrases.append((terms, sign == "-"))
        return " "

    rest = _QUOTED_RE.sub(_phrase, qs)
    for raw in rest.split():
        sign = ""
        if raw[0] in "+-":
            sign, raw = raw[0], raw[1:]
        if not raw:
            continue
        if raw.startswith("^"):
            raise ValueError(
                f"{raw}: a boost needs a plain term to its left "
                "(phrase boosts are not supported)"
            )
        boost: float | None = None
        bm = _BOOST_RE.match(raw)
        if bm:
            raw, boost = bm.group(1), float(bm.group(2))
        fm = _FIELD_RE.match(raw)
        if fm and fm.group(1) in FIELDS:
            if sign:
                raise ValueError(f"{sign}{raw}: +/- on a field filter is not supported")
            if boost is not None:
                raise ValueError(f"{raw}^{boost}: boost on a field filter is not supported")
            filters.append((fm.group(1), fm.group(2)))
            continue
        if raw.endswith("*"):
            if sign:
                raise ValueError(f"{sign}{raw}: +/- on a wildcard clause is not supported")
            if boost is not None:
                raise ValueError(f"{raw}^{boost}: boost on a wildcard clause is not supported")
            p = raw[:-1].lower()
            if p:
                prefixes.append(p)
            continue
        if raw.endswith("~"):
            if sign:
                raise ValueError(f"{sign}{raw}: +/- on a fuzzy clause is not supported")
            if boost is not None:
                raise ValueError(f"{raw}^{boost}: boost on a fuzzy clause is not supported")
            toks = tokenize(raw[:-1], use_stem=False)
            fuzzies.extend(toks[:1])
            continue
        if sign == "-" and boost is not None:
            raise ValueError(
                f"-{raw}^{boost}: boost on a must_not clause is not "
                "supported (excluded docs never score)"
            )
        toks = tokenize(raw, use_stem=False)
        dst = must_not if sign == "-" else (must if sign == "+" else should)
        dst.extend(toks)
        if boost is not None:
            boosts.extend((t, boost) for t in toks)

    m = sorted(set(must))
    return ParsedQuery(
        must=tuple(m),
        should=tuple(t for t in sorted(set(should)) if t not in m),
        must_not=tuple(sorted(set(must_not))),
        phrases=tuple(phrases),
        prefixes=tuple(prefixes),
        fuzzies=tuple(fuzzies),
        filters=tuple(filters),
        boosts=tuple(sorted(set(boosts))),
    )


# ----------------------------------------------------- expansion resolve

def resolve_scoring_terms(
    spark: SparkSession,
    dictionary: DataFrame,
    parsed: ParsedQuery,
    max_expansions: int = MAX_EXPANSIONS,
) -> list[str]:
    """DISTINCT sorted scoring-term set (module docstring). Expansion
    collects are ≤ max_expansions driver rows per wildcard/fuzzy clause
    — the deliberate k-row cut (the dictionary side is an ordered limit
    over a pruned scan, never corpus-sized)."""
    from .fuzzy import fuzzy_terms
    from .wildcard import prefix_expansions

    terms: set[str] = set(parsed.must) | set(parsed.should)
    for ph, neg in parsed.phrases:
        if not neg:
            terms.update(ph)
    for p in parsed.prefixes:
        exp = prefix_expansions(dictionary, p, max_expansions)
        terms.update(r["term"] for r in exp.select("term").collect())
    for t in parsed.fuzzies:
        cand = fuzzy_terms(spark, dictionary, t, 1, k=max_expansions)
        terms.update(r["term"] for r in cand.select("term").collect())
    return sorted(terms)


def resolve_scoring_weights(
    spark: SparkSession,
    dictionary: DataFrame,
    parsed: ParsedQuery,
    max_expansions: int = MAX_EXPANSIONS,
) -> dict[str, float]:
    """term → scoring weight: 1.0 for every resolved scoring term
    (resolve_scoring_terms) unless an explicit ``^boost`` overrides it;
    multiple explicit boosts of one term take the max (pinned — the
    SQL mirror is coalesce(max(boost), 1.0) per term)."""
    terms = resolve_scoring_terms(spark, dictionary, parsed, max_expansions)
    w = {t: 1.0 for t in terms}
    explicit: dict[str, float] = {}
    for t, b in parsed.boosts:
        if t in w:
            explicit[t] = max(explicit.get(t, b), b)
    w.update(explicit)
    return w


# ------------------------------------------------------------ recompute

def _match_cond_toks(toks, parsed: ParsedQuery):
    """Token-array part of the match predicate (must / must_not), bound
    to an already-wrapped token attribute (see engine/boolean.py for
    why the caller must wrap)."""
    cond = F.lit(True)
    for t in parsed.must:
        cond = cond & F.array_contains(toks, t)
    for t in parsed.must_not:
        cond = cond & ~F.array_contains(toks, t)
    return cond


def _meta_cond(parsed: ParsedQuery):
    cond = F.lit(True)
    for fld, val in parsed.filters:
        if fld == "path":
            cond = cond & F.col("path").startswith(val)
        else:
            cond = cond & (F.col(fld) == val)
    return cond


def query_string_topk(
    spark: SparkSession,
    corpus: DataFrame,
    qs: str,
    k: int = 10,
    *,
    max_expansions: int = MAX_EXPANSIONS,
    round_scores: int | None = None,
    tokens: DataFrame | None = None,
) -> DataFrame:
    """(rank, doc_id, score) — parse + execute a query string against
    the corpus (recompute path). DuckDB mirror: query_string_sql."""
    from .build import dictionary_df, tokens_df
    from .phrase import phrase_occurrences_col
    from .query import bm25_scored_terms
    from .ranking import _ranked
    from .textops import tokens_filtered_col

    parsed = parse_query(qs)
    # toks feeds the dictionary (expansions) AND the scoring join
    toks = tokens if tokens is not None else tokens_df(corpus, use_stem=False).persist()
    weights = resolve_scoring_weights(
        spark, dictionary_df(toks), parsed, max_expansions
    )
    if not weights:
        return spark.createDataFrame([], "rank int, doc_id long, score double")

    qterms = spark.createDataFrame(
        sorted(weights.items()), "term string, qtf double"
    )
    scored = bm25_scored_terms(corpus, qterms, use_stem=False, tokens=toks)
    agg = scored.groupBy("doc_id").agg(F.sum("partial_score").alias("score"))

    if parsed.has_constraints:
        matched = corpus.where(_meta_cond(parsed))
        if parsed.must or parsed.must_not:
            # bind the token array ONCE (HOF-rebinding discipline,
            # engine/boolean.py): a bare projection gets inlined back
            # into every array_contains probe by CollapseProject
            wrapped = F.element_at(
                F.transform(
                    F.array(tokens_filtered_col(F.col("content"))),
                    lambda t: F.struct(_match_cond_toks(t, parsed).alias("ok")),
                ),
                1,
            )
            matched = matched.where(wrapped["ok"])
        for ph, neg in parsed.phrases:
            occ = phrase_occurrences_col(F.col("content"), list(ph))
            matched = matched.where(occ == 0 if neg else occ > 0)
        agg = agg.join(matched.select("doc_id"), "doc_id")

    if round_scores is not None:
        agg = agg.select("doc_id", F.round("score", round_scores).alias("score"))
    return _ranked(agg, "score", k)


# ------------------------------------------------------------------ SQL

def _sq(s: str) -> str:
    return s.replace("'", "''")


def query_string_sql(
    qs: str,
    k: int = 10,
    *,
    max_expansions: int = MAX_EXPANSIONS,
    round_scores: int | None = None,
) -> str:
    """DuckDB mirror of query_string_topk over the driver `documents`
    view (doc_id, text, lang, source). Field mapping of the corpus
    adapter engine/io.documents_as_corpus: repo → source,
    path → 'doc/' || doc_id, lang → lang."""
    from .phrase import _phrase_list_sql, _tokd_cte

    parsed = parse_query(qs)

    # -- scoring term set: exact terms + in-SQL expansions ------------
    # (term, boost-or-NULL) appearances; per term the final weight is
    # coalesce(max(boost), 1.0) — the resolve_scoring_weights pin
    exact = set(parsed.must) | set(parsed.should)
    for ph, neg in parsed.phrases:
        if not neg:
            exact.update(ph)
    parts = []
    if exact:
        vals = ", ".join(
            f"('{_sq(t)}', NULL::DOUBLE)" for t in sorted(exact)
        )
        parts.append(f"SELECT term, b FROM (VALUES {vals}) v(term, b)")
    if parsed.boosts:
        vals = ", ".join(
            f"('{_sq(t)}', {float(b)!r}::DOUBLE)" for t, b in parsed.boosts
        )
        parts.append(f"SELECT term, b FROM (VALUES {vals}) v(term, b)")
    for p in parsed.prefixes:
        parts.append(
            f"SELECT term, NULL::DOUBLE AS b FROM (SELECT term FROM dict "
            f"WHERE starts_with(term, '{_sq(p)}') "
            f"ORDER BY df DESC, term LIMIT {int(max_expansions)})"
        )
    for t in parsed.fuzzies:
        parts.append(
            f"SELECT term, NULL::DOUBLE AS b FROM (SELECT term FROM dict "
            f"WHERE levenshtein(term, '{_sq(t)}') <= 1 "
            f"ORDER BY levenshtein(term, '{_sq(t)}'), df DESC, term "
            f"LIMIT {int(max_expansions)})"
        )
    if not parts:
        return (
            "SELECT 0::INTEGER AS rank, 0::BIGINT AS doc_id, "
            "0::DOUBLE AS score WHERE false"
        )
    q_cte = (
        "q AS (SELECT term, coalesce(max(b), 1.0)::DOUBLE AS qtf FROM ("
        + " UNION ALL ".join(parts)
        + ") GROUP BY term)"
    )

    # -- match predicate ----------------------------------------------
    conds = []
    if parsed.must:
        conds.append(f"list_has_all(toks, {_phrase_list_sql(list(parsed.must))})")
    if parsed.must_not:
        conds.append(
            f"NOT list_has_any(toks, {_phrase_list_sql(list(parsed.must_not))})"
        )
    for ph, neg in parsed.phrases:
        m = len(ph)
        occ = (
            f"len(list_filter(range(1, len(toks) - {m} + 2), "
            f"i -> toks[i:i + {m - 1}] = {_phrase_list_sql(list(ph))}))"
        )
        conds.append(f"{occ} = 0" if neg else f"{occ} > 0")
    for fld, val in parsed.filters:
        if fld == "repo":
            conds.append(f"d.source = '{_sq(val)}'")
        elif fld == "lang":
            conds.append(f"d.lang = '{_sq(val)}'")
        else:  # path prefix over the adapter's synthetic path
            conds.append(f"starts_with('doc/' || d.doc_id, '{_sq(val)}')")
    where = (" WHERE " + " AND ".join(conds)) if conds else ""

    rnd = 6 if round_scores is None else int(round_scores)
    return f"""
WITH {_tokd_cte()},
tfv AS (SELECT doc_id, term, count(*)::BIGINT AS tf
        FROM (SELECT doc_id, unnest(toks) AS term FROM tokd) GROUP BY doc_id, term),
dl AS (SELECT d.doc_id, coalesce(sum(tfv.tf), 0)::BIGINT AS doc_len
       FROM documents d LEFT JOIN tfv USING (doc_id) GROUP BY d.doc_id),
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doc_len)::DOUBLE AS avgdl FROM dl),
dict AS (SELECT term, count(*)::BIGINT AS df FROM tfv GROUP BY term),
{q_cte},
match AS (SELECT t.doc_id FROM tokd t JOIN documents d USING (doc_id){where}),
scored AS (
  SELECT tfv.doc_id,
         q.qtf * ln(1.0 + (s.n_docs - dict.df + 0.5) / (dict.df + 0.5))
               * least(tfv.tf, 65535) * 2.5
               / (least(tfv.tf, 65535) + 1.5 * (1.0 - 0.75 + 0.75 * dl.doc_len / s.avgdl))
           AS partial
  FROM tfv JOIN q USING (term) JOIN dict USING (term) JOIN dl USING (doc_id)
  JOIN match USING (doc_id)
  CROSS JOIN stats s
),
agg AS (SELECT doc_id, round(sum(partial), {rnd}) AS score FROM scored GROUP BY doc_id)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::INTEGER AS rank,
       doc_id, score
FROM agg ORDER BY score DESC, doc_id ASC LIMIT {int(k)}
"""
