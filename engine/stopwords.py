"""Vendored English stopword list.

The reference family unions NLTK's English stopwords with a handful of
corpus-specific stopwords (SURVEY.md §2.2 P2; nltk is absent in this
sandbox, so the list is vendored as data). The NLTK English list is
public knowledge (179 words, NLTK data distribution).

``CORPUS_STOPWORDS`` is this repo's pinned corpus-specific set (the
reference's wiki-specific set is unrecoverable — SURVEY.md §0); it is
deliberately empty so the semantics stay fully determined by the
vendored list below. ``ALL_STOPWORDS`` is the set the engine AND the
oracle AND the DuckDB oracle SQL all share.
"""

from __future__ import annotations

ENGLISH_STOPWORDS: frozenset[str] = frozenset(
    """
    i me my myself we our ours ourselves you you're you've you'll you'd
    your yours yourself yourselves he him his himself she she's her hers
    herself it it's its itself they them their theirs themselves what
    which who whom this that that'll these those am is are was were be
    been being have has had having do does did doing a an the and but if
    or because as until while of at by for with about against between
    into through during before after above below to from up down in out
    on off over under again further then once here there when where why
    how all any both each few more most other some such no nor not only
    own same so than too very s t can will just don don't should
    should've now d ll m o re ve y ain aren aren't couldn couldn't didn
    didn't doesn doesn't hadn hadn't hasn hasn't haven haven't isn isn't
    ma mightn mightn't mustn mustn't needn needn't shan shan't shouldn
    shouldn't wasn wasn't weren weren't won won't wouldn wouldn't
    """.split()
)

CORPUS_STOPWORDS: frozenset[str] = frozenset()

ALL_STOPWORDS: frozenset[str] = ENGLISH_STOPWORDS | CORPUS_STOPWORDS


def stopwords_sql_list() -> str:
    """The stopword set as a SQL ``('a','b',...)`` literal (sorted,
    deterministic) for inlining into DuckDB oracle SQL."""
    quoted = ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(ALL_STOPWORDS))
    return "(" + quoted + ")"
