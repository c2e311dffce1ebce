"""Tokenization: regex word-split + stopword removal + optional stemming.

SURVEY.md §2.2 P1-P3 / BASELINE.json:6. The reference family tokenizes
with ``RE_WORD = [\\#\\@\\w](['\\-]?\\w){2,24}`` on lowercased text,
drops stopwords, and (for the stemmed index) applies Porter stemming.

Pinned semantics for THIS repo (SURVEY.md §5.3 — the reference snapshot
is unrecoverable, so these are frozen here and mirrored by the oracle
and the DuckDB oracle SQL):

- The regex uses a NON-capturing group and ``re.ASCII`` so that ``\\w``
  means ``[A-Za-z0-9_]`` — byte-identical to DuckDB/RE2 semantics and
  stable across Python versions. Tokens are 3..25 chars.
- Stopwords are removed AFTER regex matching, BEFORE stemming
  (reference order: the stopword list is unstemmed English words).
- Stemming is optional (``stem=True`` for the primary index); the
  SQL-checked driver queries use ``stem=False`` because DuckDB has no
  offline stemmer (the stemmed path is oracle-verified in pytest).

Everything here is plain Python/pandas — shared verbatim by the Spark
pandas-UDFs (engine/build.py) and the pure-Python oracle
(oracle/bm25_ref.py), which is what keeps rank-identity achievable
(SURVEY.md §7 hard part #1).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .stemmer import stem as porter_stem
from .stopwords import ALL_STOPWORDS

# Full-match, non-capturing variant of the reference token regex.
TOKEN_PATTERN = r"[#@\w](?:['\-]?\w){2,24}"
RE_WORD = re.compile(TOKEN_PATTERN, re.ASCII)

# RE2/DuckDB-compatible spelling of the same pattern (single-quote
# escaped for SQL embedding is done by the caller).
TOKEN_PATTERN_RE2 = r"[#@\w](?:['\-]?\w){2,24}"


def tokenize(text: str, *, use_stem: bool = True) -> list[str]:
    """Tokenize ONE document/query string. The single source of truth."""
    toks = RE_WORD.findall(text.lower())
    toks = [t for t in toks if t not in ALL_STOPWORDS]
    if use_stem:
        toks = [porter_stem(t) for t in toks]
    return toks


def tokenize_series(texts: pd.Series, *, use_stem: bool = True) -> pd.Series:
    """Vectorized batch tokenization for pandas-UDF use.

    ``Series.str.findall`` runs the regex in C-loop over the block;
    stopword filtering + stemming run over the (much smaller) exploded
    unique-token array with memoization via the stemmer's lru_cache.
    Returns a Series of ``list[str]`` aligned with ``texts``.
    """
    found = texts.str.lower().str.findall(RE_WORD)
    stop = ALL_STOPWORDS
    if use_stem:
        out = [
            [porter_stem(t) for t in toks if t not in stop]
            for toks in found
        ]
    else:
        out = [[t for t in toks if t not in stop] for toks in found]
    return pd.Series(out, index=texts.index)


def term_frequencies(texts: pd.Series, *, use_stem: bool = True) -> list[dict[str, int]]:
    """Per-document term→tf dicts for a batch (build-path helper)."""
    res: list[dict[str, int]] = []
    for toks in tokenize_series(texts, use_stem=use_stem):
        d: dict[str, int] = {}
        for t in toks:
            d[t] = d.get(t, 0) + 1
        res.append(d)
    return res


def batch_doc_terms(
    doc_ids: np.ndarray, texts: pd.Series, *, use_stem: bool = True
) -> pd.DataFrame:
    """Explode a batch into a (doc_id, term, tf, doc_len) frame.

    doc_len is the post-stopword token count (SURVEY.md §2.3 A5 pins
    DL = len(filtered tokens), the tf-sum), repeated per row so the
    build can derive doc stats in the same pass.
    """
    ids: list[int] = []
    terms: list[str] = []
    tfs: list[int] = []
    dls: list[int] = []
    tf_dicts = term_frequencies(texts, use_stem=use_stem)
    for doc_id, d in zip(doc_ids, tf_dicts):
        dl = sum(d.values())
        for t, tf in d.items():
            ids.append(doc_id)
            terms.append(t)
            tfs.append(tf)
            dls.append(dl)
    return pd.DataFrame(
        {
            "doc_id": np.asarray(ids, dtype=np.int64),
            "term": terms,
            "tf": np.asarray(tfs, dtype=np.int64),
            "doc_len": np.asarray(dls, dtype=np.int64),
        }
    )
