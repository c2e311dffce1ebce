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
    """Per-document term→tf dicts for a batch (build-path helper).

    Counts RAW tokens in C (collections.Counter) and applies
    stopword-drop + stemming per DISTINCT raw token via a batch-level
    memo — the Python-side loop runs over distinct tokens per doc
    (~half the total) instead of every token, and stemming runs once
    per distinct raw token per batch. Semantics identical to
    ``Counter(tokenize(text))``."""
    found = texts.str.lower().str.findall(RE_WORD)
    return _tf_from_found(found, use_stem=use_stem)


def _tf_from_found(found: pd.Series, *, use_stem: bool) -> list[dict[str, int]]:
    from collections import Counter

    memo: dict[str, str | None] = {}
    res: list[dict[str, int]] = []
    for toks in found:
        d: dict[str, int] = {}
        for raw, n in Counter(toks).items():
            if raw in memo:
                k = memo[raw]
            else:
                if raw in ALL_STOPWORDS:
                    k = None
                elif use_stem:
                    k = porter_stem(raw)
                else:
                    k = raw
                memo[raw] = k
            if k is not None:
                d[k] = d.get(k, 0) + n
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


def batch_doc_token_arrays(
    doc_ids: np.ndarray, texts: pd.Series, *, use_stem: bool = True
) -> pd.DataFrame:
    """Document-ordered array form of ``batch_doc_terms``: one row per
    doc — (doc_id, terms: list[str], tfs: list[int], doc_len).

    This is the index build's checkpoint representation: the exploded
    (doc, term, tf) stream is ~50-150 rows/doc, and writing it row-wise
    makes the stage-1 checkpoint the largest I/O of the whole build;
    per-doc arrays carry the same information in ~3x fewer bytes and
    50x fewer rows (doc_id/doc_len stored once per doc). Zero-token
    docs ARE emitted (empty arrays, doc_len=0) so doc stats need no
    corpus anti-join.

    ``title_terms`` (first TITLE_TOKENS stopword-filtered UNSTEMMED
    tokens, order-preserving) rides along from the same regex pass —
    deriving it here saves the title-terms build stage a SECOND full
    corpus scan + tokenization (it was ~23% of build wall-clock)."""
    from . import TITLE_TOKENS

    found = texts.str.lower().str.findall(RE_WORD)
    tf_dicts = _tf_from_found(found, use_stem=use_stem)
    terms = [list(d.keys()) for d in tf_dicts]
    tfs = [list(d.values()) for d in tf_dicts]

    def _title(toks: list[str]) -> list[str]:
        out: list[str] = []
        for t in toks:
            if t not in ALL_STOPWORDS:
                out.append(t)
                if len(out) == TITLE_TOKENS:
                    break
        return out

    return pd.DataFrame(
        {
            "doc_id": np.asarray(doc_ids, dtype=np.int64),
            "terms": terms,
            "tfs": tfs,
            "doc_len": np.asarray([sum(v) for v in tfs], dtype=np.int64),
            "title_terms": [_title(toks) for toks in found],
        }
    )
