"""Pure-Python/numpy reference oracle: exhaustive BM25 over a corpus.

SURVEY.md §0/§5.2: the reference snapshot at /root/reference was never
materialized, so THIS module is the in-repo embodiment of "the reference
engine". The north_rule's rank-identity requirement (BASELINE.json:14)
is checked against this oracle. It is deliberately the dumbest correct
implementation: dict/Counter index, exhaustive OR scoring, no Spark, no
pruning — mirroring the reference family's design (SURVEY.md §3.2).

Pinned semantics (SURVEY.md §5.3):
  (a) idf = ln(1 + (N - df + 0.5) / (df + 0.5))
  (b) tf capped at 65535 (reference 2-byte posting encoding)
  (c) top-k tiebreak: descending score, then ASCENDING doc_id
  (d) repeated query terms multiply: score uses query term frequency
  (e) stemming ON for the primary index (configurable for the
      unstemmed SQL-checked variant)
BM25 constants k1=1.5, b=0.75 (BASELINE.json:6).
"""

from __future__ import annotations

import math
from collections import Counter

from engine import BM25_K1, BM25_B, TF_CAP
from engine.tokenizer import tokenize


class OracleIndex:
    """In-memory inverted index (the reference's pickled-dicts analog)."""

    def __init__(self, docs: dict[int, str], *, use_stem: bool = True) -> None:
        self.use_stem = use_stem
        self.postings: dict[str, list[tuple[int, int]]] = {}
        self.df: Counter[str] = Counter()
        self.cf: Counter[str] = Counter()
        self.doc_len: dict[int, int] = {}
        for doc_id in sorted(docs):
            toks = tokenize(docs[doc_id], use_stem=use_stem)
            tf = Counter(toks)
            self.doc_len[doc_id] = sum(tf.values())
            for term, f in tf.items():
                f = min(f, TF_CAP)
                self.postings.setdefault(term, []).append((doc_id, f))
                self.df[term] += 1
                self.cf[term] += f
        # postings sorted by doc_id (iteration over sorted(docs) ensures it)
        self.N = len(docs)
        self.avgdl = (sum(self.doc_len.values()) / self.N) if self.N else 0.0

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))

    def bm25_topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Exhaustive union scoring → top-k [(doc_id, score)]."""
        qtf = Counter(tokenize(query, use_stem=self.use_stem))
        scores: dict[int, float] = {}
        for term, q_freq in qtf.items():
            pl = self.postings.get(term)
            if not pl:
                continue
            idf = self.idf(term)
            for doc_id, tf in pl:
                dl = self.doc_len[doc_id]
                denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / self.avgdl)
                s = q_freq * idf * tf * (BM25_K1 + 1.0) / denom
                scores[doc_id] = scores.get(doc_id, 0.0) + s
        ranked = sorted(scores.items(), key=lambda it: (-it[1], it[0]))
        return ranked[:k]


def golden_topk_frame(docs: dict[int, str], queries: list[dict], k: int = 10,
                      *, use_stem: bool = True):
    """Build the FIXTURES.md §3 golden frame: (query_id, rank, doc_id, score)."""
    import pandas as pd

    idx = OracleIndex(docs, use_stem=use_stem)
    rows = []
    for q in queries:
        for rank, (doc_id, score) in enumerate(idx.bm25_topk(q["text"], k), start=1):
            rows.append((q["query_id"], rank, doc_id, score))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
