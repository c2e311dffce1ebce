"""Retrieval-evaluation metrics: precision@k and MAP@cutoff.

The reference family's ONLY test idiom (SURVEY.md §5.1) is running a
fixed query set through the engine and scoring the ranked results
against relevance lists with precision@k / MAP@40 in an evaluation
notebook. This module reproduces that harness over the engine's
tagged-result frame (query_id, rank, doc_id, score) — the shape
run_queries.py writes — and a golden frame of the same shape built by
the in-repo oracle (oracle/bm25_ref.golden_topk_frame).

Relevance semantics: a query's relevant set is the golden frame's doc
set for that query (the oracle's top-k IS the relevance list, as in the
staff evaluation where the provided queries_train.json lists relevant
doc ids per query). Metrics math is the standard IR definition:

  precision@k(q)  = |top-k(q) ∩ relevant(q)| / k
  AP@c(q)         = (Σ_{i ≤ c, d_i relevant} precision@i) / min(|relevant|, c)
  MAP@c           = mean over queries of AP@c

Evaluation frames are queries × k rows — driver-side pandas is the
right scale (this is NOT a corpus-sized collect; the reference computes
the same thing over 30 queries in a notebook).
"""

from __future__ import annotations

import pandas as pd

MAP_CUTOFF = 40


def precision_at_k(ranked: list[int], relevant: set[int], k: int) -> float:
    """|top-k ∩ relevant| / k (k fixed, not len(ranked) — missing
    results count against the engine, as in the reference eval)."""
    if k <= 0:
        return 0.0
    return len(set(ranked[:k]) & relevant) / float(k)


def average_precision(
    ranked: list[int], relevant: set[int], cutoff: int = MAP_CUTOFF
) -> float:
    """AP@cutoff with the standard min(|relevant|, cutoff) normalizer."""
    if not relevant:
        return 0.0
    hits = 0
    acc = 0.0
    for i, doc in enumerate(ranked[:cutoff], start=1):
        if doc in relevant:
            hits += 1
            acc += hits / i
    denom = min(len(relevant), cutoff)
    return acc / denom if denom else 0.0


def evaluate_run(
    run: pd.DataFrame,
    golden: pd.DataFrame,
    *,
    k: int = 10,
    cutoff: int = MAP_CUTOFF,
) -> dict:
    """Score a tagged result frame against a golden frame (both
    (query_id, rank, doc_id, ...)). Queries present in golden but
    absent from the run score 0 — a missing query is a failure, not a
    skip. Returns {"map", "mean_p_at_k", "n_queries", "per_query"}."""
    run_by_q = {
        qid: g.sort_values("rank")["doc_id"].tolist()
        for qid, g in run.groupby("query_id")
    }
    per_query = {}
    for qid, g in golden.groupby("query_id"):
        relevant = set(g["doc_id"].tolist())
        ranked = run_by_q.get(qid, [])
        per_query[str(qid)] = {
            "p_at_k": round(precision_at_k(ranked, relevant, k), 6),
            "ap": round(average_precision(ranked, relevant, cutoff), 6),
        }
    n = len(per_query)
    return {
        "map": round(sum(v["ap"] for v in per_query.values()) / n, 6) if n else 0.0,
        "mean_p_at_k": round(sum(v["p_at_k"] for v in per_query.values()) / n, 6)
        if n
        else 0.0,
        "k": k,
        "cutoff": cutoff,
        "n_queries": n,
        "per_query": per_query,
    }
