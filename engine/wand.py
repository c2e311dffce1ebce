"""Block-max pruned top-k scoring kernel (BASELINE.json:6 "block-max
WAND pruning inside mapInPandas"; SURVEY.md §2.6 Q5).

Algorithm: block-max MaxScore, term-at-a-time — the rank-SAFE member of
the WAND family that vectorizes cleanly in numpy (document-at-a-time
WAND is a per-posting pointer chase; TAAT MaxScore does the same
pruning with whole-array ops):

1. Terms sorted by upper bound ub_t = w_t * max_block_norm desc
   (w_t = qtf_t * idf_t; norm is the query-independent BM25 factor,
   engine/postings.py).
2. OR phase: merge-accumulate full posting lists while new documents
   can still reach the current top-k floor θ (θ = k-th best partial
   score — a LOWER bound of the k-th final score, so the switch is
   conservative/rank-safe).
3. AND phase (once Σ remaining ub < θ): no unseen doc can enter the
   top-k, so only accumulator docs need finishing. Blocks are decoded
   ONLY if (a) their doc_id range intersects the accumulator
   (searchsorted on first/last_doc_id) AND (b) their block-max bound
   could still matter: acc_max + w*block_max + Σ ub_after ≥ θ.
4. After each AND-phase term, accumulator docs with
   score + Σ ub_remaining < θ are dropped (they can no longer reach
   the top-k; dropping them is rank-safe because θ only grows).

All bounds are computed in float64 and compared with ≥ (SURVEY.md §7
hard part #3). ``prune=False`` gives the exhaustive path used for the
rank-safety cross-check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .postings import decode_block, score_norm


def _merge_accumulate(
    acc_ids: np.ndarray, acc_sc: np.ndarray, ids: np.ndarray, sc: np.ndarray
):
    if acc_ids.size == 0:
        order = np.argsort(ids, kind="stable")
        return ids[order], sc[order]
    both = np.concatenate([acc_ids, ids])
    scores = np.concatenate([acc_sc, sc])
    uid, inv = np.unique(both, return_inverse=True)
    out = np.zeros(uid.size, dtype=np.float64)
    np.add.at(out, inv, scores)
    return uid, out


def _update_existing(
    acc_ids: np.ndarray, acc_sc: np.ndarray, ids: np.ndarray, sc: np.ndarray
):
    """Add sc only for ids already present in acc (AND semantics)."""
    pos = np.searchsorted(acc_ids, ids)
    pos_c = np.clip(pos, 0, acc_ids.size - 1)
    hit = acc_ids[pos_c] == ids
    np.add.at(acc_sc, pos_c[hit], sc[hit])


def _theta(acc_sc: np.ndarray, k: int) -> float:
    if acc_sc.size < k:
        return -np.inf
    return float(np.partition(acc_sc, acc_sc.size - k)[acc_sc.size - k])


def _isin_sorted(ids: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    """Boolean mask: which ids are in the SORTED int64 array."""
    pos = np.searchsorted(sorted_set, ids)
    pos = np.minimum(pos, sorted_set.size - 1)
    return sorted_set[pos] == ids


def _cursor_masks(
    acc_sc: np.ndarray,
    acc_ids: np.ndarray,
    rem: float,
    s_a: float,
    d_a: int,
    eps: float,
) -> tuple[np.ndarray, np.ndarray]:
    """(guaranteed_accepted, guaranteed_rejected) masks vs a searchAfter
    cursor whose sort key is (rounded score DESC, doc_id ASC).

    TAAT cannot know a doc's final score mid-stream, so both masks are
    one-sided certainties derived from monotonicity (partials only
    grow; ``rem`` bounds everything a doc can still gain):

    - rejected-for-sure: the PARTIAL's rounded key already sorts at or
      before the cursor — final ≥ partial, so the final key can only
      sort earlier still. With rounding granularity 2·eps, "rounds
      above s_a" is certain when partial > s_a + eps, and "rounds to
      s_a or above" when partial > s_a − eps (doc_id ≤ d_a then loses
      the asc tiebreak either way).
    - accepted-for-sure: even partial + rem rounds strictly below s_a
      (< s_a − eps), or rounds to ≤ s_a (< s_a + eps) with the doc_id
      tiebreak won (doc_id > d_a).

    Docs within eps of the boundary are neither — kept, never counted
    toward θ; the exact rounded-key filter downstream decides them."""
    if eps > 0.0:
        rejected = (acc_sc > s_a + eps) | ((acc_sc > s_a - eps) & (acc_ids <= d_a))
        u = acc_sc + rem
        accepted = (u < s_a - eps) | ((u < s_a + eps) & (acc_ids > d_a))
    else:
        rejected = (acc_sc > s_a) | ((acc_sc >= s_a) & (acc_ids <= d_a))
        u = acc_sc + rem
        accepted = (u < s_a) | ((u <= s_a) & (acc_ids > d_a))
    return accepted, rejected


def topk_shard(
    blocks: pd.DataFrame,
    weights: dict[str, float],
    avgdl: float,
    k: int,
    *,
    prune: bool = True,
    eps: float = 0.0,
    drop_ids: np.ndarray | None = None,
    keep_ids: np.ndarray | None = None,
    after: tuple[float, int] | None = None,
    bound_scale: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Score one shard's blocks for one query → (doc_ids, scores) of the
    shard-local top-k (unsorted). ``blocks`` has the BLOCKS_SCHEMA
    columns for the query's terms only.

    ``eps`` relaxes every θ-based drop to ``θ - eps``: the pruning is
    then rank-safe with respect to a sort key that rounds scores to a
    granularity of ``2·eps`` (serving passes eps = 0.5·10⁻ʳ when
    ``round_scores=r``). Without it, a doc whose unrounded score sits
    within eps below the k-th could be pruned here yet round to the SAME
    sort key as the k-th and win the doc_id-asc tiebreak downstream.

    ``drop_ids`` (a SORTED int64 array — index tombstones) removes docs
    at block-decode time in the OR phase, BEFORE they can enter the
    accumulator; every later θ drop then remains rank-safe over live
    docs only, and the AND phase needs no mask (it only updates docs
    already accumulated).

    ``keep_ids`` (a SORTED int64 array — this shard's metadata-filter
    survivors) inverts that mask: only listed docs may enter the
    accumulator, which makes θ a floor over FILTERED docs and lets
    block-max pruning engage under a filter (filtered_topk). Blocks
    whose [first_doc_id, last_doc_id] range contains no kept doc are
    skipped without decoding. Scores stay full-corpus (Lucene FILTER
    semantics — the filter gates emission, never rescores).

    ``after`` = (cursor_score, cursor_doc_id) turns the kernel into a
    Lucene ``searchAfter`` collector: only docs whose FINAL rounded sort
    key sorts strictly after the cursor may fill the page, and the heap
    stays size k (the whole point vs from+size, whose heap is
    offset+k). Because TAAT never knows a final score mid-stream, θ is
    derived from GUARANTEED-accepted docs only (partial + remaining
    upper bound already sorts after the cursor — their finals are both
    accepted and ≥ their partials, so θ is a true floor of the page's
    k-th final), and guaranteed-REJECTED docs (partial alone already
    sorts at/before the cursor; partials only grow) are evicted so they
    can never crowd the final cut. Boundary docs within eps stay until
    the exact rounded-key filter downstream. ``cursor_score`` must be
    in the SAME space the caller sorts on (the rounded score when
    ``round_scores`` is set — eps is the matching half-step).

    ``bound_scale`` multiplies every stored block-max bound. The stored
    ``block_max_norm`` is an upper bound of score_norm only at the
    avgdl the index was BUILT with; when the caller scores with a
    different (e.g. federated-global) avgdl_g, the norm ratio
    norm(avgdl_g)/norm(avgdl_b) is bounded above by
    max(1, avgdl_g/avgdl_b) (the ratio is monotone in dl and tends to
    avgdl_g/avgdl_b as dl→∞), so passing that factor keeps every
    θ-comparison rank-safe. Scores themselves are always computed
    exactly from the decoded (tf, dl) at the passed avgdl — the scale
    only loosens pruning, never changes a result."""
    if keep_ids is not None and keep_ids.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    by_term: dict[str, pd.DataFrame] = {
        t: g for t, g in blocks.groupby("term", sort=False) if t in weights
    }
    if not by_term:
        return np.empty(0, np.int64), np.empty(0, np.float64)

    term_ub = {
        t: weights[t] * bound_scale * float(g["block_max_norm"].max())
        for t, g in by_term.items()
    }
    terms = sorted(term_ub, key=lambda t: -term_ub[t])
    ubs = np.array([term_ub[t] for t in terms])
    remaining_after = np.concatenate([np.cumsum(ubs[::-1])[::-1][1:], [0.0]])

    acc_ids = np.empty(0, np.int64)
    acc_sc = np.empty(0, np.float64)

    def _acc_theta(rem: float, evict: bool) -> float:
        """θ over docs allowed to witness the top-k floor. Plain top-k:
        every accumulator doc. searchAfter: guaranteed-accepted docs
        only. ``evict`` additionally drops guaranteed-rejected docs —
        legal ONLY where no later term can re-merge them as "new" with
        a dangling partial (the AND phase, which only updates existing
        docs and is absorbing, and the final cut); during the OR phase
        rejected docs must stay so their accumulation stays complete."""
        nonlocal acc_ids, acc_sc
        if after is None:
            return _theta(acc_sc, k) - eps
        if acc_ids.size == 0:
            return -np.inf
        accepted, rejected = _cursor_masks(
            acc_sc, acc_ids, rem, after[0], after[1], eps
        )
        if evict and rejected.any():
            live = ~rejected
            acc_ids, acc_sc = acc_ids[live], acc_sc[live]
            accepted = accepted[live]
        return _theta(acc_sc[accepted], k) - eps

    for i, t in enumerate(terms):
        w = weights[t]
        g = by_term[t]
        theta = _acc_theta(ubs[i] + remaining_after[i], evict=False)
        and_phase = prune and np.isfinite(theta) and (ubs[i] + remaining_after[i]) < theta

        if not and_phase:
            # OR phase: decode every block of t, merge-accumulate
            parts_ids, parts_sc = [], []
            for row in g.itertuples(index=False):
                if keep_ids is not None:
                    # skip blocks with no filter-surviving doc at all
                    lo = np.searchsorted(keep_ids, row.first_doc_id, "left")
                    hi = np.searchsorted(keep_ids, row.last_doc_id, "right")
                    if lo >= hi:
                        continue
                ids, tfs, dls = decode_block(row)
                if keep_ids is not None:
                    m = _isin_sorted(ids, keep_ids)
                    ids, tfs, dls = ids[m], tfs[m], dls[m]
                if drop_ids is not None and drop_ids.size:
                    live = ~_isin_sorted(ids, drop_ids)
                    ids, tfs, dls = ids[live], tfs[live], dls[live]
                parts_ids.append(ids)
                parts_sc.append(w * score_norm(tfs, dls, avgdl))
            if not parts_ids:
                continue
            ids = np.concatenate(parts_ids)
            sc = np.concatenate(parts_sc)
            acc_ids, acc_sc = _merge_accumulate(acc_ids, acc_sc, ids, sc)
        else:
            if acc_ids.size == 0:
                break
            acc_max = float(acc_sc.max())
            for row in g.itertuples(index=False):
                lo = np.searchsorted(acc_ids, row.first_doc_id, side="left")
                hi = np.searchsorted(acc_ids, row.last_doc_id, side="right")
                if lo >= hi:
                    continue  # no accumulator doc in this block's range
                block_ub = w * bound_scale * row.block_max_norm
                if acc_max + block_ub + remaining_after[i] < theta:
                    continue  # even the best candidate cannot profit
                ids, tfs, dls = decode_block(row)
                _update_existing(acc_ids, acc_sc, ids, w * score_norm(tfs, dls, avgdl))
            # prune accumulator docs that can no longer reach top-k
            theta = _acc_theta(remaining_after[i], evict=True)
            if np.isfinite(theta):
                keep = acc_sc + remaining_after[i] >= theta
                acc_ids, acc_sc = acc_ids[keep], acc_sc[keep]

    if after is not None and acc_ids.size:
        # final scores are known (rem=0): evict everything that sorts
        # at/before the cursor so it cannot crowd accepted docs out of
        # the size-k cut below; boundary docs (within eps) survive for
        # the exact rounded-key filter downstream
        _, rejected = _cursor_masks(acc_sc, acc_ids, 0.0, after[0], after[1], eps)
        live = ~rejected
        acc_ids, acc_sc = acc_ids[live], acc_sc[live]

    if acc_ids.size > k:
        idx = np.argpartition(acc_sc, acc_sc.size - k)[acc_sc.size - k :]
        # θ-ties at the boundary: keep everything ≥ the k-th score
        # (minus eps, the rounding half-step) so the global merge
        # (rounded score desc, doc_id asc) can break ties exactly
        kth = acc_sc[idx].min()
        keep = acc_sc >= kth - eps
        acc_ids, acc_sc = acc_ids[keep], acc_sc[keep]
    return acc_ids, acc_sc
