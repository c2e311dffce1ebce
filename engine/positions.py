"""Positional-postings artifact + index-backed phrase serving (P7/Q7).

Extends the index family (SURVEY.md §2 addendum) with the artifact the
recompute path ``engine/phrase.py`` deliberately skipped: per
(shard, term) position blocks, so a phrase query decodes positions for
ONLY its m terms instead of re-tokenizing the corpus.

Physical layout (mirrors engine/postings.py blocks)
---------------------------------------------------
One row per (shard, term, block of ≤``POS_BLOCK_DOCS`` docs):

- ``doc_ids_blob``  delta-gap + varint doc_id run (engine/codec.py)
- ``counts_blob``   varint per-doc position counts
- ``pos_blob``      varint positions, delta-gapped WITHIN each doc
                    (first position of a doc is absolute)

Positions are 0-based offsets in the ordered, stopword-filtered,
UNSTEMMED token stream — the pinned phrase semantics of
engine/phrase.py — so the artifact is valid for stemmed and unstemmed
indexes alike.

Scale shape
-----------
Build: ONE compact corpus-sized shuffle (shard-partition the ~KB/doc
rows BEFORE tokenizing, the stage-1 trick of engine/index.py); the
exploded position stream is born co-partitioned by shard, and
``groupBy(shard, term)`` satisfies its ClusteredDistribution from that
partitioning — no postings-sized exchange (plan-tested). Query: the
``term isin`` predicate reaches the parquet scan (same J2 pushdown as
BM25 postings), then one applyInPandas per shard intersects the m
decoded streams with sorted int64 keys ``(doc_idx << 32) | (pos - j)``
and a final TakeOrderedAndProject merges shard-local top-k.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .codec import delta_decode, delta_encode, varint_decode, varint_encode
from .textops import tokens_filtered_col
from .tokenizer import tokenize

POS_BLOCK_DOCS = 128

POS_SCHEMA = (
    "shard int, term string, block_id int, n_docs int, "
    "first_doc_id long, last_doc_id long, "
    "doc_ids_blob binary, counts_blob binary, pos_blob binary"
)
POS_COLUMNS = [f.split(" ")[0] for f in POS_SCHEMA.split(", ")]


# ------------------------------------------------------------- build

def _encode_group(shard: int, term: str, doc: np.ndarray, pos: np.ndarray):
    """(doc_id, pos) rows of one (shard, term) → block rows."""
    order = np.lexsort((pos, doc))
    doc = doc[order]
    pos = pos[order].astype(np.int64)
    udocs, starts, counts = np.unique(doc, return_index=True, return_counts=True)
    # delta-gap positions, reset at every doc boundary
    dp = pos.copy()
    dp[1:] -= pos[:-1]
    dp[starts] = pos[starts]
    rows = []
    for b, s in enumerate(range(0, udocs.size, POS_BLOCK_DOCS)):
        d = udocs[s : s + POS_BLOCK_DOCS]
        c = counts[s : s + POS_BLOCK_DOCS]
        lo = int(starts[s])
        hi = lo + int(c.sum())
        rows.append(
            (
                shard,
                term,
                b,
                int(d.size),
                int(d[0]),
                int(d[-1]),
                delta_encode(d),
                varint_encode(c.astype(np.uint64)),
                varint_encode(dp[lo:hi].astype(np.uint64)),
            )
        )
    return rows


def write_positions(
    spark: SparkSession, corpus: DataFrame, out_dir: str, *, n_shards: int = 16
) -> None:
    """Materialize the positions artifact under ``out_dir/positions``.

    ``corpus`` must carry (doc_id, content); sharding is the index's
    own doc-hash contract (pmod(xxhash64(doc_id), n_shards)) so the
    artifact co-shards with the BM25 postings."""

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard, term = int(key[0]), str(key[1])
        rows = _encode_group(
            shard,
            term,
            pdf["doc_id"].to_numpy(np.int64),
            pdf["pos"].to_numpy(np.int64),
        )
        return pd.DataFrame(rows, columns=POS_COLUMNS)

    sharded = (
        corpus.select(
            "doc_id",
            "content",
            F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int").alias("shard"),
        )
        .repartition(n_shards, "shard")
    )
    stream = sharded.select(
        "shard",
        "doc_id",
        F.posexplode(tokens_filtered_col(F.col("content"))).alias("pos", "term"),
    )
    blocks = stream.groupBy("shard", "term").applyInPandas(kernel, POS_SCHEMA)
    (
        blocks.write.mode("overwrite")
        .partitionBy("shard")
        .option("compression", "zstd")
        .parquet(os.path.join(out_dir, "positions"))
    )


# ------------------------------------------------------------- query

def _decode_blocks(grp: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Block rows of ONE (shard, term) → (doc_id per position, abs pos)."""
    ds, ps = [], []
    for r in grp.sort_values("block_id").itertuples():
        d = delta_decode(bytes(r.doc_ids_blob), r.n_docs)
        c = varint_decode(bytes(r.counts_blob), r.n_docs).astype(np.int64)
        dp = varint_decode(bytes(r.pos_blob), int(c.sum())).astype(np.int64)
        # undo per-doc delta: cumsum minus the cumulative total before
        # each doc's first position
        cs = np.cumsum(dp)
        starts = np.concatenate([[0], np.cumsum(c)[:-1]]).astype(np.int64)
        base = np.repeat(cs[starts] - dp[starts], c)
        ds.append(np.repeat(d, c))
        ps.append(cs - base)
    return np.concatenate(ds), np.concatenate(ps)


def _phrase_kernel(terms: list[str]):
    m = len(terms)
    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "n_occ": pd.Series(dtype="int64")})

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        per: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for term, grp in pdf.groupby("term"):
            per[str(term)] = _decode_blocks(grp)
        if any(t not in per for t in terms):
            return empty
        d0, p0 = per[terms[0]]
        udocs = np.unique(d0)
        # occurrence start p in doc d survives iff term j sits at p+j
        # for all j; encode (doc_idx, start) as one sortable int64 key
        keys = np.sort((np.searchsorted(udocs, d0) << np.int64(32)) | p0)
        for j in range(1, m):
            dj, pj = per[terms[j]]
            sel = np.isin(dj, udocs) & (pj >= j)
            dj, pj = dj[sel], pj[sel]
            kj = (np.searchsorted(udocs, dj) << np.int64(32)) | (pj - j)
            keys = np.intersect1d(keys, kj, assume_unique=True)
            if keys.size == 0:
                return empty
        occ = np.bincount((keys >> np.int64(32)).astype(np.int64),
                          minlength=udocs.size)
        nz = occ > 0
        return pd.DataFrame({"doc_id": udocs[nz], "n_occ": occ[nz]})

    return kernel


def _phrase_prefix_kernel(lead_terms: list[str], expansions: list[str]):
    """_phrase_kernel generalized for match_phrase_prefix: the final
    slot matches ANY expansion term. The expansion streams concatenate
    into one pseudo-term stream — (doc, pos) stays unique across them
    because a position holds exactly one token, so the sorted-key
    intersection walk is unchanged."""
    m = len(lead_terms) + 1
    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "n_occ": pd.Series(dtype="int64")})

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        per: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for term, grp in pdf.groupby("term"):
            per[str(term)] = _decode_blocks(grp)
        if any(t not in per for t in lead_terms):
            return empty
        got = [per[t] for t in expansions if t in per]
        if not got:
            return empty
        dl = np.concatenate([g[0] for g in got])
        pl = np.concatenate([g[1] for g in got])
        if m == 1:
            # prefix-only phrase: occurrences = expansion tokens per doc
            udocs, cnt = np.unique(dl, return_counts=True)
            return pd.DataFrame(
                {"doc_id": udocs, "n_occ": cnt.astype(np.int64)}
            )
        d0, p0 = per[lead_terms[0]]
        udocs = np.unique(d0)
        keys = np.sort((np.searchsorted(udocs, d0) << np.int64(32)) | p0)
        for j in range(1, m):
            dj, pj = (dl, pl) if j == m - 1 else per[lead_terms[j]]
            sel = np.isin(dj, udocs) & (pj >= j)
            dj, pj = dj[sel], pj[sel]
            kj = (np.searchsorted(udocs, dj) << np.int64(32)) | (pj - j)
            keys = np.intersect1d(np.sort(kj), keys, assume_unique=True)
            if keys.size == 0:
                return empty
        occ = np.bincount((keys >> np.int64(32)).astype(np.int64),
                          minlength=udocs.size)
        nz = occ > 0
        return pd.DataFrame({"doc_id": udocs[nz], "n_occ": occ[nz]})

    return kernel


def match_phrase_prefix_from_positions(
    spark: SparkSession,
    positions: DataFrame,
    phrase: str,
    expansions: list[str],
    k: int = 10,
    *,
    tombstones: DataFrame | None = None,
) -> DataFrame:
    """(rank, doc_id, n_occ) — match_phrase_prefix served from the
    positions artifact; rank-identical to
    engine/phrase.match_phrase_prefix_topk given the same expansion
    list (its DuckDB mirror match_phrase_prefix_sql is the oracle).
    The isin covers lead terms ∪ expansions, so the artifact read
    stays pruned to ≤ m−1+max_expansions terms' blocks."""
    from .ranking import _ranked

    out_schema = "rank int, doc_id long, n_occ long"
    terms = tokenize(phrase, use_stem=False)
    if not terms or not expansions:
        return spark.createDataFrame([], out_schema)
    lead = terms[:-1]
    exp = sorted(set(expansions))
    need = sorted(set(lead) | set(exp))
    blocks = positions.where(F.col("term").isin(need))
    occ = blocks.groupBy("shard").applyInPandas(
        _phrase_prefix_kernel(lead, exp), "doc_id long, n_occ long"
    )
    if tombstones is not None:
        occ = occ.join(F.broadcast(tombstones), "doc_id", "left_anti")
    return _ranked(occ, "n_occ", k)


def _span_near_kernel(terms: list[str], w: int):
    """Ordered min-span (span_near) over decoded position streams: an
    (m−1)-level walk replacing the recompute path's join tower. Level j
    keeps, per event, the BEST (largest) chain start of an ordered
    t₀..tⱼ match ending at that event: one searchsorted against the
    previous level's sorted ``(doc_idx<<32)|pos`` keys finds the latest
    earlier event, and a doc-guarded ``maximum.accumulate`` over packed
    ``(doc_idx<<32)|(chain+1)`` values turns it into a prefix max
    (invalid events pack chain 0; earlier docs can never bleed forward
    because the doc index owns the high bits). O(E log E) per shard."""
    m = len(terms)
    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "min_span": pd.Series(dtype="int64")})

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        per: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for term, grp in pdf.groupby("term"):
            per[str(term)] = _decode_blocks(grp)
        if any(t not in per for t in set(terms)):
            return empty
        common = np.unique(per[terms[0]][0])
        for t in terms[1:]:
            common = np.intersect1d(common, np.unique(per[t][0]),
                                    assume_unique=True)
            if common.size == 0:
                return empty

        def level(t):
            d, p = per[t]
            sel = np.isin(d, common)
            d, p = d[sel], p[sel]
            didx = np.searchsorted(common, d)
            keys = (didx << np.int64(32)) | p
            order = np.argsort(keys)
            return didx[order], p[order], keys[order]

        didx0, p0, keys0 = level(terms[0])
        if m == 1:
            return pd.DataFrame({
                "doc_id": common,
                "min_span": np.ones(common.size, dtype=np.int64),
            })
        # level 0: every occurrence starts its own chain
        runmax = np.maximum.accumulate(
            (didx0 << np.int64(32)) | (p0 + 1)
        )
        prev_keys = keys0
        for j in range(1, m):
            didx, pj, keys = level(terms[j])
            idx = np.searchsorted(prev_keys, keys, side="left") - 1
            got = runmax[np.maximum(idx, 0)]
            valid = (idx >= 0) & ((got >> np.int64(32)) == didx) & (
                (got & np.int64(0xFFFFFFFF)) > 0
            )
            chain = (got & np.int64(0xFFFFFFFF)) - 1
            if j == m - 1:
                span = np.where(valid, pj - chain + 1, np.int64(2**40))
                span = np.where(span <= w, span, np.int64(2**40))
                starts = np.searchsorted(didx, np.arange(common.size))
                # docs whose events all fall before the next doc's
                # start keep their own slice; empty slices (no event
                # of the last term in that doc — impossible here since
                # common intersects all terms) would reuse neighbors,
                # guarded by the sentinel filter below anyway
                mins = np.minimum.reduceat(span, starts)
                keep = mins <= w
                return pd.DataFrame({
                    "doc_id": common[keep],
                    "min_span": mins[keep].astype(np.int64),
                })
            packed = np.where(
                valid,
                (didx << np.int64(32)) | (chain + 1),
                (didx << np.int64(32)),
            )
            runmax = np.maximum.accumulate(packed)
            prev_keys = keys

    return kernel


def span_near_from_positions(
    spark: SparkSession,
    positions: DataFrame,
    query: str,
    k: int = 10,
    slop: int = 2,
    *,
    tombstones: DataFrame | None = None,
) -> DataFrame:
    """(rank, doc_id, min_span) — span_near served from the positions
    artifact; rank-identical to engine/phrase.span_near_topk (DuckDB
    mirror span_near_sql is the oracle). The isin prunes the artifact
    read to the query's terms."""
    from .ranking import _ranked_asc

    out_schema = "rank int, doc_id long, min_span long"
    terms = tokenize(query, use_stem=False)
    if not terms:
        return spark.createDataFrame([], out_schema)
    w = len(terms) + int(slop)
    blocks = positions.where(F.col("term").isin(sorted(set(terms))))
    spans = blocks.groupBy("shard").applyInPandas(
        _span_near_kernel(terms, w), "doc_id long, min_span long"
    )
    if tombstones is not None:
        spans = spans.join(F.broadcast(tombstones), "doc_id", "left_anti")
    return _ranked_asc(spans, "min_span", k)


def _proximity_kernel(terms: list[str]):
    """Per-shard min-span sweep over decoded position streams.

    Vectorized last-occurrence sweep: all events of the m query terms
    (restricted to docs containing ALL of them) are sorted by
    (doc, pos); for each term j a ``maximum.accumulate`` over
    ``(doc_idx << 32) | pos`` keys (−1 where the event is another term)
    yields term j's latest occurrence at or before every event, with
    the high bits guarding against bleed-over from the previous doc.
    The minimal window ending at each event is ``pos − min_j(last_j) +
    1``; a ``minimum.reduceat`` at doc boundaries takes the per-doc
    min. O(E log E) for E = query-term occurrences in the shard — no
    per-doc Python loop."""
    from .phrase import _SPAN_PACK

    m = len(terms)
    empty = pd.DataFrame({"shard": pd.Series(dtype="int32"),
                          "doc_id": pd.Series(dtype="int64"),
                          "key": pd.Series(dtype="int64")})

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = np.int32(key[0])
        per: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for term, grp in pdf.groupby("term"):
            per[str(term)] = _decode_blocks(grp)
        if any(t not in per for t in terms):
            return empty
        common = np.unique(per[terms[0]][0])
        for t in terms[1:]:
            common = np.intersect1d(common, np.unique(per[t][0]),
                                    assume_unique=True)
            if common.size == 0:
                return empty
        didx_parts, pos_parts, tid_parts = [], [], []
        for j, t in enumerate(terms):
            d, p = per[t]
            sel = np.isin(d, common)
            didx_parts.append(np.searchsorted(common, d[sel]))
            pos_parts.append(p[sel])
            tid_parts.append(np.full(int(sel.sum()), j, dtype=np.int64))
        didx = np.concatenate(didx_parts)
        pos = np.concatenate(pos_parts)
        tid = np.concatenate(tid_parts)
        order = np.lexsort((pos, didx))
        didx, pos, tid = didx[order], pos[order], tid[order]
        key64 = (didx << np.int64(32)) | pos
        min_last = np.full(didx.size, np.int64(2**62), dtype=np.int64)
        valid = np.ones(didx.size, dtype=bool)
        for j in range(m):
            run = np.maximum.accumulate(np.where(tid == j, key64, np.int64(-1)))
            ok = (run >= 0) & ((run >> np.int64(32)) == didx)
            valid &= ok
            lastp = run & np.int64(0xFFFFFFFF)
            min_last = np.where(ok, np.minimum(min_last, lastp), min_last)
        # packed (span, start) key — min() picks smallest span, then
        # smallest window start (the phrase.py _SPAN_PACK contract, so
        # the indexed snippet path is tie-identical to the recompute)
        packed = np.where(
            valid,
            (pos - min_last + 1) * np.int64(_SPAN_PACK) + min_last,
            np.int64(2**62),
        )
        starts = np.searchsorted(didx, np.arange(common.size))
        min_key = np.minimum.reduceat(packed, starts)
        # every common doc has ≥1 valid window (the event completing
        # its first full cover), so no sentinel survives the reduceat
        return pd.DataFrame({
            "shard": np.full(common.size, shard, dtype=np.int32),
            "doc_id": common,
            "key": min_key,
        })

    return kernel


def proximity_topk_from_positions(
    spark: SparkSession,
    positions: DataFrame,
    query: str,
    k: int = 10,
    *,
    tombstones: DataFrame | None = None,
) -> DataFrame:
    """(rank, doc_id, min_span) — min-span proximity top-k served from
    the positions artifact; rank-identical to
    engine/phrase.proximity_topk (DuckDB mirror proximity_topk_sql is
    the oracle). Decodes position blocks for ONLY the query's terms
    (isin pushdown, same J2 shape as phrase serving). ``tombstones``
    (deleted doc_ids) are anti-joined before the top-k cut."""
    from .ranking import _ranked_asc

    terms = sorted(set(tokenize(query, use_stem=False)))
    if not terms:
        return spark.createDataFrame([], "rank int, doc_id long, min_span long")
    spans = proximity_keys_from_positions(positions, terms).select(
        "doc_id", (F.col("key") / _pack()).cast("long").alias("min_span")
    )
    if tombstones is not None:
        spans = spans.join(F.broadcast(tombstones), "doc_id", "left_anti")
    return _ranked_asc(spans, "min_span", k)


def _pack() -> int:
    from .phrase import _SPAN_PACK

    return _SPAN_PACK


def proximity_keys_from_positions(
    positions: DataFrame, terms: list[str]
) -> DataFrame:
    """(shard, doc_id, key) — per-doc packed min (span, start) from the
    positions artifact; key follows the phrase.py _SPAN_PACK contract.
    Shared by proximity ranking and snippet serving; shard rides along
    so the snippet docstore fetch can prune hive partitions."""
    blocks = positions.where(F.col("term").isin(terms))
    return blocks.groupBy("shard").applyInPandas(
        _proximity_kernel(terms), "shard int, doc_id long, key long"
    )


def phrase_topk_from_positions(
    spark: SparkSession,
    positions: DataFrame,
    phrase: str,
    k: int = 10,
    *,
    tombstones: DataFrame | None = None,
) -> DataFrame:
    """(rank, doc_id, n_occ) — exact phrase top-k served from the
    positions artifact; rank-identical to engine/phrase.phrase_topk
    (its DuckDB mirror phrase_topk_sql is the oracle). ``tombstones``
    (deleted doc_ids) are anti-joined before the top-k cut."""
    from .ranking import _ranked

    terms = tokenize(phrase, use_stem=False)
    if not terms:
        return spark.createDataFrame([], "rank int, doc_id long, n_occ long")
    blocks = positions.where(F.col("term").isin(sorted(set(terms))))
    occ = blocks.groupBy("shard").applyInPandas(
        _phrase_kernel(terms), "doc_id long, n_occ long"
    )
    if tombstones is not None:
        occ = occ.join(F.broadcast(tombstones), "doc_id", "left_anti")
    return _ranked(occ, "n_occ", k)
