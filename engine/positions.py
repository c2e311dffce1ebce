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


def phrase_topk_from_positions(
    spark: SparkSession, positions: DataFrame, phrase: str, k: int = 10
) -> DataFrame:
    """(rank, doc_id, n_occ) — exact phrase top-k served from the
    positions artifact; rank-identical to engine/phrase.phrase_topk
    (its DuckDB mirror phrase_topk_sql is the oracle)."""
    from .ranking import _ranked

    terms = tokenize(phrase, use_stem=False)
    if not terms:
        return spark.createDataFrame([], "rank int, doc_id long, n_occ long")
    blocks = positions.where(F.col("term").isin(sorted(set(terms))))
    occ = blocks.groupBy("shard").applyInPandas(
        _phrase_kernel(terms), "doc_id long, n_occ long"
    )
    return _ranked(occ, "n_occ", k)
