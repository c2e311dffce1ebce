"""Document deletion (tombstones) + segment compaction.

Completes the index lifecycle the reference family handles with full
periodic rebuilds: build → merge (engine/merge.py) → incremental add
(merge.add_documents) → DELETE → COMPACT. Semantics are pinned to
Lucene's delete/liveDocs model:

- ``delete_documents`` records doc_ids in a ``tombstones/`` parquet
  table inside the index dir. Deleted docs become invisible to every
  query surface IMMEDIATELY, but corpus statistics (N, avgdl, df) stay
  STALE until compaction — exactly Lucene's behavior between a
  ``deleteDocuments`` call and a merge. Ranked surfaces therefore score
  with the original weights and simply never emit a deleted doc.
- ``compact_index`` rewrites the index without the tombstoned docs and
  with FULLY RECOMPUTED statistics; the contract (tested) is
  ``compact_index(delete(build(A), D)) == build(A ∖ D)`` with posting
  blocks byte-identical.

How compaction achieves rebuild-identity without the corpus
------------------------------------------------------------
The build's stage-1 checkpoint (``<index>/tokens`` — one array-form row
per doc, with shard/repo/path/sha256 riding along) is retained by
every index. Compaction filters that checkpoint (broadcast anti-join
against the tombstones), rewrites it into the target dir with the
exact stage-1 layout (same repartition-by-shard, same within-partition
sort, one file per shard), and then lets ``build_index``'s normal
resume machinery run stages 2-6 — the SAME code path a fresh build of
A∖D would execute over an identical checkpoint, so posting blocks,
dictionary, doc_stats, norms, title/anchor tables all come out
byte-/value-identical. The docstore (optional stage 8) is compacted by
anti-join since its rows are per-doc and content-identical.

Scale shape: the anti-join broadcasts the tombstone set (bounded by
deletes-since-last-compaction — compact when it grows, exactly like
Lucene's merge policy); the rewrite is one corpus-sized exchange (the
same single shuffle a fresh build pays); stages 2-6 are the build's
own shuffle-free machinery. Query-time filtering broadcasts the same
bounded set and drops ids at block-decode time inside the WAND kernel,
so pruning thresholds remain rank-safe (a deleted doc simply never
enters the accumulator).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index import IndexReader, _read_manifest, _write_manifest

TOMBSTONES = "tombstones"


def delete_documents(
    spark: SparkSession, index_dir: str, doc_ids: DataFrame
) -> int:
    """Add ``doc_ids`` (a DataFrame with a ``doc_id`` column) to the
    index's tombstone set; returns the new tombstone count. Idempotent
    (set union). Deletion is metadata-only — O(|tombstones|), no
    posting rewrite."""
    man = _read_manifest(index_dir)
    if not man or man["stages"].get("complete") != "done":
        raise ValueError(f"no complete index at {index_dir}")
    path = os.path.join(index_dir, TOMBSTONES)
    new = doc_ids.select(F.col("doc_id").cast("long")).distinct()
    if man["stages"].get(TOMBSTONES) == "done":
        old = spark.read.parquet(path)
        new = old.union(new).distinct()
    # tiny table: single file keeps the read cheap and the rewrite atomic
    tmp = path + "_tmp"
    new.coalesce(1).write.mode("overwrite").parquet(tmp)
    merged = spark.read.parquet(tmp)
    n = merged.count()
    merged.coalesce(1).write.mode("overwrite").parquet(path)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    man["stages"][TOMBSTONES] = "done"
    man["n_tombstones"] = n
    _write_manifest(index_dir, man)
    return n


def compact_index(
    spark: SparkSession, src_dir: str, out_dir: str
) -> IndexReader:
    """Rewrite ``src_dir`` minus its tombstones into ``out_dir`` with
    fresh statistics; ``compact(delete(build(A), D)) == build(A ∖ D)``
    byte-identically (tests/test_compact.py)."""
    from .build import DOC_TOKENS_SCHEMA  # noqa: F401 (schema contract)
    from .index import build_index, corpus_fingerprint

    man = _read_manifest(src_dir)
    if not man or man["stages"].get("complete") != "done":
        raise ValueError(f"no complete index at {src_dir}")
    cfg = man["config"]
    n_shards = cfg["n_shards"]

    toks = spark.read.parquet(os.path.join(src_dir, "tokens"))
    if man["stages"].get(TOMBSTONES) == "done":
        tomb = spark.read.parquet(os.path.join(src_dir, TOMBSTONES))
        toks = toks.join(F.broadcast(tomb), "doc_id", "left_anti")

    os.makedirs(out_dir, exist_ok=True)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    t0 = time.perf_counter()
    # stage-1-identical layout: same repartition, same sort, one file
    # per shard — stages 2-6 then run over bit-equal inputs
    data_cols = [c for c in toks.columns if c != "shard"]
    (
        toks.select(*data_cols, "shard")
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "doc_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("compression", "zstd")
        .parquet(os.path.join(out_dir, "tokens"))
    )
    # identity of the SURVIVING corpus, from the checkpoint's own
    # doc_id + sha256 columns — build_index will recompute the same
    # value from the dummy frame below and resume cleanly
    survivors = spark.read.parquet(os.path.join(out_dir, "tokens")).select(
        "doc_id", "content_sha256"
    )
    fp = corpus_fingerprint(survivors)
    out_man = {
        "version": 1,
        "config": dict(cfg),
        "fingerprint": fp,
        "stages": {"tokens": "done"},
        "chunks": {},
        "created_unix": time.time(),
        "compacted_from": os.path.abspath(src_dir),
        "stage_times": {"tokens": round(time.perf_counter() - t0, 2)},
    }
    _write_manifest(out_dir, out_man)

    reader = build_index(
        spark,
        survivors,  # fingerprint-only: stage 1 is already done
        out_dir,
        use_stem=cfg["use_stem"],
        n_shards=n_shards,
        block_docs=cfg["block_docs"],
        resume=True,
    )

    # optional stage 7: positions blocks are decoded per (shard, term),
    # tombstoned docs dropped, and re-encoded with the SAME
    # sort-then-block kernel a fresh build uses — byte-identical to
    # build(A ∖ D) by the same purity argument engine/merge.py proves
    # for segment merge (the group's (doc, pos) multiset determines the
    # blocks)
    if man["stages"].get("positions") == "done":
        import numpy as np
        import pandas as pd

        from .positions import POS_COLUMNS, POS_SCHEMA, _decode_blocks, _encode_group

        pos = spark.read.parquet(os.path.join(src_dir, "positions"))
        tomb_ids = np.empty(0, dtype=np.int64)
        if man["stages"].get(TOMBSTONES) == "done":
            t = spark.read.parquet(os.path.join(src_dir, TOMBSTONES))
            tomb_ids = np.sort(
                np.array([r["doc_id"] for r in t.collect()], dtype=np.int64)
            )

        def _pos_compact_kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
            d, p = _decode_blocks(pdf)
            if tomb_ids.size:
                live = ~np.isin(d, tomb_ids)
                d, p = d[live], p[live]
            rows = _encode_group(int(key[0]), str(key[1]), d, p)
            return pd.DataFrame(rows, columns=POS_COLUMNS)

        (
            pos.groupBy("shard", "term")
            .applyInPandas(_pos_compact_kernel, POS_SCHEMA)
            .write.mode("overwrite")
            .option("compression", "zstd")
            .partitionBy("shard")
            .parquet(os.path.join(out_dir, "positions"))
        )
        out_man = _read_manifest(out_dir)
        out_man["stages"]["positions"] = "done"
        _write_manifest(out_dir, out_man)
        reader.manifest = out_man

    # optional stage 8: docstore rows are per-doc and content-identical,
    # so an anti-join compaction equals a fresh stage-8 write
    if man["stages"].get("docstore") == "done":
        ds = spark.read.parquet(os.path.join(src_dir, "docstore"))
        if man["stages"].get(TOMBSTONES) == "done":
            tomb = spark.read.parquet(os.path.join(src_dir, TOMBSTONES))
            ds = ds.join(F.broadcast(tomb), "doc_id", "left_anti")
        data_cols = [c for c in ds.columns if c != "shard"]
        (
            ds.select(*data_cols, "shard")
            .repartition(n_shards, "shard")
            .write.mode("overwrite")
            .partitionBy("shard")
            .option("compression", "zstd")
            .parquet(os.path.join(out_dir, "docstore"))
        )
        out_man = _read_manifest(out_dir)
        out_man["stages"]["docstore"] = "done"
        _write_manifest(out_dir, out_man)
        reader.manifest = out_man

    return reader
