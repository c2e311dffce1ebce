"""Streaming ingestion: Structured Streaming → micro-batch segments.

The reference family ingests with periodic batch rebuilds; this module
gives the engine a continuous path using Spark's OWN streaming model
(SURVEY.md §2-adjacent, "Structured Streaming for streams"):

    readStream (file source, 1 file = 1 micro-batch by default)
      → writeStream.foreachBatch(StreamingIndexWriter.apply_batch)
      → trigger(availableNow=True)

Each micro-batch builds a DELTA SEGMENT with the live index's exact
config and the segments are folded in with the byte-identity K-way
merge (engine/merge.py) — so after any prefix of batches the serving
index is INDISTINGUISHABLE from a batch `build_index` over every
document ingested so far (the merge contract, tested), and a reader
swap is one atomic pointer write.

Exactly-once
------------
The file source's checkpoint gives at-least-once foreachBatch delivery
across restarts; idempotence comes from recording applied ``epoch_id``s
in the CURRENT pointer and skipping replays — together, exactly-once.
A crash BETWEEN segment build and pointer write is also safe: the
replayed epoch re-enters ``build_index`` on the same segment dir, whose
manifest fingerprint matches, so the resume machinery skips the done
stages instead of rebuilding.

Merge cadence (the 100 TB shape)
--------------------------------
``merge_every=1`` folds every micro-batch immediately (max freshness,
merge cost O(total index) per batch). Production sets ``merge_every=K``:
batches only BUILD their delta segment (cost ∝ delta) and the writer
K-way-merges K pending segments in ONE pass (merge_many — same shuffle
work as a 2-way merge), trading bounded staleness for amortized merge
cost; ``flush()`` folds whatever is pending at drain time. Deletes ride
the same cadence via engine/compact.py between generations.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index import BLOCK_DOCS, IndexReader, build_index

CURRENT = "CURRENT"


class StreamingIndexWriter:
    """foreachBatch sink: micro-batches → delta segments → merged
    generations under ``index_root``. The config args apply to the
    FIRST segment only; every later segment reads the live index's
    manifest so the merge precondition holds by construction."""

    def __init__(
        self,
        spark: SparkSession,
        index_root: str,
        *,
        use_stem: bool = False,
        n_shards: int = 8,
        block_docs: int = BLOCK_DOCS,
        with_positions: bool = False,
        with_docstore: bool = False,
        merge_every: int = 1,
    ):
        if merge_every < 1:
            raise ValueError("merge_every must be >= 1")
        self.spark = spark
        self.root = index_root
        self.cfg = {
            "use_stem": use_stem,
            "n_shards": n_shards,
            "block_docs": block_docs,
        }
        self.artifacts = {
            "with_positions": with_positions,
            "with_docstore": with_docstore,
        }
        self.merge_every = merge_every
        os.makedirs(os.path.join(self.root, "segments"), exist_ok=True)

    # ---- CURRENT pointer (atomic os.replace) --------------------------

    def _state(self) -> dict:
        p = os.path.join(self.root, CURRENT)
        if not os.path.exists(p):
            return {
                "generation": 0,
                "current_dir": None,
                "pending": [],
                "applied_epochs": [],
            }
        with open(p) as f:
            return json.load(f)

    def _write_state(self, st: dict) -> None:
        p = os.path.join(self.root, CURRENT)
        with open(p + ".tmp", "w") as f:
            json.dump(st, f, indent=1)
        os.replace(p + ".tmp", p)

    def reader(self) -> IndexReader | None:
        """IndexReader over the last merged generation (None before the
        first merge). Pending unmerged segments are NOT visible — the
        documented staleness bound of merge_every > 1."""
        st = self._state()
        return (
            IndexReader(self.spark, st["current_dir"])
            if st["current_dir"]
            else None
        )

    # ---- the sink ------------------------------------------------------

    def apply_batch(self, df: DataFrame, epoch_id: int) -> None:
        """foreachBatch body: build this batch's delta segment, then
        fold pending segments once merge_every is reached. Replayed
        epochs (restart after crash) are skipped via the pointer."""
        st = self._state()
        if epoch_id in st["applied_epochs"]:
            return
        docs = self._prepare(df)
        if docs.isEmpty():
            st["applied_epochs"].append(epoch_id)
            self._write_state(st)
            return
        seg = os.path.join(self.root, "segments", f"seg-{epoch_id:06d}")
        cfg, arts = self.cfg, self.artifacts
        if st["current_dir"]:
            man = IndexReader(self.spark, st["current_dir"]).manifest
            cfg = {k: man["config"][k] for k in ("use_stem", "n_shards", "block_docs")}
            arts = {
                "with_positions": man["stages"].get("positions") == "done",
                "with_docstore": man["stages"].get("docstore") == "done",
            }
        build_index(self.spark, docs, seg, n_chunks=1, **cfg, **arts)
        st["pending"].append(seg)
        st["applied_epochs"].append(epoch_id)
        self._write_state(st)
        if len(st["pending"]) >= self.merge_every:
            self._merge_pending(st)

    def flush(self) -> None:
        """Fold any pending segments (call after the stream drains)."""
        st = self._state()
        if st["pending"]:
            self._merge_pending(st)

    def _merge_pending(self, st: dict) -> None:
        from .merge import merge_many

        dirs = ([st["current_dir"]] if st["current_dir"] else []) + st["pending"]
        gen = st["generation"] + 1
        if len(dirs) == 1:
            cur = dirs[0]
        else:
            cur = os.path.join(self.root, "segments", f"gen-{gen:06d}")
            merge_many(self.spark, dirs, cur)
        st.update(
            {"generation": gen, "current_dir": cur, "pending": [],
             "merged_unix": time.time()}
        )
        self._write_state(st)

    def _prepare(self, df: DataFrame) -> DataFrame:
        """Micro-batch → the build's corpus contract (doc_id +
        content_sha256). Corpus-shaped batches (repo/path/commit)
        get the standard identity columns attached."""
        cols = set(df.columns)
        if "content_sha256" not in cols:
            if "doc_id" in cols:
                df = df.withColumn(
                    "content_sha256", F.sha2(F.col("content"), 256)
                )
            else:
                from .io import with_identity

                df = with_identity(df)
        return df


def corpus_stream(
    spark: SparkSession, source_dir: str, *, files_per_batch: int = 1
) -> DataFrame:
    """File-source stream over a growing directory of corpus parquet
    files; 1 file = 1 micro-batch by default (the hourly-drop cadence).
    The schema is pinned from a static read so the stream never infers."""
    schema = spark.read.parquet(source_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_batch)
        .parquet(source_dir)
    )


def stream_ingest(
    spark: SparkSession,
    stream_df: DataFrame,
    index_root: str,
    *,
    checkpoint_dir: str | None = None,
    merge_every: int = 1,
    **writer_cfg,
) -> StreamingIndexWriter:
    """Drain ``stream_df`` into a served index under ``index_root``
    (trigger availableNow: process everything currently available,
    then stop — the batch-drain mode; re-invoking later picks up ONLY
    new files via the checkpoint). Returns the writer; serve via
    ``writer.reader()``."""
    w = StreamingIndexWriter(
        spark, index_root, merge_every=merge_every, **writer_cfg
    )
    cp = checkpoint_dir or os.path.join(index_root, "_checkpoint")
    q = (
        stream_df.writeStream.foreachBatch(w.apply_batch)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    w.flush()
    return w
