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


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    *,
    round_scores: int = 6,
) -> DataFrame:
    """Tumbling-window per-type event rollup — the canonical
    watermarked streaming aggregation, written once for BOTH engines:
    on a streaming frame the watermark bounds state (late events
    beyond it are dropped and window state is evicted); on a batch
    frame the same expression is the oracle path. Columns:
    (window_start epoch-seconds, event_type, n_events, sum_value) —
    epoch seconds because Spark's window() and DuckDB's time_bucket
    agree on 1970-aligned buckets, and an integer key hashes
    identically cross-engine. DuckDB mirror:
    engine/driver_queries.stream_window_counts_sql."""
    # parquet naive timestamps read as TIMESTAMP_NTZ in Spark 4, which
    # neither window().start.cast(long) nor epoch math accepts — pin to
    # TIMESTAMP via the session TZ (UTC), matching DuckDB's epoch(ts)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    ev = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        ev.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), round_scores).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_window_counts(
    spark: SparkSession,
    source_dir: str,
    *,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    files_per_batch: int = 1,
    query_name: str = "stream_window_counts",
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Drain a file-source event stream through the watermarked
    windowed aggregation into a memory sink (complete mode — the drain
    mode where every window is emitted, so the result must equal the
    batch aggregation over the same files; append mode would hold back
    windows the watermark hasn't passed, the steady-state serving
    shape). Returns the final table.

    ``shuffle_partitions`` is the standard stateful-streaming sizing
    knob: a streaming aggregation keeps one state store per shuffle
    partition and pays it EVERY micro-batch, so a small drain wants few
    partitions while a production stream wants the session default
    (None — conf untouched). The value is captured at query start and
    restored after the drain; results are partitioning-independent."""
    schema = spark.read.parquet(source_dir).schema
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_batch)
        .parquet(source_dir)
    )
    agg = windowed_event_counts(ev, window, watermark)
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)
    return spark.table(query_name)


SESSION_GAP_MIN = 30


def sessionize_events(
    events: DataFrame, *, gap_minutes: int = SESSION_GAP_MIN,
    round_scores: int = 6,
) -> DataFrame:
    """Per-user session rollup, batch path: a session is a maximal run
    of one user's events with consecutive gaps <= gap_minutes (classic
    web-analytics sessionization). Expressed with window functions —
    lag(ts) per user flags session breaks, a running sum of the flags
    numbers sessions, one groupBy rolls them up. Scale shape: both
    windows and the final groupBy share the user_id hash partitioning,
    so the whole op is ONE exchange of the event stream; no driver
    state. Columns: (user_id, session_start epoch-s, session_end
    epoch-s, n_events, sum_value). DuckDB mirror:
    engine/driver_queries.sessionize_sql. Streaming twin:
    sessionize_stream (applyInPandasWithState) — emits the SAME rows
    for closed sessions, pytest-parity-tested."""
    from pyspark.sql import Window

    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lit(gap_minutes * 60)
    brk = (
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
            > gap,
            1,
        )
        .otherwise(0)
        .alias("brk")
    )
    sess = F.sum("brk").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        events.select("user_id", "ts", "event_id", "value", brk)
        .withColumn("session_no", sess)
        .groupBy("user_id", "session_no")
        .agg(
            F.min(F.col("ts").cast("long")).alias("session_start"),
            F.max(F.col("ts").cast("long")).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), round_scores).alias("sum_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
    )


def sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    gap_minutes: int = SESSION_GAP_MIN,
    files_per_batch: int = 1,
    query_name: str = "stream_sessions",
    round_scores: int = 6,
) -> DataFrame:
    """Streaming sessionization via applyInPandasWithState — the
    custom-stateful-operator escape hatch for semantics window
    functions can't express incrementally. State per user = the open
    session (start, last_ts, n, sum); a batch's events extend it or
    close it (gap > gap_minutes) and CLOSED sessions are emitted.
    Sessions still open when the drain ends stay in state — exactly a
    production stream's behavior, where they'd close via timeout — so
    parity with the batch path holds on the closed prefix
    (tests/test_streaming.py pins it). Requires event-time order
    WITHIN a batch per user (sorted in the kernel) and batches in
    event-time order across files (the file source's mtime order —
    true for hourly drops)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, session_start long, session_end long, "
        "n_events long, sum_value double"
    )
    state_schema = "start long, last long, n long, total double"
    gap = gap_minutes * 60

    def kernel(key, pdfs, state: GroupState):
        (uid,) = key
        closed = []
        if state.exists:
            start, last, n, total = state.get
        else:
            start = None
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, val in zip(
                pdf["ts"].astype("int64") // 10**9, pdf["value"]
            ):
                ts = int(ts)
                if start is None:
                    start, last, n, total = ts, ts, 1, float(val)
                elif ts - last > gap:
                    closed.append((uid, start, last, n, round(total, round_scores)))
                    start, last, n, total = ts, ts, 1, float(val)
                else:
                    last, n, total = ts, n + 1, total + float(val)
        if start is not None:
            state.update((start, last, n, total))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end",
                     "n_events", "sum_value"],
        )

    schema = spark.read.parquet(source_dir).schema
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_batch)
        .parquet(source_dir)
    )
    q = (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            kernel, out_schema, state_schema, "append",
            GroupStateTimeout.NoTimeout,
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


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
