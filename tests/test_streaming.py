"""Streaming ingestion contract (engine/streaming.py): draining a file
stream through foreachBatch delta segments + K-way merge must be
indistinguishable from one batch build over everything ingested —
posting blocks byte-identical — with checkpointed resume (only new
files on re-drain) and idempotent epoch replay."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from engine.index import build_index
from engine.io import documents_as_corpus
from engine.streaming import corpus_stream, stream_ingest

# slow lane: Structured-Streaming micro-batch drains + segment merges — core lane is `pytest -m "not slow"`
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.01"


def _blocks_set(r):
    return {
        (row["shard"], row["term"], row["block_id"], row["n"],
         bytes(row["doc_ids_blob"]), bytes(row["tfs_blob"]),
         bytes(row["doc_lens_blob"]))
        for row in r.postings().collect()
    }


@pytest.fixture(scope="module")
def chunks(spark, tmp_path_factory):
    """Corpus split into 4 disjoint parquet files (doc_id residues);
    the stream source dir starts with the first 3."""
    corpus = documents_as_corpus(spark, SF).withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    )
    root = tmp_path_factory.mktemp("stream_src")
    files = []
    for i in range(4):
        pdf = corpus.where(F.col("doc_id") % 4 == i).toPandas()
        p = str(root / f"chunk{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
        files.append(p)
    src = root / "source"
    src.mkdir()
    for p in files[:3]:
        os.link(p, src / os.path.basename(p))
    return {"corpus": corpus, "files": files, "src": str(src)}


@pytest.fixture(scope="module")
def drained(spark, chunks, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stream_idx"))
    w = stream_ingest(
        spark, corpus_stream(spark, chunks["src"]), root,
        use_stem=False, n_shards=4,
    )
    return {"root": root, "writer": w}


def test_streamed_index_equals_batch_build(spark, chunks, drained,
                                           tmp_path_factory):
    r = drained["writer"].reader()
    assert r is not None
    three = chunks["corpus"].where(F.col("doc_id") % 4 != 3)
    full = build_index(
        spark, three, str(tmp_path_factory.mktemp("b3")), use_stem=False,
        n_shards=4, n_chunks=1,
    )
    assert _blocks_set(r) == _blocks_set(full)
    assert r.manifest["stats"]["n_docs"] == full.manifest["stats"]["n_docs"]
    got = [tuple(x) for x in r.bm25_topk("table scan fast", 10).collect()]
    want = [tuple(x) for x in full.bm25_topk("table scan fast", 10).collect()]
    assert got == want and len(got) == 10


def test_epoch_replay_is_idempotent(spark, chunks, drained):
    """Re-delivering an already-applied epoch (restart semantics) must
    not touch the index."""
    w = drained["writer"]
    st = w._state()
    df = spark.read.parquet(chunks["files"][0])
    w.apply_batch(df, st["applied_epochs"][0])
    assert w._state() == st


def test_checkpoint_resume_picks_up_only_new_files(spark, chunks, drained,
                                                   tmp_path_factory):
    """Drop the 4th file into the source and re-drain with the same
    checkpoint: exactly one new batch is processed and the result is
    byte-identical to a batch build over all 4 chunks."""
    import shutil

    shutil.copy(chunks["files"][3],
                os.path.join(chunks["src"], "chunk3.parquet"))
    before = len(drained["writer"]._state()["applied_epochs"])
    w = stream_ingest(
        spark, corpus_stream(spark, chunks["src"]), drained["root"],
        use_stem=False, n_shards=4,
    )
    st = w._state()
    assert len(st["applied_epochs"]) == before + 1
    full = build_index(
        spark, chunks["corpus"], str(tmp_path_factory.mktemp("b4")),
        use_stem=False, n_shards=4, n_chunks=1,
    )
    assert _blocks_set(w.reader()) == _blocks_set(full)


def _events_con():
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    return con


def test_stream_window_counts_matches_duckdb(spark, tmp_path_factory):
    """Watermarked tumbling-window agg drained through a 3-batch file
    stream (complete mode) == DuckDB's batch aggregation."""
    from engine.driver_queries import stream_window_counts_sql
    from engine.streaming import stream_window_counts

    ev = spark.read.parquet(f"{SF}/events.parquet")
    src = tmp_path_factory.mktemp("ev_src")
    for i in range(3):
        pdf = ev.where(F.col("event_id") % 3 == i).toPandas()
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       str(src / f"drop{i}.parquet"),
                       coerce_timestamps="us",
                       allow_truncated_timestamps=True)
    got = {
        tuple(r)
        for r in stream_window_counts(
            spark, str(src), query_name="t_swc"
        ).collect()
    }
    want = {
        (int(a), b, int(c), float(d))
        for a, b, c, d in _events_con()
        .execute(stream_window_counts_sql())
        .fetchall()
    }
    assert got == want and len(got) > 0


def test_sessionize_matches_duckdb(spark):
    from engine.driver_queries import sessionize_sql
    from engine.streaming import sessionize_events

    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = {tuple(r) for r in sessionize_events(ev).collect()}
    want = {
        (int(a), int(b), int(c), int(d), float(e))
        for a, b, c, d, e in _events_con().execute(sessionize_sql()).fetchall()
    }
    assert got == want and len(got) > 0


def test_sessionize_stream_emits_closed_sessions(spark, tmp_path_factory):
    """applyInPandasWithState sessionization over time-ordered drops
    emits EXACTLY the batch sessions minus each user's final (still
    open) one."""
    from engine.streaming import sessionize_events, sessionize_stream

    ev = spark.read.parquet(f"{SF}/events.parquet")
    pdf = ev.toPandas().sort_values("ts", ignore_index=True)
    src = tmp_path_factory.mktemp("ev_ts_src")
    n = len(pdf)
    for i in range(3):
        part = pdf.iloc[i * n // 3 : (i + 1) * n // 3]
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       str(src / f"drop{i}.parquet"),
                       coerce_timestamps="us",
                       allow_truncated_timestamps=True)
    streamed = {
        tuple(r)
        for r in sessionize_stream(
            spark, str(src), query_name="t_sess"
        ).collect()
    }
    batch = [tuple(r) for r in sessionize_events(ev).collect()]
    last_per_user = {}
    for row in batch:
        uid, start = row[0], row[1]
        if uid not in last_per_user or start > last_per_user[uid][1]:
            last_per_user[uid] = row
    want = set(batch) - set(last_per_user.values())
    assert streamed == want


def test_merge_every_batches_segments(spark, chunks, tmp_path_factory):
    """merge_every=2: segments accumulate and fold in K-way passes;
    after flush the index still equals the batch build."""
    root = str(tmp_path_factory.mktemp("stream_me2"))
    w = stream_ingest(
        spark, corpus_stream(spark, chunks["src"]), root,
        merge_every=2, use_stem=False, n_shards=4,
    )
    st = w._state()
    assert st["pending"] == []
    full = build_index(
        spark, chunks["corpus"], str(tmp_path_factory.mktemp("bme")),
        use_stem=False, n_shards=4, n_chunks=1,
    )
    assert _blocks_set(w.reader()) == _blocks_set(full)
