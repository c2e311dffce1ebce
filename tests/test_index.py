"""M2/M3/M4 gates: physical index build → WAND == exhaustive == oracle;
codec losslessness through the full index; checkpoint resume;
determinism (SURVEY.md §5.2.4-5)."""

import json
import os
import shutil

import numpy as np
import pytest

from engine.index import MANIFEST, IndexReader, build_index
from oracle.bm25_ref import OracleIndex

K = 10


@pytest.fixture(scope="module")
def index_dir(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index"))
    build_index(spark, tiny_corpus, d, use_stem=True, n_shards=4, n_chunks=2)
    return d


@pytest.fixture(scope="module")
def reader(spark, index_dir):
    return IndexReader(spark, index_dir)


def test_manifest_lineage_and_metrics(index_dir):
    with open(os.path.join(index_dir, MANIFEST)) as f:
        man = json.load(f)
    assert man["stages"]["complete"] == "done"
    assert len(man["chunks"]) == 2
    for c in man["chunks"].values():
        assert c["status"] == "done"
        m = c["metrics"]
        assert m["n_postings"] == m["n_token_rows"] > 0
        assert m["n_tokens"] >= m["n_postings"]
        assert m["n_blocks"] >= 1


def test_index_postings_lossless(reader, tiny_docs):
    """Decode every block and rebuild term → postings; must equal the
    oracle's postings exactly (codec + sharding are lossless)."""
    from engine.postings import decode_block

    oracle = OracleIndex(tiny_docs, use_stem=True)
    got: dict[str, dict[int, int]] = {}
    for row in reader.postings().collect():
        ids, tfs, dls = decode_block(row)
        assert np.all(np.diff(ids) > 0)  # strictly increasing within block
        for d, t in zip(ids.tolist(), tfs.tolist()):
            got.setdefault(row["term"], {})[d] = t
    want = {t: dict(pl) for t, pl in oracle.postings.items()}
    assert got == want


def test_dictionary_matches_oracle(reader, tiny_docs):
    oracle = OracleIndex(tiny_docs, use_stem=True)
    rows = reader.dictionary().collect()
    got = {r["term"]: (r["df"], r["cf"]) for r in rows}
    assert got == {t: (oracle.df[t], oracle.cf[t]) for t in oracle.df}


@pytest.mark.slow
def test_wand_rank_identical_to_oracle(reader, tiny_docs, queries):
    # per-(query, prune) checks are independent — thread-pool the Spark
    # jobs (identical assertion set; the driver-contract sweep's move)
    from concurrent.futures import ThreadPoolExecutor

    oracle = OracleIndex(tiny_docs, use_stem=True)

    def check(case):
        q, prune = case
        want = oracle.bm25_topk(q["text"], K)
        got = reader.bm25_topk(q["text"], K, prune=prune).collect()
        got_ids = [r["doc_id"] for r in got]
        assert got_ids == [d for d, _ in want], (
            f"q{q['query_id']} prune={prune}: {got_ids} vs {want}"
        )
        for r, (_, s) in zip(got, want):
            assert abs(r["score"] - s) <= 1e-6

    cases = [(q, prune) for q in queries for prune in (True, False)]
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(check, cases))


def test_metadata_join(reader):
    out = reader.bm25_topk("inverted index compression", 5, with_metadata=True)
    rows = out.collect()
    assert rows and all(r["repo"] and r["path"] for r in rows)


def test_resume_skips_done_and_completes_partial(spark, tiny_corpus, index_dir,
                                                 tmp_path_factory, tiny_docs, queries):
    # copy the built index, surgically mark chunk 1 incomplete + delete its shards
    d2 = str(tmp_path_factory.mktemp("index_resume"))
    shutil.copytree(index_dir, d2, dirs_exist_ok=True)
    with open(os.path.join(d2, MANIFEST)) as f:
        man = json.load(f)
    victim = man["chunks"]["1"]
    man["chunks"]["1"] = {"status": "pending"}
    for stage in ("dictionary", "complete"):
        man["stages"].pop(stage, None)
    with open(os.path.join(d2, MANIFEST), "w") as f:
        json.dump(man, f)
    for s in victim["shards"]:
        shutil.rmtree(os.path.join(d2, "postings", f"shard={s}"), ignore_errors=True)

    r2 = build_index(spark, tiny_corpus, d2, use_stem=True, n_shards=4, n_chunks=2)
    with open(os.path.join(d2, MANIFEST)) as f:
        man2 = json.load(f)
    assert man2["stages"]["complete"] == "done"
    # chunk 0 untouched (same finish time), chunk 1 rebuilt
    oracle = OracleIndex(tiny_docs, use_stem=True)
    q = queries[0]
    got = [r["doc_id"] for r in r2.bm25_topk(q["text"], K).collect()]
    assert got == [d for d, _ in oracle.bm25_topk(q["text"], K)]


@pytest.mark.slow
def test_deterministic_rebuild(spark, tiny_corpus, index_dir, tmp_path_factory):
    """Two independent builds → byte-identical logical content."""
    d3 = str(tmp_path_factory.mktemp("index_rebuild"))
    build_index(spark, tiny_corpus, d3, use_stem=True, n_shards=4, n_chunks=2)
    a = IndexReader(spark, index_dir)
    b = IndexReader(spark, d3)

    def blocks_set(r):
        return {
            (row["shard"], row["term"], row["block_id"],
             bytes(row["doc_ids_blob"]), bytes(row["tfs_blob"]),
             bytes(row["doc_lens_blob"]))
            for row in r.postings().collect()
        }

    assert blocks_set(a) == blocks_set(b)
    assert a.manifest["stats"] == b.manifest["stats"]


@pytest.mark.slow
def test_changed_input_triggers_full_rebuild(spark, tiny_corpus, index_dir,
                                             tmp_path_factory):
    """Resuming onto DIFFERENT input must not reuse stale checkpoints:
    the corpus fingerprint mismatch resets the manifest and the index
    reflects the new corpus only."""
    d4 = str(tmp_path_factory.mktemp("index_changed"))
    shutil.copytree(index_dir, d4, dirs_exist_ok=True)
    smaller = tiny_corpus.orderBy("doc_id").limit(50).cache()
    r = build_index(spark, smaller, d4, use_stem=True, n_shards=4, n_chunks=2)
    assert r.manifest["stats"]["n_docs"] == 50
    ids = {row["doc_id"] for row in r.doc_stats().select("doc_id").collect()}
    keep = {row["doc_id"] for row in smaller.select("doc_id").collect()}
    assert ids == keep


def test_batch_matches_single_query(spark, index_dir, queries):
    """One-job batch evaluation must be rank-identical to per-query
    evaluation for every fixture query."""
    r = IndexReader(spark, index_dir)
    qmap = {f"q{i}": q["text"] for i, q in enumerate(queries[:8])}
    batch = r.bm25_topk_batch(qmap, 10)
    rows = batch.collect()
    by_q = {}
    for row in rows:
        by_q.setdefault(row["query_id"], []).append(
            (row["rank"], row["doc_id"], round(row["score"], 9))
        )
    for qid, text in qmap.items():
        single = [
            (row["rank"], row["doc_id"], round(row["score"], 9))
            for row in r.bm25_topk(text, 10).collect()
        ]
        got = sorted(by_q.get(qid, []))
        assert got == sorted(single), qid


@pytest.mark.slow
def test_index_tfidf_matches_recompute(spark, tiny_corpus, index_dir, queries):
    """Index-backed /search_body (build-time doc norms) must be
    rank- and value-identical to the recompute-from-corpus path."""
    from engine.ranking import tfidf_cosine_topk

    r = IndexReader(spark, index_dir)
    for q in queries[:4]:
        got = [
            (row["rank"], row["doc_id"], row["cos"])
            for row in r.tfidf_topk(q["text"], 10).collect()
        ]
        want = [
            (row["rank"], row["doc_id"], row["cos"])
            for row in tfidf_cosine_topk(
                spark, tiny_corpus, q["text"], 10, use_stem=True
            ).collect()
        ]
        assert got == want, q["text"]


def test_index_title_matches_recompute(spark, tiny_corpus, index_dir, queries):
    from engine.ranking import title_match_topk

    r = IndexReader(spark, index_dir)
    for q in queries[:4]:
        got = [tuple(row) for row in r.title_topk(q["text"], 50).collect()]
        want = [
            tuple(row)
            for row in title_match_topk(spark, tiny_corpus, q["text"], 50).collect()
        ]
        assert got == want, q["text"]


def test_stats_df_conserves_logical_stats(spark, tiny_corpus, tmp_path_factory):
    """stats_df (artifact-derived) == the same aggregates recomputed
    from the corpus text; Σdf == token-row count (posting conservation
    through compression); also holds on a MERGED index (which has no
    tokens artifact — stats come from dictionary + doc_stats only)."""
    from engine.build import dictionary_df, doc_stats_df, tokens_df
    from engine.index import build_index
    from engine.merge import merge_indexes
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("stats_idx"))
    r = build_index(spark, tiny_corpus, d, use_stem=False, n_shards=4, n_chunks=1)
    got = r.stats_df().collect()[0]

    toks = tokens_df(tiny_corpus, use_stem=False).persist()
    n_post = toks.count()  # (doc_id, term) rows == Σdf
    dic = dictionary_df(toks)
    n_terms = dic.count()
    ds = doc_stats_df(tiny_corpus, toks).agg(
        F.count("*").alias("n"), F.sum("doc_len").alias("t")
    ).collect()[0]
    assert got["n_docs"] == ds["n"]
    assert got["n_tokens"] == ds["t"]
    assert got["n_terms"] == n_terms
    assert got["n_postings"] == n_post
    assert got["avgdl"] == round(ds["t"] / ds["n"], 6)

    # merged twin: split the corpus, build halves, merge — stats equal
    half_a = tiny_corpus.where(F.col("doc_id") % 2 == 0)
    half_b = tiny_corpus.where(F.col("doc_id") % 2 == 1)
    da = str(tmp_path_factory.mktemp("stats_a"))
    db = str(tmp_path_factory.mktemp("stats_b"))
    dm = str(tmp_path_factory.mktemp("stats_m"))
    build_index(spark, half_a, da, use_stem=False, n_shards=4, n_chunks=1)
    build_index(spark, half_b, db, use_stem=False, n_shards=4, n_chunks=1)
    merged = merge_indexes(spark, da, db, dm)
    got_m = merged.stats_df().collect()[0]
    assert tuple(got_m) == tuple(got)
