"""Round-2 additions: retrieval metrics (SURVEY.md §5.1 idiom),
index-backed fusion parity, doc_id collision guard, checkpoint-format
version gating."""

import json
import os
import shutil

import pytest

from engine.index import MANIFEST, IndexReader, build_index
from engine.metrics import average_precision, evaluate_run, precision_at_k


# ------------------------------------------------------------- metrics

def test_precision_at_k_basic():
    assert precision_at_k([1, 2, 3, 4], {1, 3}, 2) == 0.5
    assert precision_at_k([1, 2, 3, 4], {1, 3}, 4) == 0.5
    assert precision_at_k([], {1}, 10) == 0.0
    # k is the denominator even when fewer results exist
    assert precision_at_k([1], {1}, 10) == 0.1


def test_average_precision_known_value():
    # relevant at positions 1 and 3 of 3, |rel|=2: (1/1 + 2/3)/2
    assert abs(average_precision([7, 8, 9], {7, 9}) - (1.0 + 2 / 3) / 2) < 1e-9
    assert average_precision([8, 9], set()) == 0.0
    # perfect ranking
    assert average_precision([1, 2], {1, 2}) == 1.0


def test_evaluate_run_identity_and_perturbed(tiny_docs, queries):
    from oracle.bm25_ref import golden_topk_frame

    golden = golden_topk_frame(tiny_docs, queries[:8], 10, use_stem=True)
    rep = evaluate_run(golden, golden, k=10)
    assert rep["map"] == 1.0 and rep["mean_p_at_k"] == 1.0
    assert rep["n_queries"] == len(golden["query_id"].unique())

    # drop every even-ranked doc → strictly worse than identity
    perturbed = golden[golden["rank"] % 2 == 1].copy()
    perturbed["rank"] = perturbed.groupby("query_id").cumcount() + 1
    rep2 = evaluate_run(perturbed, golden, k=10)
    assert rep2["map"] < 1.0
    assert rep2["mean_p_at_k"] < 1.0

    # a query missing from the run scores 0, not skipped
    one_q = golden["query_id"].iloc[0]
    partial = golden[golden["query_id"] == one_q]
    rep3 = evaluate_run(partial, golden, k=10)
    assert rep3["n_queries"] == rep["n_queries"]
    assert rep3["map"] < rep2["map"]


# --------------------------------------- index-backed fusion (/search)

@pytest.fixture(scope="module")
def unstem_index_dir(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_unstem"))
    build_index(spark, tiny_corpus, d, use_stem=False, n_shards=4, n_chunks=2)
    return d


@pytest.mark.slow
def test_index_fusion_matches_recompute(spark, tiny_corpus, unstem_index_dir, queries):
    """IndexReader.fusion_topk (index BM25 + title-terms table) must
    match engine/ranking.fusion_topk (recompute path) — same pinned
    formula; scores compared to 2e-6 (different float-sum orders)."""
    from engine.ranking import fusion_topk

    r = IndexReader(spark, unstem_index_dir)
    for q in queries[:4]:
        got = r.fusion_topk(q["text"], 10).collect()
        want = fusion_topk(spark, tiny_corpus, q["text"], 10).collect()
        assert [(x["rank"], x["doc_id"]) for x in got] == [
            (x["rank"], x["doc_id"]) for x in want
        ], q["text"]
        for a, b in zip(got, want):
            assert abs(a["score"] - b["score"]) <= 2e-6


def test_bm25_scores_all_is_exhaustive(spark, tiny_corpus, unstem_index_dir,
                                       tiny_docs, queries):
    """bm25_scores_all returns EVERY matching doc with its full score."""
    from oracle.bm25_ref import OracleIndex

    r = IndexReader(spark, unstem_index_dir)
    oracle = OracleIndex(tiny_docs, use_stem=False)
    q = queries[0]["text"]
    got = {row["doc_id"]: row["score"] for row in r.bm25_scores_all(q).collect()}
    want = dict(oracle.bm25_topk(q, k=10**9))
    assert set(got) == set(want)
    for d, s in want.items():
        assert abs(got[d] - s) <= 1e-6


# ------------------------------------------- ANN scale-path properties

@pytest.mark.slow
def test_multiprobe_superset_and_ivf_cover(spark):
    """Multi-probe candidates ⊇ single-bucket candidates (the recall
    dial is monotone); IVF assigns every vector exactly one cell."""
    from engine.sim import (
        IVF_K,
        _query_bucket,
        ivf_cells,
        load_embeddings,
        lsh_buckets,
        query_vector,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    emb = load_embeddings(spark, sf)
    q = query_vector(spark, sf)
    qb = _query_bucket(q, 8)
    b = lsh_buckets(emb)
    single = {r["vec_id"] for r in b.where(F.col("bucket") == qb).collect()}
    multi = {
        r["vec_id"]
        for r in b.where(
            F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qb))) <= 1
        ).collect()
    }
    assert single <= multi and len(multi) > len(single)

    cells = ivf_cells(emb).collect()
    assert len(cells) == emb.count()
    assert all(0 <= r["cell"] < IVF_K for r in cells)


# --------------------------------------------- build-time guard rails

def test_doc_id_collision_fails_build(spark, tmp_path_factory):
    rows = [
        ("r", "a", "c", "en", "alpha beta gamma", "s1", 42),
        ("r", "b", "c", "en", "delta epsilon zeta", "s2", 42),  # same doc_id
        ("r", "d", "c", "en", "eta theta iota", "s3", 7),
    ]
    df = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "content string, content_sha256 string, doc_id long",
    )
    d = str(tmp_path_factory.mktemp("index_collide"))
    with pytest.raises(AssertionError, match="doc_id collision"):
        build_index(spark, df, d, use_stem=False, n_shards=2, n_chunks=1)


@pytest.mark.slow
def test_old_checkpoint_format_triggers_rebuild(spark, tiny_corpus,
                                                unstem_index_dir,
                                                tmp_path_factory):
    """An index dir whose manifest predates the current checkpoint
    format must rebuild cleanly instead of crashing on resume."""
    d2 = str(tmp_path_factory.mktemp("index_oldfmt"))
    shutil.copytree(unstem_index_dir, d2, dirs_exist_ok=True)
    p = os.path.join(d2, MANIFEST)
    with open(p) as f:
        man = json.load(f)
    man["config"]["checkpoint_format"] = 1  # pretend: exploded-row tokens
    with open(p, "w") as f:
        json.dump(man, f)
    r = build_index(spark, tiny_corpus, d2, use_stem=False, n_shards=4, n_chunks=2)
    assert r.manifest["config"]["checkpoint_format"] >= 3
    assert r.manifest["stages"]["complete"] == "done"
