"""dup_clusters / dedup_canonical (engine/cluster.py) and deterministic
sampling (engine/sampling.py): semantics, convergence discipline, and
the plan shapes the 100 TB story depends on."""

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_ops(plan: str, op: str) -> int:
    return len(re.findall(rf"^\(\d+\) {op}", plan, flags=re.M))


def _corpus(spark, ids_and_text):
    return spark.createDataFrame(
        [(i, t) for i, t in ids_and_text], "doc_id long, content string"
    )


def _pairs(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "doc_a long, doc_b long"
    )


@pytest.mark.slow
def test_chain_collapses_to_min_label(spark):
    from engine.cluster import dup_clusters

    # a 5-node path (diameter 4) + an isolated doc + a separate pair
    corpus = _corpus(spark, [(i, f"d{i}") for i in range(1, 9)])
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (7, 8)])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dup_clusters(corpus, pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6, 7: 7, 8: 7}


def test_round_cap_raises_instead_of_truncating(spark):
    from engine.cluster import dup_clusters

    corpus = _corpus(spark, [(i, f"d{i}") for i in range(1, 7)])
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(corpus, pairs, max_rounds=2)


def test_canonical_longest_then_smallest_id(spark):
    from engine.cluster import dedup_canonical, dup_clusters

    corpus = _corpus(
        spark,
        [(1, "aaaa"), (2, "aaaaaaaa"), (3, "aaaaaaaa"), (4, "zz"), (5, "q")],
    )
    pairs = _pairs(spark, [(1, 2), (2, 3)])
    clusters = dup_clusters(corpus, pairs)
    rows = dedup_canonical(corpus, clusters).collect()
    assert len(rows) == 1  # singletons excluded
    r = rows[0]
    # docs 2 and 3 tie on length 8 -> smallest doc_id wins
    assert (r["cluster_id"], r["canonical_doc_id"], r["n_members"]) == (1, 2, 3)


@pytest.mark.slow
def test_clean_corpus_drops_dup_losers_and_low_quality(spark):
    from engine.cluster import clean_corpus

    # two near-identical docs (shingle/minhash dups) + distinct docs;
    # content long enough to pass the length credit at min_quality=0
    base = "the quick brown fox jumps over the lazy dog " * 6
    corpus = _corpus(
        spark,
        [
            (1, base + "alpha"),
            (2, base + "alpha"),  # exact near-dup of 1 (longer id loses)
            (3, "completely different text about spark query engines " * 6),
        ],
    )
    kept = {r["doc_id"] for r in clean_corpus(corpus, min_quality=0.0).collect()}
    # 1 and 2 tie on length -> smallest doc_id (1) is canonical; 3 is a singleton
    assert kept == {1, 3}
    assert clean_corpus(corpus, min_quality=1.0).count() == 0


def test_token_pack_cumsum_bins(spark):
    from engine.sampling import token_pack

    # doc_ids all ≡ 0 (mod 8) -> one pack shard; token counts 3, 2, 4
    # (the engine token pattern requires ≥3-char words)
    corpus = _corpus(
        spark, [(0, "aaa bbb ccc"), (8, "ddd eee"), (16, "fff ggg hhh iii")]
    )
    rows = {
        r["doc_id"]: (r["pack_shard"], r["n_tokens"], r["bin_id"], r["bin_offset"])
        for r in token_pack(corpus, budget=4).collect()
    }
    # prefix sums (exclusive): 0, 3, 5 -> bins 0, 0, 1; offsets 0, 3, 1
    assert rows == {0: (0, 3, 0, 0), 8: (0, 2, 0, 3), 16: (0, 4, 1, 1)}


def test_token_pack_one_exchange(spark):
    from engine.sampling import token_pack

    df = spark.createDataFrame(
        [(i, "x y z") for i in range(64)], "doc_id long, content string"
    )
    p = plan_of(token_pack(df))
    assert n_ops(p, "Exchange") == 1, p


def test_hash_sample_is_pure_pushed_filter(spark):
    from engine.sampling import hash_sample

    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    sampled = hash_sample(df, 10)
    p = plan_of(sampled)
    assert "Exchange" not in p, p
    n = sampled.count()
    assert 50 <= n <= 160  # ~10% of 1000, deterministic
    # join-stable: re-evaluation yields the identical membership
    a = {r["doc_id"] for r in sampled.collect()}
    b = {r["doc_id"] for r in hash_sample(df, 10).collect()}
    assert a == b


def test_stratified_sample_exact_n_one_exchange(spark):
    from engine.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr") for i in range(90)],
        "doc_id long, lang string",
    )
    out = stratified_sample(df, 5, by="lang")
    p = plan_of(out)
    assert n_ops(p, "Exchange") == 1, p
    # the rank cut is pushed below the shuffle as a group-limit
    assert "WindowGroupLimit" in p, p
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["lang"], []).append(r["sample_rank"])
    assert {k: sorted(v) for k, v in per.items()} == {
        "en": [1, 2, 3, 4, 5],
        "fr": [1, 2, 3, 4, 5],
    }


def test_hygiene_keep_composition(spark):
    """The composed keep table: a near-dup loser fails is_canonical, a
    repetitive doc fails gopher, eval-split docs are absent, and the
    DuckDB twin agrees value-for-value on the fixture."""
    import duckdb
    import pandas as pd

    from engine.cluster import hygiene_keep, hygiene_keep_sql
    from engine.sampling import MIX_MOD, MIX_MUL, MIX_PRE

    mix = lambda d: ((d % MIX_PRE) * MIX_MUL + d % 97) % MIX_MOD  # noqa: E731
    # training ids only (default eval split is mix % 100 < 10)
    tr = [d for d in range(1, 60) if mix(d) % 100 >= 10]
    base = (
        "spark shuffle partition broadcast join window aggregate filter "
        "project scan exchange codegen adaptive skew salt bucket merge "
        "sort limit sample"
    )
    t0, t1, t2, t3 = tr[:4]
    docs = {
        t0: base + " extra tail tokens here",   # canonical (longest dup)
        t1: base,                                 # near-dup loser
        t2: "spam spam " * 30,                    # gopher repetition fail
        t3: "clean unique prose about engines " + base[::-1].lower(),
    }
    sdf = spark.createDataFrame(
        sorted(docs.items()), "doc_id long, content string"
    )
    got = {r["doc_id"]: r for r in hygiene_keep(sdf).collect()}
    assert set(got) == set(docs)
    if not got[t1]["is_canonical"]:   # LSH is probabilistic at n=1 band set;
        assert not got[t1]["keep"]    # when the pair IS caught, loser drops
    assert not got[t2]["gopher_pass"] and not got[t2]["keep"]
    assert not got[t0]["contaminated"]

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())}),
    )
    want = {int(r[0]): r for r in con.execute(hygiene_keep_sql()).fetchall()}
    assert set(want) == set(got)
    for d in got:
        g, w = got[d], want[d]
        assert (
            g["is_canonical"], g["quality"], g["gopher_pass"],
            g["contaminated"], g["dup_ngram_frac"], g["keep"],
        ) == (
            bool(w[1]), w[2], bool(w[3]), bool(w[4]), w[5], bool(w[6]),
        ), d


def test_star_edges_give_identical_clusters_to_clique_pairs(spark):
    """minhash_candidate_edges (per-bucket star, linear in bucket size)
    must yield EXACTLY the same dup_clusters labeling as the full
    candidate-pair clique — union-of-stars and union-of-cliques have
    the same connected components. This is the invariance that lets
    the clustering consumers skip the m² pair materialization."""
    from engine.cluster import dup_clusters
    from engine.dedup import minhash_candidate_edges, minhash_candidate_pairs
    from engine.io import read_documents

    docs = (
        read_documents(spark, "/root/testdata/sf0.001")
        .select("doc_id", F.col("text").alias("content"))
        .cache()
    )
    via_pairs = {
        (r["doc_id"], r["cluster_id"])
        for r in dup_clusters(docs, minhash_candidate_pairs(docs)).collect()
    }
    via_edges = {
        (r["doc_id"], r["cluster_id"])
        for r in dup_clusters(docs, minhash_candidate_edges(docs)).collect()
    }
    assert via_edges == via_pairs
    # and the star stream is never larger than the clique stream
    n_pairs = minhash_candidate_pairs(docs).count()
    n_edges = minhash_candidate_edges(docs).count()
    assert n_edges <= n_pairs
