"""Semantic checks for the training-data-pipeline operators (the exact
cross-engine parity is covered by tests/test_driver_contract.py; these
verify the operators do the right THING on constructed inputs)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog near the river delta"),  # near dup
        (4, "completely different content about spark shuffle partitions and joins"),
        (5, "der hund ist nicht mit der katze und der maus"),  # German-ish
        (6, ""),  # empty
    ]
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_exact_dedup(docs):
    from engine.dedup import exact_dedup

    out = {r["content_sha256"]: (r["n_dups"], r["keeper_doc_id"])
           for r in exact_dedup(docs).collect()}
    assert (2, 1) in out.values()  # docs 1+2 collapse, keeper = min id
    assert sum(n for n, _ in out.values()) == 6


def test_ngram_jaccard_finds_near_dup(docs):
    from engine.dedup import ngram_jaccard_pairs

    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_minhash_lsh_candidates(docs):
    from engine.dedup import minhash_candidate_pairs, minhash_signatures

    sigs = minhash_signatures(docs)
    assert sigs.groupBy("doc_id").count().collect()[0]["count"] == 16
    cands = {(r["doc_a"], r["doc_b"]) for r in minhash_candidate_pairs(docs).collect()}
    assert (1, 2) in cands  # identical docs agree on every band


def test_simhash_identity_and_banding(docs):
    from engine.dedup import simhash, simhash_dup_pairs

    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sh[1] == sh[2]
    assert 0 <= sh[1] < 2**60
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_dup_pairs(docs).collect()}
    assert pairs[(1, 2)] == 0


def test_lang_profile(docs):
    from engine.textops import lang_profile

    out = {r["doc_id"]: r["lang_pred"] for r in lang_profile(docs).collect()}
    assert out[1] == "en"
    assert out[5] == "de"
    assert out[6] == "en"  # zero hits everywhere → priority order


def test_quality_and_token_stats(docs):
    from engine.textops import quality_score, token_stats

    st = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert st[6]["n_tokens"] == 0 and st[6]["avg_token_len"] == 0.0
    assert st[1]["n_tokens"] == 13 and st[1]["n_stop"] == 4  # the x3 + over
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    assert q[6] == 0.0 and 0 < q[1] <= 1.0


def test_fingerprint_order_sensitive(spark):
    from engine.textops import doc_fingerprint

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id long, content string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(df).collect()}
    assert fp[1] == fp[3] != fp[2]


def test_cosine_topk_self_first(spark):
    from engine.sim import cosine_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.9, 0.1, 0.0]), (3, [0.0, 1.0, 0.0]),
         (4, [-1.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = cosine_topk(emb, [1.0, 0.0, 0.0], 3).collect()
    assert [r["vec_id"] for r in out] == [1, 2, 3]
    assert out[0]["cos"] == 1.0


def test_lsh_bucket_groups_similar(spark):
    from engine.sim import lsh_buckets, lsh_topk

    emb = spark.createDataFrame(
        [(i, [1.0 + 0.01 * i, 0.5, -0.2, 0.3]) for i in range(5)]
        + [(10, [-1.0, -0.5, 0.2, -0.3])],
        "vec_id long, embedding array<float>",
    )
    b = {r["vec_id"]: r["bucket"] for r in lsh_buckets(emb).collect()}
    assert len({b[i] for i in range(5)}) == 1  # near-identical vecs share a bucket
    assert b[10] != b[0]  # the antipode lands elsewhere
    out = lsh_topk(emb, [1.0, 0.5, -0.2, 0.3], 3).collect()
    assert 10 not in [r["vec_id"] for r in out]


def test_multimodal_plumbing(spark):
    from engine.multimodal import (
        decode_stub, extract_features, media_from_documents, media_meta,
    )

    docs = spark.createDataFrame(
        [(0, "abc"), (1, "defg"), (2, "")], "doc_id long, text string"
    )
    media = media_from_documents(docs)
    meta = {r["doc_id"]: r for r in media_meta(media).collect()}
    assert meta[0]["media_type"] == "image" and meta[0]["n_bytes"] == 3
    assert meta[2]["n_bytes"] == 0
    feats = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert len(feats[1]["feature"]) == 8
    assert feats[2]["feature"] == [0.0] * 8
    # deterministic stub
    import numpy as np
    assert np.allclose(decode_stub(b"abc", "image"), decode_stub(b"abc", "audio"))

def test_multimodal_resize_and_frames(spark):
    from engine.multimodal import media_from_documents, resize_images, sample_frames
    from engine.packaging import ensure_importable

    ensure_importable(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = media_from_documents(docs)
    px = resize_images(media, 4, 4)
    rows = px.limit(5).collect()
    assert rows and all(len(r["pixels"]) == 16 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["pixels"])
    fr = sample_frames(media, 3)
    n_videos = media.where("media_type = 'video'").count()
    assert fr.count() == 3 * n_videos
    one = fr.where(fr.doc_id == fr.select("doc_id").first()["doc_id"]).collect()
    assert sorted(r["frame_idx"] for r in one) == [0, 1, 2]
    # determinism
    a = sorted(map(tuple, resize_images(media, 4, 4).limit(3).collect()))
    b = sorted(map(tuple, resize_images(media, 4, 4).limit(3).collect()))
    assert [r[0] for r in a] == [r[0] for r in b]


def test_gopher_repetition_flags(spark):
    """Gopher repetition rules on constructed docs: trimmed-dup lines
    and a dominant 2-gram both trip their thresholds; empty docs pass
    with zero fractions."""
    from engine.textops import gopher_repetition

    clean = " ".join(f"tok{i:02d}word" for i in range(40))
    rows = [
        (1, clean[:len(clean) // 2] + "\n" + clean[len(clean) // 2:]),
        (2, "same line here\nsame line here\nsame line here\n  same line here "),
        (3, "spark engine spark engine spark engine spark engine"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    out = {r["doc_id"]: r for r in gopher_repetition(df).collect()}
    # 40 distinct tokens → top 2-gram covers 2/40 = 0.05 ≤ 0.2
    assert out[1]["gopher_pass"]
    # 4 trimmed-identical lines → (4-1)/4 duplicates
    assert out[2]["dup_line_frac"] == 0.75 and not out[2]["gopher_pass"]
    # "spark engine" covers all 8 tokens: 2*4/8
    assert out[3]["top_2gram_frac"] == 1.0 and not out[3]["gopher_pass"]
    assert (out[4]["dup_line_frac"], out[4]["top_2gram_frac"]) == (0.0, 0.0)
    assert out[4]["gopher_pass"]


def test_line_dedup_drop_path(spark):
    """Cross-doc line dedup on constructed docs: a line in >= min_docs
    distinct docs drops everywhere (whitespace-trimmed comparison),
    blanks are kept, the cleaned sha round-trips, and the DuckDB mirror
    agrees value-for-value (the driver testdata has no repeated lines,
    so the drop path is pinned here)."""
    import hashlib

    import duckdb
    import pandas as pd

    from engine.dedup import line_dedup_sql, line_dedup_stats

    boiler = "subscribe to our newsletter"
    docs = {
        1: f"alpha content one\n{boiler}\n\nunique tail one",
        2: f"  {boiler}  \nbeta content two",
        3: f"{boiler}\ngamma content three\ngamma content three",
        4: "delta content four",
    }
    sdf = spark.createDataFrame(
        sorted(docs.items()), "doc_id long, content string"
    )
    got = {
        r["doc_id"]: r
        for r in line_dedup_stats(sdf, min_docs=3).collect()
    }
    # the boilerplate line (trim-equal in 3 docs) drops everywhere,
    # including the whitespace variant; within-doc repeats of a line
    # seen in only 1 doc are kept
    def clean(text):
        kept = [
            l for l in text.split("\n")
            if l.strip() != boiler or not l.strip()
        ]
        return "\n".join(kept)

    for d, text in docs.items():
        want_sha = hashlib.sha256(clean(text).encode()).hexdigest()
        assert got[d]["clean_sha256"] == want_sha, d
    assert got[1]["n_dropped"] == 1 and got[1]["n_lines"] == 4
    assert got[2]["n_dropped"] == 1
    assert got[3]["n_dropped"] == 1  # the two gamma repeats stay (1 doc)
    assert got[4]["n_dropped"] == 0

    con = duckdb.connect()
    pdf = pd.DataFrame(
        {"doc_id": list(docs), "text": [docs[d] for d in docs]}
    )
    con.register("documents", pdf)
    want = {
        int(r[0]): r
        for r in con.execute(line_dedup_sql(min_docs=3)).fetchall()
    }
    for d in docs:
        g = got[d]
        assert (g["n_lines"], g["n_dropped"], g["clean_sha256"]) == (
            want[d][1], want[d][2], want[d][3],
        ), d


def test_decontaminate_flags_and_parity(spark):
    """Benchmark decontamination on constructed docs: a training doc
    sharing >= 1 exact n-gram with an eval doc is contaminated, partial
    n-1 overlaps are NOT, short docs report (0, 0, false), and the
    DuckDB mirror agrees value-for-value. doc_ids are picked so the mix
    split puts doc 100 in the eval set and the rest in training
    (mix(100) % 100 = 87 < pct=90 is avoided by using pct=50:
    membership is asserted, not assumed)."""
    import duckdb
    import pandas as pd

    from engine.decontam import decontaminate, decontaminate_sql, eval_split
    from engine.sampling import MIX_MOD, MIX_MUL, MIX_PRE

    mix = lambda d: ((d % MIX_PRE) * MIX_MUL + d % 97) % MIX_MOD  # noqa: E731
    pct = 50
    # find one eval id and three train ids deterministically
    ids = list(range(1, 40))
    ev_ids = [d for d in ids if mix(d) % 100 < pct]
    tr_ids = [d for d in ids if mix(d) % 100 >= pct]
    assert ev_ids and len(tr_ids) >= 3
    e0, (t0, t1, t2) = ev_ids[0], tr_ids[:3]
    gram = "alpha beta gamma delta"  # n=4 gram copied verbatim
    docs = {
        e0: f"{gram} epsilon zeta eta theta",           # eval doc
        t0: f"intro words {gram} trailing words",       # contaminated
        t1: "alpha beta gamma OTHER delta epsilon zeta",  # only 3-of-4 runs
        t2: "too short",                                 # < n tokens
    }
    sdf = spark.createDataFrame(
        sorted(docs.items()), "doc_id long, content string"
    )
    assert [r["doc_id"] for r in eval_split(sdf, pct).select("doc_id").collect()] == [e0]
    got = {
        r["doc_id"]: r
        for r in decontaminate(sdf, n=4, pct=pct).collect()
    }
    assert set(got) == {t0, t1, t2}  # eval doc excluded from output
    assert got[t0]["contaminated"] and got[t0]["n_overlap"] == 1
    assert not got[t1]["contaminated"] and got[t1]["n_overlap"] == 0
    assert got[t2] ["n_ngrams"] == 0 and not got[t2]["contaminated"]

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())}),
    )
    want = {
        int(r[0]): r
        for r in con.execute(decontaminate_sql(n=4, pct=pct)).fetchall()
    }
    assert set(want) == set(got)
    for d in got:
        g = got[d]
        assert (g["n_ngrams"], g["n_overlap"], g["contaminated"]) == (
            want[d][1], want[d][2], bool(want[d][3]),
        ), d


def test_decontaminate_plan_is_broadcast(spark):
    """The eval gram set must come in as a broadcast build side and the
    per-doc count must combine map-side — the only corpus-sized exchange
    allowed is the post-combine groupBy(doc_id)."""
    from engine.decontam import decontaminate

    sdf = spark.createDataFrame(
        [(i, f"token{i} alpha beta gamma delta epsilon") for i in range(1, 30)],
        "doc_id long, content string",
    )
    plan = decontaminate(sdf, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_sum" in plan


def test_lm_score_semantics_and_parity(spark):
    """Bigram LM on a constructed corpus: a doc written in the reference
    split's own phrasing outscores a doc of unseen bigrams; short docs
    report (0, NULL); pair counts are exact; and the DuckDB mirror
    agrees value-for-value (ref membership asserted via mix, like the
    decontaminate test)."""
    import duckdb
    import pandas as pd

    from engine.lm import lm_score, lm_score_sql
    from engine.sampling import MIX_MOD, MIX_MUL, MIX_PRE

    mix = lambda d: ((d % MIX_PRE) * MIX_MUL + d % 97) % MIX_MOD  # noqa: E731
    pct = 50
    ids = list(range(1, 40))
    ref_ids = [d for d in ids if mix(d) % 100 < pct]
    other = [d for d in ids if mix(d) % 100 >= pct]
    assert len(ref_ids) >= 2 and len(other) >= 3
    r0, r1 = ref_ids[:2]
    o_fluent, o_alien, o_short = other[:3]
    docs = {
        r0: "alpha beta gamma alpha beta",
        r1: "beta gamma alpha beta gamma",
        o_fluent: "alpha beta gamma alpha",   # all bigrams seen in ref
        o_alien: "zeta eta theta iota",        # no bigram (or unigram) seen
        o_short: "solo",                       # < 2 tokens
    }
    sdf = spark.createDataFrame(
        sorted(docs.items()), "doc_id long, content string"
    )
    got = {r["doc_id"]: r for r in lm_score(sdf, pct=pct).collect()}
    assert set(got) == set(docs)  # every doc scored, ref docs included
    assert got[o_short]["n_pairs"] == 0 and got[o_short]["avg_logprob"] is None
    for d, text in docs.items():
        if d != o_short:
            assert got[d]["n_pairs"] == len(text.split()) - 1, d
    # fluent doc must outscore the alien one under the ref LM
    assert got[o_fluent]["avg_logprob"] > got[o_alien]["avg_logprob"]
    # alien doc: every pair is unseen-bigram over unseen-unigram ->
    # lp = ln(1 / V) with V = 3 distinct ref unigrams
    import math

    assert got[o_alien]["avg_logprob"] == pytest.approx(math.log(1 / 3), abs=1e-6)

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())}),
    )
    want = {int(r[0]): r for r in con.execute(lm_score_sql(pct=pct)).fetchall()}
    assert set(want) == set(got)
    for d in got:
        g, w = got[d], want[d]
        assert g["n_pairs"] == w[1], d
        assert (g["avg_logprob"] is None) == (w[2] is None), d
        if g["avg_logprob"] is not None:
            assert g["avg_logprob"] == w[2], d


def test_lm_score_plan_broadcasts_counts(spark):
    """Both LM count tables (unigram, bigram) must join in as broadcast
    build sides on a reference-split-sized input — AQE converts the
    stat-less static SMJs at runtime, so inspect the FINAL adaptive
    plan after execution — and the per-doc mean must combine map-side
    before its exchange."""
    from engine.lm import lm_score

    sdf = spark.createDataFrame(
        [(i, f"alpha beta gamma tok{i} delta epsilon") for i in range(1, 30)],
        "doc_id long, content string",
    )
    df = lm_score(sdf)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    final = plan.split("== Initial Plan ==")[0]  # AQE echoes the pre-
    # conversion SMJ plan after this marker; judge only what ran
    assert final.count("BroadcastHashJoin") >= 2, final
    assert "SortMergeJoin" not in final, final
    assert "partial_avg" in final or "partial_count" in final, final


def test_dup_ngram_stats_semantics(spark):
    """Two docs sharing a verbatim 3-gram run both report it as dup;
    a doc with unique grams reports 0; a doc below n tokens reports
    (0, 0, NULL). n=3 keeps the fixture readable."""
    from engine.dedup import dup_ngram_stats

    rows = [
        (1, "alpha beta gamma delta"),          # grams: abc, bcd (abc shared)
        (2, "alpha beta gamma zeta"),            # grams: abg, bgz -> abg shared
        (3, "uniq1 uniq2 uniq3 uniq4"),          # all unique
        (4, "too short"),                         # < 3 tokens
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, content string")
    got = {r["doc_id"]: r for r in dup_ngram_stats(sdf, n=3).collect()}
    assert got[1]["n_ngrams"] == 2 and got[1]["n_dup_ngrams"] == 1
    assert got[2]["n_ngrams"] == 2 and got[2]["n_dup_ngrams"] == 1
    assert got[1]["dup_ngram_frac"] == 0.5
    assert got[3]["n_dup_ngrams"] == 0 and got[3]["dup_ngram_frac"] == 0.0
    assert got[4]["n_ngrams"] == 0 and got[4]["dup_ngram_frac"] is None


def test_chunk_plan_layout(spark):
    """Chunk math on a 10-token doc with chunk=4/stride=3: starts at
    1,4,7,10; tail chunks clamp; every chunk hashes its own slice; a
    zero-token doc emits nothing."""
    import hashlib

    from engine.sampling import chunk_plan

    toks = [f"tok{i:02d}" for i in range(1, 11)]
    sdf = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "...")], "doc_id long, content string"
    )
    out = sorted(
        chunk_plan(sdf, 4, stride=3).collect(), key=lambda r: r["chunk_id"]
    )
    assert [r["doc_id"] for r in out] == [1, 1, 1, 1]
    assert [(r["tok_start"], r["tok_end"], r["n_chunk_tokens"]) for r in out] == [
        (1, 4, 4), (4, 7, 4), (7, 10, 4), (10, 10, 1),
    ]
    for r in out:
        want = " ".join(toks[r["tok_start"] - 1 : r["tok_end"]])
        assert r["chunk_sha256"] == hashlib.sha256(want.encode()).hexdigest()


def test_source_mix_weights_temperature(spark):
    """tau<1 must upsample the small domain: its mix_weight exceeds its
    token_share, the big domain's is below, and weights sum to 1."""
    from engine.sampling import source_mix_weights

    rows = [(i, "tok " * 100, "big") for i in range(1, 10)] + [
        (10, "tok tok tok", "small")
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, content string, source string")
    got = {r["source"]: r for r in source_mix_weights(sdf, tau=0.5).collect()}
    assert got["small"]["mix_weight"] > got["small"]["token_share"]
    assert got["big"]["mix_weight"] < got["big"]["token_share"]
    assert abs(got["big"]["mix_weight"] + got["small"]["mix_weight"] - 1) < 1e-5
    assert got["big"]["n_docs"] == 9 and got["small"]["n_tokens"] == 3


def test_chunk_plan_invariants_sweep(spark):
    """Layout invariants over doc lengths 1..25 x three (chunk, stride)
    configs: chunk count = floor((m-1)/stride)+1, every token position
    covered, consecutive non-overlap reconstructs the stream, overlap
    configs repeat exactly (chunk - stride) positions between
    neighbours except at the tail."""
    from engine.sampling import chunk_plan

    rows = [
        (m, " ".join(f"tok{j:03d}" for j in range(1, m + 1)))
        for m in range(1, 26)
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, content string")
    for chunk, stride in [(8, 8), (8, 5), (3, 3)]:
        got = {}
        for r in chunk_plan(sdf, chunk, stride=stride).collect():
            got.setdefault(r["doc_id"], []).append(r)
        for m, chunks in got.items():
            chunks.sort(key=lambda r: r["chunk_id"])
            assert len(chunks) == (m - 1) // stride + 1, (m, chunk, stride)
            covered = set()
            for i, r in enumerate(chunks):
                assert r["tok_start"] == 1 + i * stride
                assert r["tok_end"] == min(r["tok_start"] + chunk - 1, m)
                assert r["n_chunk_tokens"] == r["tok_end"] - r["tok_start"] + 1
                covered.update(range(r["tok_start"], r["tok_end"] + 1))
            assert covered == set(range(1, m + 1)), (m, chunk, stride)
        assert set(got) == set(range(1, 26))
