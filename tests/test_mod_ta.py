"""Modifier TA serving (round 4): IndexReader.function_score_topk /
field_value_factor_topk and the TA paths inside boosting_topk /
msm_topk (engine/index._mod_serve — per-shard block-max candidates,
modifier applied to candidates only, serve iff θ_b·f_max < Θ − margin)
must be VALUE-identical to the exhaustive recompute formulas
(engine/funcscore.py, the DuckDB-oracle-pinned semantics) on both
sides of the fallback seam."""

import pytest
from pyspark.sql import functions as F

from engine.index import IndexReader, build_index

# index-building module → slow lane (core-lane coverage of these
# operators is the recompute parity + driver-contract exact sweeps)
pytestmark = pytest.mark.slow

ROUND = 6
ORIGIN, SCALE, DECAY = 300.0, 150.0, 0.5


@pytest.fixture(scope="module")
def mod_index_dir(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_mod_ta"))
    build_index(spark, tiny_corpus, d, use_stem=False, n_shards=4, n_chunks=2)
    return d


@pytest.fixture(scope="module")
def docs_meta(tiny_corpus):
    """Corpus + the numeric field the modifiers ride (derived, so the
    200-doc fixture needs no schema change)."""
    return tiny_corpus.withColumn(
        "n_chars", F.length("content").cast("long")
    ).cache()


def _rows(df):
    return [(r["rank"], r["doc_id"], r["score"]) for r in df.collect()]


def _ta_reader(spark, d):
    r = IndexReader(spark, d)
    r._FUSION_TA_MIN_DOCS = 0  # force TA dispatch on the 200-doc fixture
    # open the factor-envelope dispatch gate: these tests exercise the
    # TA bound itself, including regimes the cost-based dispatch would
    # route straight to exhaustive
    r._MOD_TA_FACTOR_FLOOR = 0.0
    return r


def _cut_reader(spark, d):
    """TA reader whose kernel depth is forced below the per-shard match
    count, so outside_possible=True and the θ_b·f_max bound is actually
    evaluated (certify OR post-work miss — both must stay exact)."""
    r = _ta_reader(spark, d)
    r._MOD_TA_KBODY_MULT = (0, 0)
    r._MOD_TA_KBODY = (2, 4)
    return r


def test_function_score_ta_matches_recompute(
    spark, mod_index_dir, docs_meta, queries
):
    from engine.funcscore import function_score_topk

    r = _ta_reader(spark, mod_index_dir)
    meta = docs_meta.select("doc_id", "n_chars")
    for q in queries[:4]:
        got = _rows(r.function_score_topk(
            q["text"], meta, 5, value_col="n_chars",
            origin=ORIGIN, scale=SCALE, decay=DECAY, round_scores=ROUND,
        ))
        want = _rows(function_score_topk(
            spark, docs_meta, q["text"], 5, field="n_chars",
            origin=ORIGIN, scale=SCALE, decay=DECAY, round_scores=ROUND,
        ))
        assert got == want, q["text"]
    # 3 of the first 4 fixture queries have tokens; at 200 docs the
    # kernel never cuts, so TA serves via the complete-set path
    assert r.mod_ta_served >= 3


def test_function_score_ta_bound_path(spark, mod_index_dir, docs_meta, queries):
    from engine.funcscore import function_score_topk

    r = _cut_reader(spark, mod_index_dir)
    meta = docs_meta.select("doc_id", "n_chars")
    for q in queries[:4]:
        got = _rows(r.function_score_topk(
            q["text"], meta, 1, value_col="n_chars",
            origin=ORIGIN, scale=SCALE, decay=DECAY, round_scores=ROUND,
        ))
        want = _rows(function_score_topk(
            spark, docs_meta, q["text"], 1, field="n_chars",
            origin=ORIGIN, scale=SCALE, decay=DECAY, round_scores=ROUND,
        ))
        assert got == want, q["text"]
    # one variant key across the 4 queries: after _FUSION_TA_FAIL_LIMIT
    # consecutive misses the variant disables, so the floor is 2
    assert r.mod_ta_served + r.mod_ta_fallback >= 2


def test_function_score_unrounded_serving(spark, mod_index_dir, docs_meta, queries):
    """round_scores=None (the frontend's serving mode): the bound needs
    no rounding margin; TA and exhaustive must agree on doc order."""
    r = _ta_reader(spark, mod_index_dir)
    x = IndexReader(spark, mod_index_dir)  # MIN_DOCS gate → exhaustive
    meta = docs_meta.select("doc_id", "n_chars")
    q = queries[0]["text"]
    got = _rows(r.function_score_topk(
        q, meta, 5, value_col="n_chars",
        origin=ORIGIN, scale=SCALE, decay=DECAY,
    ))
    want = _rows(x.function_score_topk(
        q, meta, 5, value_col="n_chars",
        origin=ORIGIN, scale=SCALE, decay=DECAY,
    ))
    # same kernel accumulation + same Spark expression tree on both
    # paths → bit-identical floats, not just same order
    assert got == want
    assert r.mod_ta_served >= 1 and x.mod_ta_served == 0


def test_fvf_ta_matches_recompute(spark, mod_index_dir, docs_meta, queries):
    from engine.funcscore import field_value_factor_topk

    r = _cut_reader(spark, mod_index_dir)
    meta = docs_meta.select("doc_id", "n_chars")
    for q in queries[:4]:
        got = _rows(r.field_value_factor_topk(
            q["text"], meta, 3, value_col="n_chars", factor=1.0,
            round_scores=ROUND,
        ))
        want = _rows(field_value_factor_topk(
            spark, docs_meta, q["text"], 3, field="n_chars", factor=1.0,
            round_scores=ROUND,
        ))
        assert got == want, q["text"]
    # one variant key across the 4 queries: after _FUSION_TA_FAIL_LIMIT
    # consecutive misses the variant disables, so the floor is 2
    assert r.mod_ta_served + r.mod_ta_fallback >= 2


def test_boosting_ta_matches_recompute(spark, mod_index_dir, tiny_corpus, queries):
    from engine.funcscore import boosting_topk

    r = _cut_reader(spark, mod_index_dir)
    for q in queries[:4]:
        got = _rows(r.boosting_topk(
            q["text"], "merge slow", 3, negative_boost=0.5,
            round_scores=ROUND,
        ))
        want = _rows(boosting_topk(
            spark, tiny_corpus, q["text"], "merge slow", 3,
            negative_boost=0.5, round_scores=ROUND,
        ))
        assert got == want, q["text"]
    # one variant key across the 4 queries: after _FUSION_TA_FAIL_LIMIT
    # consecutive misses the variant disables, so the floor is 2
    assert r.mod_ta_served + r.mod_ta_fallback >= 2


def test_msm_ta_matches_recompute(spark, mod_index_dir, tiny_corpus, queries):
    from engine.funcscore import msm_topk

    r = _cut_reader(spark, mod_index_dir)
    for q in queries[:4]:
        got = _rows(r.msm_topk(
            q["text"], 3, min_should_match=2, round_scores=ROUND,
        ))
        want = _rows(msm_topk(
            spark, tiny_corpus, q["text"], 3, min_should_match=2,
            round_scores=ROUND,
        ))
        assert got == want, q["text"]
    assert r.mod_ta_served + r.mod_ta_fallback >= 1


def test_mod_ta_adaptive_disable(spark, mod_index_dir, docs_meta, queries):
    """A crushing decay (tiny scale, origin inside the field range so
    f_max=1) with a forced kernel cut makes the bound unprovable: after
    _FUSION_TA_FAIL_LIMIT consecutive post-work misses the variant is
    disabled and later queries dispatch straight to exhaustive — every
    answer still exactly the recompute formula's."""
    from engine.funcscore import function_score_topk

    r = _cut_reader(spark, mod_index_dir)
    meta = docs_meta.select("doc_id", "n_chars")
    x = IndexReader(spark, mod_index_dir)
    q = queries[0]["text"]
    for _ in range(r._FUSION_TA_FAIL_LIMIT + 1):
        got = _rows(r.function_score_topk(
            q, meta, 1, value_col="n_chars",
            origin=300.0, scale=1e-3, decay=0.5, round_scores=ROUND,
        ))
        want = _rows(function_score_topk(
            spark, docs_meta, q, 1, field="n_chars",
            origin=300.0, scale=1e-3, decay=0.5, round_scores=ROUND,
        ))
        assert got == want
    if r.mod_ta_served == 0:
        # post-work misses stop at the limit: the final query dispatches
        # straight to exhaustive (disabled variant) without counting
        assert len(r._fusion_ta_off) == 1
        assert r.mod_ta_fallback == r._FUSION_TA_FAIL_LIMIT
    assert x.mod_ta_served == 0


def test_mod_ta_dispatch_gate_default(spark, mod_index_dir, docs_meta, queries):
    """Default factor-envelope floor (0.7): a crushing decay routes
    straight to exhaustive — no candidate pass, no miss recorded — and
    the answer is still exactly the recompute formula's (the 1.2M-doc
    A/B behind this gate is in BENCH/BASELINE.md)."""
    from engine.funcscore import function_score_topk

    r = IndexReader(spark, mod_index_dir)
    r._FUSION_TA_MIN_DOCS = 0  # floor stays at the 0.7 default
    meta = docs_meta.select("doc_id", "n_chars")
    q = queries[0]["text"]
    got = _rows(r.function_score_topk(
        q, meta, 5, value_col="n_chars",
        origin=300.0, scale=1e-3, decay=0.5, round_scores=ROUND,
    ))
    want = _rows(function_score_topk(
        spark, docs_meta, q, 5, field="n_chars",
        origin=300.0, scale=1e-3, decay=0.5, round_scores=ROUND,
    ))
    assert got == want
    assert r.mod_ta_served == 0 and r.mod_ta_fallback == 0


def test_boosting_dispatch_gate_hot_negative(
    spark, mod_index_dir, tiny_corpus, queries
):
    """negative_boost below the envelope floor + a hot negative term:
    the df gate routes straight to exhaustive (no TA attempt), exactly
    the recompute answer."""
    from engine.funcscore import boosting_topk

    r = IndexReader(spark, mod_index_dir)
    r._FUSION_TA_MIN_DOCS = 0
    q = queries[0]["text"]
    got = _rows(r.boosting_topk(
        q, "merge slow", 3, negative_boost=0.5, round_scores=ROUND,
    ))
    want = _rows(boosting_topk(
        spark, tiny_corpus, q, "merge slow", 3,
        negative_boost=0.5, round_scores=ROUND,
    ))
    assert got == want
    assert r.mod_ta_served == 0 and r.mod_ta_fallback == 0


def test_mod_ta_edge_queries(spark, mod_index_dir, docs_meta):
    """Stopword-only and nonsense queries mirror the exhaustive path."""
    r = _ta_reader(spark, mod_index_dir)
    meta = docs_meta.select("doc_id", "n_chars")
    assert r.function_score_topk(
        "the of and", meta, 5, value_col="n_chars",
        origin=ORIGIN, scale=SCALE, decay=DECAY, round_scores=ROUND,
    ).count() == 0
    assert r.function_score_topk(
        "zzzqqqxxx nonexistenttokenxyz", meta, 5, value_col="n_chars",
        origin=ORIGIN, scale=SCALE, decay=DECAY, round_scores=ROUND,
    ).count() == 0


@pytest.mark.parametrize("fn", ["exp", "linear"])
def test_function_score_decay_fn_ta(spark, mod_index_dir, docs_meta, queries, fn):
    """exp/linear decay through the TA path (forced kernel cut): the
    monotone-in-distance f_max/f_lo bounds generalize and both sides of
    the fallback seam stay value-identical to the recompute formula.
    linear's hard zero beyond the support exercises f_max=0 docs."""
    from engine.funcscore import function_score_topk

    r = _cut_reader(spark, mod_index_dir)
    meta = docs_meta.select("doc_id", "n_chars")
    for q in queries[:3]:
        got = _rows(r.function_score_topk(
            q["text"], meta, 3, value_col="n_chars",
            origin=ORIGIN, scale=SCALE, decay=DECAY, decay_fn=fn,
            round_scores=ROUND,
        ))
        want = _rows(function_score_topk(
            spark, docs_meta, q["text"], 3, field="n_chars",
            origin=ORIGIN, scale=SCALE, decay=DECAY, decay_fn=fn,
            round_scores=ROUND,
        ))
        assert got == want, (fn, q["text"])
