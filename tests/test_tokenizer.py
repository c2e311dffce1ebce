"""Tokenizer golden cases (SURVEY.md §5.2.1): regex edge cases, stopword
and stemming behavior, and pandas-vectorized == scalar parity."""

import pandas as pd

from engine.tokenizer import RE_WORD, tokenize, tokenize_series, batch_doc_terms
import numpy as np


def test_regex_edges():
    f = RE_WORD.findall
    assert f("don't o'reilly") == ["don't", "o'reilly"]
    assert f("state-of-the-art") == ["state-of-the-art"]
    assert f("semi-structured") == ["semi-structured"]
    assert f("#pragma @override") == ["#pragma", "@override"]
    assert f("a b xy") == []  # <3 chars dropped
    assert f("q1 x_1") == ["x_1"]
    s = "supercalifragilisticexpialidocious"  # 34 chars
    # regex matches the 25-char prefix, then the 9-char tail separately
    assert f(s) == [s[:25], s[25:]]


def test_stopwords_and_case():
    assert tokenize("The AND of Query", use_stem=False) == ["query"]
    assert tokenize("the and of", use_stem=False) == []
    assert tokenize("don't", use_stem=False) == []  # "don't" is a stopword


def test_stemming_on_off():
    assert tokenize("running queries", use_stem=True) == ["run", "queri"]
    assert tokenize("running queries", use_stem=False) == ["running", "queries"]


def test_vectorized_matches_scalar():
    texts = pd.Series(
        [
            "The Quick brown-fox jumps! don't #tag @user",
            "caresses ponies relational optimization",
            "",
            "a an the",
        ]
    )
    for use_stem in (True, False):
        vec = tokenize_series(texts, use_stem=use_stem).tolist()
        ref = [tokenize(t, use_stem=use_stem) for t in texts]
        assert vec == ref


def test_batch_doc_terms_tf_and_len():
    texts = pd.Series(["query query engine", "the and", "engine"])
    out = batch_doc_terms(np.array([10, 20, 30]), texts, use_stem=True)
    d = {(r.doc_id, r.term): (r.tf, r.doc_len) for r in out.itertuples()}
    assert d[(10, "queri")] == (2, 3)
    assert d[(10, "engin")] == (1, 3)
    assert (20, "the") not in d and not any(k[0] == 20 for k in d)
    assert d[(30, "engin")] == (1, 1)
