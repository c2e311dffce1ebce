"""Parity: the generated DuckDB Porter (engine/porter_sql.py) must
agree with the vendored Python stemmer (engine/stemmer.py) on every
token the engine can ever see — full fixture + driver vocabularies plus
published Porter edge cases. This is what licenses the stemmed BM25
driver entries to carry a value-hash DuckDB oracle."""

import duckdb
import pytest

from engine.porter_sql import porter_ctes
from engine.stemmer import stem

EDGE_WORDS = [
    # classic Porter paper examples + rule-boundary words
    "caresses", "ponies", "ties", "caress", "cats", "feed", "agreed",
    "plastered", "bled", "motoring", "sing", "conflated", "troubled",
    "sized", "hopping", "tanned", "falling", "hissing", "fizzed",
    "failing", "filing", "happy", "sky", "relational", "conditional",
    "rational", "valenci", "hesitanci", "digitizer", "conformabli",
    "radicalli", "differentli", "vileli", "analogousli", "vietnamization",
    "predication", "operator", "feudalism", "decisiveness", "hopefulness",
    "callousness", "formaliti", "sensitiviti", "sensibiliti", "triplicate",
    "formative", "formalize", "electriciti", "electrical", "hopeful",
    "goodness", "revival", "allowance", "inference", "airliner",
    "gyroscopic", "adjustable", "defensible", "irritant", "replacement",
    "adjustment", "dependent", "adoption", "homologou", "communism",
    "activate", "angulariti", "homologous", "effective", "bowdlerize",
    "probate", "rate", "cease", "controll", "roll", "ion", "sion",
    "tion", "abyss", "dying", "lying", "tying", "yes", "by", "say",
    "crying", "string", "meetings", "was", "is", "his", "this",
    "syzygy", "rhythm", "yellowy", "enjoyed", "employer",
    # code-flavored tokens (regex admits digits/_/'/-/#/@)
    "don't", "o'reilly", "foo_bar", "x86_64", "test-driven", "v1_2_3",
    "#include", "@decorator", "abc123ing", "classes", "indexes",
    "tokenized", "vectorizer", "partitioning", "serialization",
]


@pytest.fixture(scope="module")
def vocab(tiny_docs):
    """Distinct RAW (unstemmed, post-stopword) tokens of the fixture
    corpus + driver documents at sf0.01 + edge cases."""
    from engine.tokenizer import tokenize

    words = set(EDGE_WORDS)
    for text in tiny_docs.values():
        words.update(tokenize(text, use_stem=False))
    con = duckdb.connect()
    rows = con.execute(
        "SELECT text FROM read_parquet('/root/testdata/sf0.01/documents.parquet')"
    ).fetchall()
    for (text,) in rows:
        words.update(tokenize(text, use_stem=False))
    return sorted(words)


def test_porter_sql_matches_python(vocab):
    con = duckdb.connect()
    con.execute("CREATE TABLE words (orig VARCHAR, term VARCHAR)")
    con.executemany("INSERT INTO words VALUES (?, ?)", [(w, w) for w in vocab])
    ctes, final = porter_ctes("words", carry=("orig",))
    got = dict(con.execute(f"WITH {ctes} SELECT orig, term FROM {final}").fetchall())
    bad = []
    for w in vocab:
        want = stem(w)
        if got.get(w) != want:
            bad.append((w, got.get(w), want))
    assert not bad, f"{len(bad)} mismatches, first 20: {bad[:20]}"
    assert len(got) == len(vocab)
