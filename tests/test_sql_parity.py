"""Cross-engine parity of the primitives the DuckDB oracle SQL relies on:
the token regex (Python re.ASCII vs DuckDB RE2), sha256, and the
doc_id hex→bigint derivation. If these drift, every driver correctness
check drifts — test them directly."""

import duckdb

from engine.ids import doc_id_py, doc_id_sql_duckdb, sha256_py
from engine.tokenizer import RE_WORD, TOKEN_PATTERN_RE2

TEXTS = [
    "The Quick brown-fox! don't #tag @user a xy q1 x_1",
    "state-of-the-art o'reilly semi-structured",
    "supercalifragilisticexpialidocious and __init__ foo_bar",
    "punctuation,separated;tokens(here)",
    "MIXED Case UPPER lower 123 1234 12",
    "", "   ", "--- ''' ###",
]


def test_regex_parity_python_vs_duckdb():
    con = duckdb.connect()
    pat = TOKEN_PATTERN_RE2.replace("'", "''")
    for t in TEXTS:
        py = RE_WORD.findall(t.lower())
        dk = con.execute(
            f"select regexp_extract_all(lower(?), '{pat}')", [t]
        ).fetchone()[0]
        assert py == dk, (t, py, dk)


def test_regex_parity_on_generated_corpus():
    from fixtures.gen_corpus import gen_corpus

    con = duckdb.connect()
    pat = TOKEN_PATTERN_RE2.replace("'", "''")
    pdf = gen_corpus(50)
    for t in pdf["content"]:
        py = RE_WORD.findall(t.lower())
        dk = con.execute(
            f"select regexp_extract_all(lower(?), '{pat}')", [t]
        ).fetchone()[0]
        assert py == dk


def test_sha256_and_doc_id_parity():
    con = duckdb.connect()
    for s in ["", "abc", "hello world", "ünïcode"]:
        dk = con.execute("select sha256(?)", [s]).fetchone()[0]
        assert dk == sha256_py(s)
    # the expression references (repo, path, commit) twice (hi/lo hex
    # split, engine/ids.py) → bind via named columns, not positional ?
    expr = doc_id_sql_duckdb("v.r", "v.p", "v.c")
    for repo, path, commit in [
        ("org/r", "src/a.py", "0" * 40),
        ("x", "y", "z"),
    ]:
        dk = con.execute(
            f"select {expr} from (select ? as r, ? as p, ? as c) v",
            [repo, path, commit],
        ).fetchone()[0]
        assert dk == doc_id_py(repo, path, commit)
        assert 0 <= dk < 2**63


def test_doc_id_spark_parity(spark):
    from engine.ids import doc_id_col, sha256_col
    from pyspark.sql import functions as F

    rows = [("org/r", "src/a.py", "0" * 40), ("x", "y", "z")]
    df = spark.createDataFrame(rows, "repo string, path string, commit string")
    out = df.select(
        doc_id_col(F.col("repo"), F.col("path"), F.col("commit")).alias("id"),
        sha256_col(F.col("repo")).alias("h"),
    ).collect()
    for (repo, path, commit), r in zip(rows, out):
        assert r["id"] == doc_id_py(repo, path, commit)
        assert r["h"] == sha256_py(repo)
