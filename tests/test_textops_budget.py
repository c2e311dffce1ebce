"""token_budget: the three token-count bases (whitespace / BPE-ish /
word-regex) — hand-pinned values plus direct DuckDB parity at
sf0.001 (the sf0.01 contract sweep also covers it)."""

import pathlib
import sys

import duckdb
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


def test_token_budget_hand_values(spark):
    from engine.textops import token_budget

    rows = [
        (1, "it's a test-case 123  ok"),
        (2, ""),
        (3, None),
        (4, "   "),
        (5, "one"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    out = {r["doc_id"]: (r["n_ws"], r["n_bpe"], r["n_words"])
           for r in token_budget(docs).collect()}
    # ws fields: it's/a/test-case/123/ok = 5; BPE pieces:
    # it|'s| a| test|-|case| 123|ok = 8 non-ws; engine words (len>=3,
    # optional '/- joiners): it's, test-case, 123 = 3
    assert out[1] == (5, 8, 3)
    assert out[2] == (0, 0, 0)
    assert out[3] == (0, 0, 0)
    assert out[4] == (0, 0, 0)
    assert out[5] == (1, 1, 1)


def test_token_budget_duckdb_parity(spark):
    from engine import driver_queries as dq

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    qs, sqls = dq.spark_queries(), dq.oracle_sqls()
    got = qs["token_budget"](spark, SF_DIR).toPandas()
    want = con.sql(sqls["token_budget"]).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(by=cols, ignore_index=True)
    w = want[cols].sort_values(by=cols, ignore_index=True)
    for c in cols:
        assert g[c].tolist() == w[c].tolist(), c
