"""Emulates the driver's CORRECTNESS check: run every __spark_entry__
queries() entry at sf0.01 and compare against its oracle_sql() via
DuckDB — row count, column names, and exact values after sorting
columns by name and rows by all columns (the driver hashes values, so
we require exact equality, floats included: both sides round to 6dp)."""

import math
import pathlib
import sys

import duckdb
import pytest

# slow lane: full 93-entry DuckDB sweep at sf0.01 (~2 min) — core lane is `pytest -m "not slow"`
pytestmark = pytest.mark.slow

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as m

    return m


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if pathlib.Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(pdf):
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def test_entry_smoke(spark, entry_mod):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.schema is not None


def test_all_queries_match_oracle(spark, entry_mod, duck):
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    assert set(sqls) <= set(qs)
    failures = []
    for name, fn in qs.items():
        got = fn(spark, SF_DIR).toPandas()
        if name not in sqls:
            continue  # rows-only entries
        want = duck.sql(sqls[name]).df()
        if sorted(got.columns) != sorted(want.columns):
            failures.append(f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append(f"{name}: rows {len(got)} != {len(want)}")
            continue
        g, w = _canon(got), _canon(want)
        for col in g.columns:
            gv, wv = g[col].tolist(), w[col].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                ok = (
                    (a == b)
                    or (isinstance(a, float) and isinstance(b, float)
                        and (math.isnan(a) and math.isnan(b) or a == b))
                )
                if not ok:
                    failures.append(f"{name}.{col}[{i}]: {a!r} != {b!r}")
                    break
    assert not failures, "\n".join(failures[:25])
