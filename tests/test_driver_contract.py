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


# Entries that WRITE a shared .driver_cache artifact on first touch
# (segment merges, lifecycle dirs, IVF/IVF-PQ tables, the KMV sketch,
# pagerank/pageviews priors). These run SERIALLY first — a concurrent
# first-touch of the same artifact dir would race the overwrite write —
# after which every other entry is a pure read and can run in parallel.
_BUILD_ENTRIES = [
    "bm25_merged_indexed",
    "bm25_deleted_indexed",
    "bm25_compacted_indexed",
    "bm25_streamed_indexed",
    "bm25_reindexed_indexed",
    "federated_topk",
    "ann_ivf_topk_indexed",
    "ivf_pq_topk",
    "kmv_hit_counts_indexed",
    "fusion_pr_topk_indexed",
    "fusion_pv_topk_indexed",
]


def _check_one(name, fn, spark, con, sqls):
    """One entry's full driver-style comparison; returns a list of
    failure strings (assertions identical to the old serial sweep)."""
    failures = []
    got = fn(spark, SF_DIR).toPandas()
    if name not in sqls:
        return failures  # rows-only entries
    want = con.sql(sqls[name]).df()
    if sorted(got.columns) != sorted(want.columns):
        return [f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"]
    if len(got) != len(want):
        return [f"{name}: rows {len(got)} != {len(want)}"]
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
    return failures


def test_all_queries_match_oracle(spark, entry_mod, duck):
    """Identical assertion set to the original serial sweep, but the
    196 Spark jobs pipeline through a thread pool once the shared
    artifacts exist (Spark schedules concurrent jobs from threads;
    DuckDB gets one cursor per task) — the round-4 VERDICT wall-clock
    item: same checks, ~3x less idle driver time."""
    from concurrent.futures import ThreadPoolExecutor

    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    assert set(sqls) <= set(qs)
    failures = []

    # phase 0: prime the per-config index dirs serially (a concurrent
    # in-place stage upgrade of one dir is the other race class)
    from engine import driver_queries as dq

    dq._index_reader(
        spark, SF_DIR,
        with_positions=True, with_docstore=True, with_fields=True,
    )
    dq._index_reader(spark, SF_DIR, use_stem=True)

    # phase 1: artifact-writing entries, serial
    for name in _BUILD_ENTRIES:
        if name in qs:
            failures.extend(_check_one(name, qs[name], spark, duck, sqls))

    # phase 2: everything else, 8-way
    rest = [(n, f) for n, f in qs.items() if n not in _BUILD_ENTRIES]

    def run(item):
        name, fn = item
        return _check_one(name, fn, spark, duck.cursor(), sqls)

    with ThreadPoolExecutor(max_workers=8) as ex:
        for fl in ex.map(run, rest):
            failures.extend(fl)

    assert not failures, "\n".join(failures[:25])
