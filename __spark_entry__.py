"""Driver contract for the spark-graft builder (PySpark target).

Backed by engine/driver_queries.py: each `queries()` entry is an
operator from SURVEY.md §2 expressed over the driver `documents` /
`events` / `embeddings` testdata (adapter: FIXTURES.md §4), paired
with DuckDB oracle SQL in `oracle_sql()` — ALL entries carry an
oracle (stemmed variants via the generated SQL Porter stemmer,
engine/porter_sql.py; streaming entries drain Structured Streaming
micro-batches and compare against DuckDB's batch aggregation).
"""

from __future__ import annotations

import pathlib
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: stemmed BM25 top-10 for a fixed query on sf0.001."""
    from engine.driver_queries import spark_queries

    return spark_queries()["bm25_q_table_scan_stemmed"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from engine.driver_queries import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    from engine.driver_queries import oracle_sqls

    return oracle_sqls()
