"""Corpus source abstraction (SURVEY.md §1.4).

Prod target is an Iceberg table of source-code repositories at
10^12-file scale (BASELINE.json:14-15); this sandbox has no Iceberg
runtime, so ``read_corpus`` dispatches on the URI: ``iceberg://<table>``
uses the Iceberg DataSourceV2 path (requires the runtime jars on the
cluster classpath — a one-line swap, nothing else in the engine knows
the difference), anything else is read as parquet with the same schema.

Also provides the adapter view over the driver-generated ``documents``
testdata (FIXTURES.md §4) so ``__spark_entry__.py`` queries run on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ids import doc_id_col, sha256_col

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def read_corpus(spark: SparkSession, uri: str) -> DataFrame:
    """Read the (repo, path, commit, lang, content) corpus table."""
    if uri.startswith("iceberg://"):
        df = spark.read.format("iceberg").load(uri[len("iceberg://"):])
    else:
        df = spark.read.parquet(uri)
    missing = set(CORPUS_COLUMNS) - set(df.columns)
    if missing:
        raise ValueError(f"corpus at {uri} missing columns {sorted(missing)}")
    return df.select(*CORPUS_COLUMNS)


def with_identity(corpus: DataFrame) -> DataFrame:
    """Attach the stable doc_id and the sha256 per-row invariant column."""
    return corpus.withColumn("content_sha256", sha256_col(F.col("content"))).withColumn(
        "doc_id", doc_id_col(F.col("repo"), F.col("path"), F.col("commit"))
    )


def normalize_splits(df: DataFrame) -> DataFrame:
    """Widen a too-narrow scan to the cluster's parallelism.

    A single small parquet file (one row group) arrives as ONE input
    split, which serializes every downstream per-row operator — the
    zero-shuffle operators (simhash, phrase match, media decode) are
    exactly as parallel as the scan that feeds them. At production
    scale splits >> cores, so the condition is false and this is a
    no-op with no Exchange; it only pays one tiny round-robin shuffle
    when the input is narrower than the cluster."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver testdata adapter (FIXTURES.md §4): documents.parquet →
    corpus shape, keeping the driver's own ``doc_id``."""
    d = normalize_splits(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    return d.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.col("doc_id").cast("long").alias("doc_id"),
    )


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalize_splits(spark.read.parquet(f"{sf_dir}/documents.parquet"))
