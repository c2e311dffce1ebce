"""Reindex — rebuild an index from its OWN stored artifacts (the ES
``_reindex`` analog; SURVEY.md §2 index-lifecycle family alongside
merge/delete/compact).

Why it exists: switching analyzers (stem ↔ unstem), resharding, or
compacting a long tombstone history requires re-running the build —
but the original source corpus may be gone or expensive to re-read.
An index built ``with_docstore=True`` carries everything needed:

- ``docstore``   (doc_id → content), the stage-8 forward index
- ``doc_stats``  (doc_id → repo/path/content_sha256/doc_len)

Reconstruction is one join of those two artifacts on doc_id (both are
hive-partitioned by the SAME doc-hash shard contract, so per-shard
reads prune and AQE plans a co-bucketed exchange at worst), minus the
tombstone set — reindex COMPACTS deletes, like ES ``_reindex`` into a
fresh target.

Byte-identity contract (pytest-pinned, the merge/compact discipline):
``reindex(src → out, use_stem=s, n_shards=n)`` writes postings blocks,
dictionary, and doc stats IDENTICAL to ``build_index`` over the
equivalent live corpus — the reconstruction yields exactly the rows
build_index consumed (content_sha256 is carried, not recomputed, so
the build's sha256 fingerprint invariant still attests the round
trip). Deterministic regardless of row order: stage 1 repartitions by
shard and sorts within partitions, and every artifact is built per
sorted (shard, term) group.

Scale shape: the reconstruction join moves ~KB/doc rows once — the
same order of bytes as stage 1's own corpus shuffle, i.e. reindex at
100 TB costs one extra corpus-sized exchange over a from-source build,
and zero source-system reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def reconstruct_corpus(src) -> DataFrame:
    """(doc_id, content, repo, path, content_sha256[, lang]) — the live
    corpus as stored in the source index's docstore + doc_stats
    artifacts (tombstoned docs dropped; doc-values like ``lang`` ride
    along when the source carried them, so a rebuilt index keeps its
    index-served aggregations). Raises like IndexReader.docstore()
    when the source was built without a docstore."""
    ds_cols = ["doc_id", "repo", "path", "content_sha256"] + [
        c for c in ("lang",) if c in src.doc_stats().columns
    ]
    corpus = src.docstore().select("doc_id", "content").join(
        src.doc_stats().select(*ds_cols),
        "doc_id",
    )
    t = src.tombstones_df()
    if t is not None:
        corpus = corpus.join(F.broadcast(t), "doc_id", "left_anti")
    return corpus


def reindex(
    spark: SparkSession,
    src,
    out_dir: str,
    *,
    use_stem: bool | None = None,
    n_shards: int | None = None,
    n_chunks: int = 2,
    with_positions: bool = False,
    with_docstore: bool = False,
):
    """Rebuild ``src`` (an IndexReader) into ``out_dir`` from its own
    docstore, optionally switching analyzer (``use_stem``) or shard
    count. Defaults inherit the source's config. Returns the new
    IndexReader. Resume-safe: build_index's manifest fingerprint
    recognizes an unchanged reconstruction and no-ops."""
    from .index import build_index

    return build_index(
        spark,
        reconstruct_corpus(src),
        out_dir,
        use_stem=src.use_stem if use_stem is None else use_stem,
        n_shards=(
            src.manifest["config"]["n_shards"] if n_shards is None else n_shards
        ),
        n_chunks=n_chunks,
        with_positions=with_positions,
        with_docstore=with_docstore,
    )
