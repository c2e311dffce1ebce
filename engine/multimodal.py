"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The image/audio codecs are NOT in this container, so the decode step is
a deterministic fake behind ``decode_stub`` (clearly marked); the
Spark-side plumbing — BinaryType schema, Arrow batch shape, mapInPandas
signature, partition behavior — is real and tested. Swapping
``decode_stub`` for PIL/ffmpeg is a one-function change.

``media_from_documents`` manufactures a binary corpus from the driver
``documents`` table (utf-8 payload) so the pipeline has real bytes to
flow; ``media_meta``'s byte-level outputs (n_bytes, payload_md5) are
DuckDB-checkable, while feature extraction is rows-only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_DIM = 8


def media_from_documents(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, media_type, payload binary)."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def media_meta(media: DataFrame) -> DataFrame:
    """(doc_id, media_type, n_bytes, payload_md5) — byte-level metadata,
    pure column math (codegen), no UDF."""
    return media.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


def decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """STUB decode: real codecs unavailable in this container.

    Returns a deterministic FAKE feature vector derived from the bytes
    (so downstream plumbing is testable end-to-end). Replace with e.g.
    PIL.Image.open / soundfile.read in production.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FAKE_DIM, dtype=np.float32)
    pad = (-arr.size) % FAKE_DIM
    arr = np.pad(arr, (0, pad)).reshape(-1, FAKE_DIM)
    return (arr.mean(axis=0) / 255.0).astype(np.float32)


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: (doc_id, media_type, feature
    array<float>, n_bytes). Arrow-batched; per-batch numpy, no per-row
    Python beyond the (stubbed) codec call."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_stub(bytes(p), t).tolist()
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(
        _batches, "doc_id long, media_type string, feature array<float>, n_bytes int"
    )


def media_features_flat(media: DataFrame) -> DataFrame:
    """(doc_id, media_type, dim, value) — exploded projection of
    extract_features for the driver contract: an array<float> column
    breaks order-insensitive value hashing (pandas can't factorize
    lists), and the flat form admits an exact DuckDB oracle (the stub
    decode is deterministic byte math, media_features_sql)."""
    f = extract_features(media)
    return f.select(
        "doc_id", "media_type", F.posexplode("feature").alias("dim", "value")
    ).select(
        "doc_id",
        "media_type",
        "dim",
        F.round(F.col("value").cast("double"), 6).alias("value"),
    )


def media_features_sql() -> str:
    """DuckDB twin of decode_stub over the utf-8 payload: bytes (via
    hex extraction) → pad to a multiple of FAKE_DIM with zeros →
    per-dim column mean / 255 → float32. All sums are exact integers in
    float64, so the mean matches numpy bit-for-bit; the ::REAL cast
    reproduces the .astype(float32)."""
    mt = ("CASE WHEN g.doc_id % 3 = 0 THEN 'image' "
          "WHEN g.doc_id % 3 = 1 THEN 'audio' ELSE 'video' END")
    return f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents
),
bytes AS (
  SELECT doc_id, unnest(range(0, n)) AS i FROM b
),
sums AS (
  SELECT bt.doc_id, (bt.i % {FAKE_DIM})::INTEGER AS dim,
         sum(('0x' || substr(b.hx, (2 * bt.i + 1)::INTEGER, 2))::BIGINT) AS s
  FROM bytes bt JOIN b USING (doc_id)
  GROUP BY bt.doc_id, bt.i % {FAKE_DIM}
),
grid AS (
  SELECT b.doc_id, d.dim::INTEGER AS dim, b.n
  FROM b CROSS JOIN (SELECT unnest(range(0, {FAKE_DIM})) AS dim) d
)
SELECT g.doc_id, {mt} AS media_type, g.dim,
       round((CASE WHEN g.n = 0 THEN 0.0
              ELSE ((coalesce(s.s, 0)::DOUBLE
                     / ((g.n + {FAKE_DIM} - 1) // {FAKE_DIM}))
                    / 255.0)::REAL::DOUBLE END), 6) AS value
FROM grid g LEFT JOIN sums s ON s.doc_id = g.doc_id AND s.dim = g.dim
"""


def media_meta_sql() -> str:
    """DuckDB oracle for media_meta over the documents view."""
    return """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       octet_length(encode(text))::INTEGER AS n_bytes,
       md5(text) AS payload_md5
FROM documents
"""


def resize_flat(media: DataFrame, height: int = 8, width: int = 8) -> DataFrame:
    """(doc_id, height, width, dim, value): exploded, canonicalizable
    projection of resize_images for the driver contract (same rationale
    as media_features_flat)."""
    r = resize_images(media, height, width)
    return r.select(
        "doc_id", "height", "width", F.posexplode("pixels").alias("dim", "value")
    ).select(
        "doc_id",
        "height",
        "width",
        "dim",
        F.round(F.col("value").cast("double"), 6).alias("value"),
    )


def resize_sql(height: int = 8, width: int = 8) -> str:
    """DuckDB twin of _fake_pixels over image rows (doc_id % 3 = 0):
    bytes → pad to h·w → per-position column mean / 255 → float32."""
    hw = height * width
    return f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents WHERE doc_id % 3 = 0
),
bytes AS (
  SELECT doc_id, unnest(range(0, n)) AS i FROM b
),
sums AS (
  SELECT bt.doc_id, (bt.i % {hw})::INTEGER AS dim,
         sum(('0x' || substr(b.hx, (2 * bt.i + 1)::INTEGER, 2))::BIGINT) AS s
  FROM bytes bt JOIN b USING (doc_id)
  GROUP BY bt.doc_id, bt.i % {hw}
),
grid AS (
  SELECT b.doc_id, d.dim::INTEGER AS dim, b.n
  FROM b CROSS JOIN (SELECT unnest(range(0, {hw})) AS dim) d
)
SELECT g.doc_id, {height} AS height, {width} AS width, g.dim,
       round((CASE WHEN g.n = 0 THEN 0.0
              ELSE ((coalesce(s.s, 0)::DOUBLE
                     / ((g.n + {hw} - 1) // {hw}))
                    / 255.0)::REAL::DOUBLE END), 6) AS value
FROM grid g LEFT JOIN sums s ON s.doc_id = g.doc_id AND s.dim = g.dim
"""


def frames_flat(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """(doc_id, frame_idx, dim, value): exploded projection of
    sample_frames for the driver contract."""
    f = sample_frames(media, n_frames)
    return f.select(
        "doc_id", "frame_idx", F.posexplode("feature").alias("dim", "value")
    ).select(
        "doc_id",
        "frame_idx",
        "dim",
        F.round(F.col("value").cast("double"), 6).alias("value"),
    )


def frames_sql(n_frames: int = 4) -> str:
    """DuckDB twin of sample_frames over video rows (doc_id % 3 = 2):
    step = max(1, n // n_frames); frame i = bytes[i·step:(i+1)·step],
    falling back to the LAST step bytes when the slice is empty, then
    decode_stub's 8-dim byte means."""
    return f"""
WITH v AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n,
         greatest(1, octet_length(encode(text)) // {n_frames}) AS step
  FROM documents WHERE doc_id % 3 = 2
),
frx AS (
  SELECT doc_id, f.i::INTEGER AS frame_idx,
         -- clamped so an EMPTY payload (n=0, step=1) yields off=0,len=0
         -- (→ the len=0 zero-vector branch, matching decode_stub) and
         -- never a negative substr offset
         CASE WHEN f.i * step < n THEN f.i * step
              ELSE greatest(n - step, 0) END AS off,
         CASE WHEN f.i * step < n THEN least(step, n - f.i * step)
              ELSE least(step, n - greatest(n - step, 0)) END AS len
  FROM v CROSS JOIN (SELECT unnest(range(0, {n_frames})) AS i) f
),
bytes AS (
  SELECT doc_id, frame_idx, off, unnest(range(0, len)) AS j FROM frx
),
sums AS (
  SELECT bt.doc_id, bt.frame_idx, (bt.j % {FAKE_DIM})::INTEGER AS dim,
         sum(('0x' || substr(v.hx, (2 * (bt.off + bt.j) + 1)::INTEGER, 2))::BIGINT) AS s
  FROM bytes bt JOIN v USING (doc_id)
  GROUP BY bt.doc_id, bt.frame_idx, bt.j % {FAKE_DIM}
),
grid AS (
  SELECT f.doc_id, f.frame_idx, d.dim::INTEGER AS dim, f.len
  FROM frx f CROSS JOIN (SELECT unnest(range(0, {FAKE_DIM})) AS dim) d
)
SELECT g.doc_id, g.frame_idx, g.dim,
       round((CASE WHEN g.len = 0 THEN 0.0
              ELSE ((coalesce(s.s, 0)::DOUBLE
                     / ((g.len + {FAKE_DIM} - 1) // {FAKE_DIM}))
                    / 255.0)::REAL::DOUBLE END), 6) AS value
FROM grid g LEFT JOIN sums s
  ON s.doc_id = g.doc_id AND s.frame_idx = g.frame_idx AND s.dim = g.dim
"""


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in for decode+resize (no image libs in this
    container): bytes are tiled into an h*w grid of [0,1] means. The
    production seam is ONLY this function (PIL `Image.open(...).resize`)
    — schema, batching, and partitioning around it are real."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(h * w, dtype=np.float32)
    pad = (-arr.size) % (h * w)
    arr = np.pad(arr, (0, pad)).reshape(-1, h * w)
    return (arr.mean(axis=0) / 255.0).astype(np.float32)


def resize_images(media: DataFrame, height: int = 8, width: int = 8) -> DataFrame:
    """(doc_id, height, width, pixels array<float>) for image rows —
    decode+resize as a mapInPandas stage; non-image rows are filtered
    JVM-side so only image payloads cross into Python."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "height": height,
                    "width": width,
                    "pixels": [
                        _fake_pixels(bytes(p), height, width).tolist()
                        for p in pdf["payload"]
                    ],
                }
            )

    return (
        media.where(F.col("media_type") == "image")
        .select("doc_id", "payload")
        .mapInPandas(_batches, "doc_id long, height int, width int, pixels array<float>")
    )


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """(doc_id, frame_idx, feature array<float>) for video rows — the
    frame-sampling shape: one output row per sampled frame, features
    via the stubbed codec on deterministic byte slices (production
    seam: ffmpeg keyframe extraction)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_idx": [], "feature": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    chunk = b[i * step : (i + 1) * step] or b[-step:]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["feature"].append(decode_stub(chunk, "video").tolist())
            yield pd.DataFrame(rows)

    return (
        media.where(F.col("media_type") == "video")
        .select("doc_id", "payload")
        .mapInPandas(_batches, "doc_id long, frame_idx int, feature array<float>")
    )
