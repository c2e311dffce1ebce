"""Stable document identity + the sha256 per-row invariant.

BASELINE.json:15 pins the per-row invariant: ``sha256(content)`` equality
preserved through every transform. SURVEY.md §1.2 pins doc identity: a
deterministic hash of ``(repo, path, commit)`` — NOT
``monotonically_increasing_id`` (partition-layout dependent, which would
break checkpoint resume).

doc_id = int(first 16 hex chars of sha256(repo \\x00 path \\x00 commit))
masked to 63 bits — always positive, fits a signed int64, identically
computable in Python (hashlib), Spark SQL (sha2 + conv on split hex
runs, avoiding 64-bit conv overflow), and DuckDB. Birthday bound at
10^12 docs: (10^12)^2 / 2^64 ≈ 0.05 expected collisions — and the
build asserts uniqueness outright: `count_distinct(doc_id) == count(*)`
in the doc_stats stage (engine/index.py), so a collision fails the
build instead of silently merging two documents' postings.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

_SEP = "\x00"
_HEX_CHARS = 16  # 64 bits hashed, masked to 63 (sign bit cleared)
_MASK = (1 << 63) - 1


def doc_id_py(repo: str, path: str, commit: str) -> int:
    h = hashlib.sha256(f"{repo}{_SEP}{path}{_SEP}{commit}".encode()).hexdigest()
    return int(h[:_HEX_CHARS], 16) & _MASK


def sha256_py(content: str) -> str:
    return hashlib.sha256(content.encode()).hexdigest()


def doc_id_col(repo: Column, path: Column, commit: Column) -> Column:
    # conv() of 16 hex chars can exceed int64 — split: (first char & 7)
    # carries the masked top 3 bits, the remaining 15 chars the low 60.
    # (c0 & 7) * 16^15 + low60  ==  int(h[:16], 16) & (2^63 - 1)
    h = F.sha2(F.concat_ws(_SEP, repo, path, commit), 256)
    hi = F.conv(F.substring(h, 1, 1), 16, 10).cast("long") % 8
    lo = F.conv(F.substring(h, 2, 15), 16, 10).cast("long")
    return hi * F.lit(1 << 60) + lo


def sha256_col(content: Column) -> Column:
    return F.sha2(content, 256)


def doc_id_sql_duckdb(repo: str = "repo", path: str = "path", commit: str = '"commit"') -> str:
    """DuckDB expression computing the same doc_id (same hi/lo split)."""
    h = f"sha256({repo} || chr(0) || {path} || chr(0) || {commit})"
    return (
        f"((('0x' || substr({h}, 1, 1))::bigint % 8) * {1 << 60}"
        f" + ('0x' || substr({h}, 2, 15))::bigint)"
    )
