"""Stable document identity + the sha256 per-row invariant.

BASELINE.json:15 pins the per-row invariant: ``sha256(content)`` equality
preserved through every transform. SURVEY.md §1.2 pins doc identity: a
deterministic hash of ``(repo, path, commit)`` — NOT
``monotonically_increasing_id`` (partition-layout dependent, which would
break checkpoint resume).

doc_id = int(first 15 hex chars of sha256(repo \\x00 path \\x00 commit))
→ 60 bits, always positive, identically computable in Python (hashlib),
Spark SQL (sha2 + conv), and DuckDB (sha256 + hex cast). Collision
probability at 10^12 docs ≈ 10^24/2^61 per pair... birthday bound
~ (10^12)^2 / 2^61 ≈ 0.4 — at true 10^12-file scale widen to 16 hex
chars minus sign handling; at this repo's scales (≤10^7) it is sound,
and a build-time uniqueness assertion guards it (engine/build.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

_SEP = "\x00"
_HEX_CHARS = 15  # 60 bits


def doc_id_py(repo: str, path: str, commit: str) -> int:
    h = hashlib.sha256(f"{repo}{_SEP}{path}{_SEP}{commit}".encode()).hexdigest()
    return int(h[:_HEX_CHARS], 16)


def sha256_py(content: str) -> str:
    return hashlib.sha256(content.encode()).hexdigest()


def doc_id_col(repo: Column, path: Column, commit: Column) -> Column:
    h = F.sha2(F.concat_ws(_SEP, repo, path, commit), 256)
    return F.conv(F.substring(h, 1, _HEX_CHARS), 16, 10).cast("long")


def sha256_col(content: Column) -> Column:
    return F.sha2(content, 256)


def doc_id_sql_duckdb(repo: str = "repo", path: str = "path", commit: str = '"commit"') -> str:
    """DuckDB expression computing the same doc_id."""
    return (
        f"(('0x' || substr(sha256({repo} || chr(0) || {path} || chr(0) || {commit}), 1, "
        f"{_HEX_CHARS}))::bigint)"
    )
