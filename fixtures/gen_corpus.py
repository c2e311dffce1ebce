"""Deterministic synthetic source-code corpus generator (FIXTURES.md §1).

Produces the binding input shape of BASELINE.json:15 —
``(repo, path, commit, lang, content)`` — with seed=42, zipfian term
draws over a code-flavored vocabulary, stopword-heavy hot terms (to
exercise the salted-skew path, BASELINE.json:6), and tokenizer edge
cases (' / - / # / @ infixes, length-1 dropped tokens, >25-char
truncation behavior). No external data; pure numpy.

Usage:
    python -m fixtures.gen_corpus OUT_DIR N_DOCS   # writes corpus.parquet
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SEED = 42

LANGS = ["py", "java", "scala", "go", "js", "md"]
_EXT = {"py": "py", "java": "java", "scala": "scala", "go": "go", "js": "js", "md": "md"}

# Code-flavored vocabulary. The leading entries get zipfian hot mass:
# a few English stopwords (removed by the tokenizer → exercises the
# stopword path) and hot code keywords like `def`/`return` that SURVIVE
# stopword removal → these are the skewed terms the salting path must
# handle (FIXTURES.md §1).
_VOCAB_HOT = ["the", "and", "def", "return", "for", "import", "class", "self"]
_VOCAB_BODY = [
    "function", "lambda", "array", "vector", "matrix", "tensor", "index",
    "search", "engine", "query", "token", "parser", "compile", "runtime",
    "thread", "mutex", "atomic", "buffer", "stream", "socket", "packet",
    "header", "payload", "encode", "decode", "varint", "delta", "block",
    "segment", "merge", "shard", "partition", "shuffle", "broadcast",
    "executor", "driver", "catalyst", "tungsten", "column", "schema",
    "string", "integer", "float", "double", "boolean", "struct", "field",
    "value", "result", "error", "raise", "except", "finally", "yield",
    "async", "await", "closure", "module", "package", "install", "config",
    "logger", "metric", "counter", "gauge", "histogram", "tracing",
    "request", "response", "session", "cookie", "render", "template",
    "database", "transaction", "commit", "rollback", "cursor", "fetch",
    "insert", "update", "delete", "select", "where", "group", "order",
    "limit", "offset", "join", "inner", "outer", "cross", "union",
    "distinct", "having", "window", "frame", "rank", "dense", "lead",
    "lag", "running", "connected", "iterate", "generated", "caresses",
    "ponies", "relational", "optimization", "vectorized", "computes",
]
# Tokenizer edge cases: quotes/hyphens/#/@ starts, 1-char (dropped by
# regex), 2-char (dropped), 26+ chars (regex truncates the match to 25).
_VOCAB_EDGE = [
    "don't", "o'reilly", "semi-structured", "state-of-the-art", "#pragma",
    "@override", "a", "b", "xy", "q1",
    "supercalifragilisticexpialidocious",  # 34 chars → regex matches 25-char prefix
    "x_1", "foo_bar", "__init__",
]

VOCAB = _VOCAB_HOT + _VOCAB_BODY + _VOCAB_EDGE


def _zipf_probs(n: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = 1.0 / ranks**s
    return p / p.sum()


def gen_corpus(n_docs: int, seed: int = SEED) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    probs = _zipf_probs(len(VOCAB))

    n_repos = max(2, n_docs // 50)
    # zipfian repo sizes
    repo_of_doc = rng.zipf(1.3, size=n_docs) % n_repos

    doc_lens = rng.integers(8, 400, size=n_docs)
    rows = []
    for i in range(n_docs):
        r = int(repo_of_doc[i])
        repo = f"org{r % 7}/repo{r}"
        lang = LANGS[int(rng.integers(0, len(LANGS)))]
        path = f"src/dir{int(rng.integers(0, 20))}/file{i}.{_EXT[lang]}"
        commit = hashlib.sha1(f"{repo}:{seed}".encode()).hexdigest()
        words = rng.choice(VOCAB, size=int(doc_lens[i]), p=probs)
        content = " ".join(words.tolist())
        rows.append((repo, path, commit, lang, content))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def main() -> None:
    import sys

    out_dir, n_docs = sys.argv[1], int(sys.argv[2])
    df = gen_corpus(n_docs)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), f"{out_dir}/corpus.parquet")
    print(f"wrote {len(df)} docs to {out_dir}/corpus.parquet")


if __name__ == "__main__":
    main()
