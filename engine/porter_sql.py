"""Porter stemmer as generated DuckDB SQL (oracle-side twin).

The driver's DuckDB oracle cannot call Python, and DuckDB's `stem()`
lives in the FTS extension which this sandbox cannot download — so the
4 stemmed BM25 driver entries were rows-only checks in round 1. This
module generates a SQL mirror of the vendored Porter implementation
(engine/stemmer.py — THE stemming semantics for this repo) so those
entries get full value-hash oracles.

Shape: one CTE per algorithm step, each rebinding a column from the
previous CTE — expression size stays LINEAR in the number of steps
(nesting the whole algorithm into one scalar expression would blow up
exponentially because each step references its input many times).

The consonant/vowel machinery uses a 3-stage regexp_replace "CV form":
vowels → V, then y-after-consonant → V (left-to-right global replace
reproduces the positional y rule, because RE2 does not rescan
replacement text), then everything else → c. measure(m) is then the
count of maximal V-run→c-run transitions.

Parity with engine/stemmer.stem is enforced over the full fixture +
driver vocabularies in tests/test_porter_sql.py.
"""

from __future__ import annotations

from .stemmer import _STEP2, _STEP3, _STEP4


def _cv(w: str) -> str:
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        f"{w}, '[aeiou]', 'V', 'g'), '([^V])y', '\\1V', 'g'), '[^V]', 'c', 'g')"
    )


def _m(w: str) -> str:
    return f"len(regexp_extract_all({_cv(w)}, 'V+c+'))"


def _hasv(w: str) -> str:
    return f"contains({_cv(w)}, 'V')"


def _drop(w: str, k: int) -> str:
    return f"substr({w}, 1, length({w}) - {k})"


def _dbl(w: str) -> str:
    """ends with a double consonant (same letter, classified consonant)."""
    return (
        f"(length({w}) >= 2 AND substr({w}, -1, 1) = substr({w}, -2, 1) "
        f"AND {_cv(w)} LIKE '%c')"
    )


def _cvc(w: str) -> str:
    """*o: ends cvc, final consonant not w/x/y."""
    return f"({_cv(w)} LIKE '%cVc' AND substr({w}, -1, 1) NOT IN ('w','x','y'))"


def _step1a(w: str) -> str:
    return f"""CASE
  WHEN {w} LIKE '%sses' THEN {_drop(w, 2)}
  WHEN {w} LIKE '%ies' THEN {_drop(w, 2)}
  WHEN {w} LIKE '%ss' THEN {w}
  WHEN {w} LIKE '%s' THEN {_drop(w, 1)}
  ELSE {w} END"""


def _post1b(x: str) -> str:
    return f"""CASE
  WHEN {x} LIKE '%at' OR {x} LIKE '%bl' OR {x} LIKE '%iz' THEN {x} || 'e'
  WHEN {_dbl(x)} AND substr({x}, -1, 1) NOT IN ('l','s','z') THEN {_drop(x, 1)}
  WHEN {_m(x)} = 1 AND {_cvc(x)} THEN {x} || 'e'
  ELSE {x} END"""


def _step1b(w: str) -> str:
    x2, x3 = _drop(w, 2), _drop(w, 3)
    return f"""CASE
  WHEN {w} LIKE '%eed' THEN
    (CASE WHEN {_m(x3)} > 0 THEN {_drop(w, 1)} ELSE {w} END)
  WHEN {w} LIKE '%ed' AND {_hasv(x2)} THEN ({_post1b(x2)})
  WHEN {w} LIKE '%ing' AND {_hasv(x3)} THEN ({_post1b(x3)})
  ELSE {w} END"""


def _step1c(w: str) -> str:
    x = _drop(w, 1)
    return (
        f"CASE WHEN {w} LIKE '%y' AND {_hasv(x)} THEN {x} || 'i' "
        f"ELSE {w} END"
    )


def _suffix_case(w: str, pairs: list[tuple[str, str]], min_m: int) -> str:
    """First-match-wins suffix CASE, same iteration order as the Python
    loop (stable sort by suffix length desc)."""
    whens = []
    for suf, repl in sorted(pairs, key=lambda p: -len(p[0])):
        stem = _drop(w, len(suf))
        whens.append(
            f"WHEN {w} LIKE '%{suf}' THEN "
            f"(CASE WHEN {_m(stem)} > {min_m} THEN {stem} || '{repl}' "
            f"ELSE {w} END)"
        )
    return "CASE\n  " + "\n  ".join(whens) + f"\n  ELSE {w} END"


def _step2(w: str) -> str:
    return _suffix_case(w, _STEP2, 0)


def _step3(w: str) -> str:
    return _suffix_case(w, _STEP3, 0)


def _step4(w: str) -> str:
    # 'ion' failing its s/t guard falls through to shorter suffixes in
    # the Python loop, but no shorter listed suffix can also match a
    # word ending in 'ion' — so "guard failed → word unchanged" is an
    # exact translation.
    whens = []
    for suf in sorted(_STEP4, key=len, reverse=True):
        stem = _drop(w, len(suf))
        if suf == "ion":
            whens.append(
                f"WHEN {w} LIKE '%ion' THEN "
                f"(CASE WHEN substr({stem}, -1, 1) IN ('s','t') "
                f"AND {_m(stem)} > 1 THEN {stem} ELSE {w} END)"
            )
        else:
            whens.append(
                f"WHEN {w} LIKE '%{suf}' THEN "
                f"(CASE WHEN {_m(stem)} > 1 THEN {stem} ELSE {w} END)"
            )
    return "CASE\n  " + "\n  ".join(whens) + f"\n  ELSE {w} END"


def _step5a(w: str) -> str:
    x = _drop(w, 1)
    return (
        f"CASE WHEN {w} LIKE '%e' THEN "
        f"(CASE WHEN {_m(x)} > 1 OR ({_m(x)} = 1 AND NOT {_cvc(x)}) "
        f"THEN {x} ELSE {w} END) ELSE {w} END"
    )


def _step5b(w: str) -> str:
    return (
        f"CASE WHEN {_m(w)} > 1 AND {_dbl(w)} AND {w} LIKE '%l' "
        f"THEN {_drop(w, 1)} ELSE {w} END"
    )


_STEPS = [_step1a, _step1b, _step1c, _step2, _step3, _step4, _step5a, _step5b]


def porter_ctes(src: str, *, carry: tuple[str, ...] = ("doc_id",),
                term_col: str = "term", prefix: str = "p") -> tuple[str, str]:
    """CTE chain applying the full Porter algorithm to ``src.term_col``.

    Returns (cte_sql, final_cte_name); the final CTE has columns
    ``(*carry, term)`` where term is the stemmed token. Words of length
    ≤ 2 bypass every step (the entry guard in engine/stemmer.stem),
    which is why the original w0 is carried to the end.
    """
    cols = ", ".join(carry)
    if cols:
        cols += ", "
    ctes = [f"{prefix}0 AS (SELECT {cols}{term_col} AS w0 FROM {src})"]
    for i, step in enumerate(_STEPS, start=1):
        expr = step(f"w{i - 1}")
        ctes.append(
            f"{prefix}{i} AS (SELECT {cols}w0, {expr} AS w{i} "
            f"FROM {prefix}{i - 1})"
        )
    final = f"{prefix}{len(_STEPS) + 1}"
    ctes.append(
        f"{final} AS (SELECT {cols}"
        f"CASE WHEN length(w0) <= 2 THEN w0 ELSE w{len(_STEPS)} END AS term "
        f"FROM {prefix}{len(_STEPS)})"
    )
    return ",\n".join(ctes), final
