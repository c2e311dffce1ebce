"""Vendored Porter stemmer (Porter, 1980 — public algorithm).

The reference applies ``nltk.PorterStemmer`` to tokens for its stemmed
index variant (SURVEY.md §2.2 P3); nltk is absent in this sandbox, so
the classic Porter algorithm is implemented here from the published
description ("An algorithm for suffix stripping", M.F. Porter, Program
14(3) 1980). This implementation is THE stemming semantics for this
repo: the Spark engine, the pure-Python oracle, and the golden fixtures
all call :func:`stem`.

Only lowercase ASCII words are expected (the tokenizer lowercases and
the token regex is ASCII-only — see engine/tokenizer.py). Words of
length <= 2 are returned unchanged, per the original algorithm.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences ([C](VC){m}[V])."""
    m = 0
    prev_cons = True
    seen_vowel = False
    for i in range(len(stem)):
        if _is_cons(stem, i):
            if seen_vowel and not prev_cons:
                m += 1
            prev_cons = True
        else:
            seen_vowel = True
            prev_cons = False
    # a trailing vowel run does not close a VC pair; pairs are counted
    # when the consonant following a vowel run starts — but the loop
    # above increments at the *first* consonant after a vowel run, so
    # it is already correct.
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o condition: stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def _replace(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    """If word ends with suffix and measure(stem) > min_m, replace."""
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) > min_m:
        return stem + repl
    return word  # suffix matched but condition failed → stop this step


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


@lru_cache(maxsize=1 << 16)
def stem(word: str) -> str:
    if len(word) <= 2:
        return word

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ies"):
        word = word[:-2]
    elif word.endswith("ss"):
        pass
    elif word.endswith("s"):
        word = word[:-1]

    # Step 1b
    flag_1b = False
    if word.endswith("eed"):
        if _measure(word[:-3]) > 0:
            word = word[:-1]
    elif word.endswith("ed"):
        if _has_vowel(word[:-2]):
            word = word[:-2]
            flag_1b = True
    elif word.endswith("ing"):
        if _has_vowel(word[:-3]):
            word = word[:-3]
            flag_1b = True
    if flag_1b:
        if word.endswith(("at", "bl", "iz")):
            word += "e"
        elif _ends_double_cons(word) and word[-1] not in "lsz":
            word = word[:-1]
        elif _measure(word) == 1 and _ends_cvc(word):
            word += "e"

    # Step 1c
    if word.endswith("y") and _has_vowel(word[:-1]):
        word = word[:-1] + "i"

    # Step 2 (longest-match among suffixes is implied by ordering on the
    # penultimate letter in the original; a linear scan with endswith on
    # the full list is equivalent because no listed suffix is a proper
    # suffix of another with a different replacement outcome here —
    # except (ational, tional) and (ization, ation), which are ordered
    # longest-first below via explicit check)
    for suf, repl in sorted(_STEP2, key=lambda p: -len(p[0])):
        if word.endswith(suf):
            out = _replace(word, suf, repl, 0)
            word = out if out is not None else word
            break

    # Step 3
    for suf, repl in sorted(_STEP3, key=lambda p: -len(p[0])):
        if word.endswith(suf):
            out = _replace(word, suf, repl, 0)
            word = out if out is not None else word
            break

    # Step 4
    for suf in sorted(_STEP4, key=len, reverse=True):
        if word.endswith(suf):
            stem_ = word[: len(word) - len(suf)]
            if suf == "ion" and (not stem_ or stem_[-1] not in "st"):
                continue
            if _measure(stem_) > 1:
                word = stem_
            break

    # Step 5a
    if word.endswith("e"):
        stem_ = word[:-1]
        m = _measure(stem_)
        if m > 1 or (m == 1 and not _ends_cvc(stem_)):
            word = stem_

    # Step 5b
    if _measure(word) > 1 and _ends_double_cons(word) and word.endswith("l"):
        word = word[:-1]

    return word
