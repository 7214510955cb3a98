"""Original Porter stemmer (Porter, 1980) with the two "official C
version" departures that Lucene's ``PorterStemmer`` also carries:

* Step 2: ``abli -> able`` is replaced by ``bli -> ble``
* Step 2: addition of ``logi -> log``

This is a from-scratch implementation of the published algorithm
(https://tartarus.org/martin/PorterStemmer/def.txt), NOT a port of the
reference's Java (`analysis/DefaultEnglishAnalyzer.java:63-71` selects
Lucene's PorterStemFilter; parity is asserted against the reference's
golden tokens in `EnglishStemmingAnalyzerTest.java:28-43`).

Words of length <= 2 are returned unchanged (the algorithm's k <= 1
early-out). Input is assumed lowercase ASCII-ish; non-alpha chars are
left untouched by the measure logic (treated as consonants).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in [C](VC){m}[V]."""
    m = 0
    i = 0
    n = len(stem)
    # skip initial consonants
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        # in vowel run
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(stem: str) -> bool:
    return (
        len(stem) >= 2
        and stem[-1] == stem[-2]
        and _is_cons(stem, len(stem) - 1)
    )


def _cvc(stem: str) -> bool:
    """*o: stem ends cvc where final c is not w, x or y."""
    if len(stem) < 3:
        return False
    if not (
        _is_cons(stem, len(stem) - 3)
        and not _is_cons(stem, len(stem) - 2)
        and _is_cons(stem, len(stem) - 1)
    ):
        return False
    return stem[-1] not in "wxy"


def _replace(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    """If word ends with suffix and measure(stem) > min_m, replace."""
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) > min_m:
        return stem + repl
    return word  # suffix matched but condition failed: stop scanning


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"),  # DEPARTURE (paper: abli -> able)
    ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),  # DEPARTURE (addition)
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word

    # ---- Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ies"):
        word = word[:-2]
    elif word.endswith("ss"):
        pass
    elif word.endswith("s"):
        word = word[:-1]

    # ---- Step 1b
    if word.endswith("eed"):
        stem = word[:-3]
        if _measure(stem) > 0:
            word = word[:-1]
    else:
        hit = None
        if word.endswith("ed"):
            stem = word[:-2]
            if _has_vowel(stem):
                word = stem
                hit = True
        elif word.endswith("ing"):
            stem = word[:-3]
            if _has_vowel(stem):
                word = stem
                hit = True
        if hit:
            if word.endswith(("at", "bl", "iz")):
                word += "e"
            elif _ends_double_cons(word) and word[-1] not in "lsz":
                word = word[:-1]
            elif _measure(word) == 1 and _cvc(word):
                word += "e"

    # ---- Step 1c
    if word.endswith("y") and _has_vowel(word[:-1]):
        word = word[:-1] + "i"

    # ---- Step 2
    for suf, repl in _STEP2:
        if word.endswith(suf):
            stem = word[: len(word) - len(suf)]
            if _measure(stem) > 0:
                word = stem + repl
            break

    # ---- Step 3
    for suf, repl in _STEP3:
        if word.endswith(suf):
            stem = word[: len(word) - len(suf)]
            if _measure(stem) > 0:
                word = stem + repl
            break

    # ---- Step 4
    for suf in _STEP4:
        if word.endswith(suf):
            stem = word[: len(word) - len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                word = stem
            break

    # ---- Step 5a
    if word.endswith("e"):
        stem = word[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            word = stem

    # ---- Step 5b
    if _measure(word) > 1 and _ends_double_cons(word) and word.endswith("l"):
        word = word[:-1]

    return word
