"""Non-English analyzer chains: CJK bigram (zh/ja/ko) and French.

The reference wires per-language Lucene analyzers at index and search
time (`IndexCollection.java:739-772`, `SearchCollection.java:231-251`);
these are the Spark-side equivalents of the two highest-impact ones,
implemented from the published contracts:

* ``cjk_analyze`` — Lucene ``CJKAnalyzer`` contract:
  StandardTokenizer -> CJKWidthFilter -> LowerCaseFilter ->
  CJKBigramFilter (HAN|HIRAGANA|KATAKANA|HANGUL) -> StopFilter.
  Maximal runs of CJK characters emit overlapping character bigrams;
  a CJK character isolated between non-CJK boundaries emits itself as
  a unigram (CJKBigramFilter's lone-character behavior); non-CJK
  tokens pass through the standard word segmentation, lowercased,
  minus the classic CJK stop set (the English stop set + "s", "t",
  "www").

* ``fr_analyze`` — Lucene ``FrenchAnalyzer`` chain shape:
  StandardTokenizer -> ElisionFilter -> LowerCaseFilter ->
  StopFilter(French) -> stem. The stemmer is the published Savoy
  MINIMAL French stemmer (J. Savoy, "A stemming procedure and
  stopword list for general French corpora", JASIS 50(10), 1999 —
  shipped by Lucene as ``FrenchMinimalStemFilter``), chosen over the
  heavier light stemmer because it is fully specified in the paper;
  the docstring-level divergence from the reference's default
  (FrenchLightStemFilter) is documented in COVERAGE.md.

Both chains are deterministic pure functions over unicode text, so
they run unchanged in the Arrow-batched index kernel and on the
driver for query analysis.
"""

from __future__ import annotations

import re
from typing import List

# ---------------------------------------------------------------- CJK

# The classic Lucene CJK stop set (stopwords.txt of the cjk analysis
# module): the 33-word English set plus the orphaned elision letters
# and "www".
CJK_STOP_WORDS = frozenset(
    """a and are as at be but by for if in into is it no not of on or
    s such t that the their then there these they this to was will
    with www""".split()
)

# CJK character classes bigrammed by CJKBigramFilter's default flags:
# Han (unified + ext A + compatibility), Hiragana, Katakana (+ katakana
# phonetic extensions), Hangul (syllables + jamo).
_CJK_CLASS = (
    "一-鿿"      # CJK Unified Ideographs
    "㐀-䶿"      # CJK Extension A
    "豈-﫿"      # CJK Compatibility Ideographs
    "぀-ゟ"      # Hiragana
    "゠-ヿ"      # Katakana
    "ㇰ-ㇿ"      # Katakana Phonetic Extensions
    "가-힯"      # Hangul Syllables
    "ᄀ-ᇿ"      # Hangul Jamo
    "㄰-㆏"      # Hangul Compatibility Jamo
)

# one scan: CJK runs OR latin-ish word runs (same word shape as the
# English tokenizer: letters/digits/underscore with '/’/. joiners).
# \w matches CJK too, so the word branch explicitly excludes the CJK
# classes — StandardTokenizer always splits ideographs from latin.
_W = rf"(?:(?![{_CJK_CLASS}])\w)"
_CJK_TOKEN_RE = re.compile(
    rf"(?P<cjk>[{_CJK_CLASS}]+)|(?P<word>{_W}+(?:['’.]{_W}+|,(?=\d)\d+)*)",
    re.UNICODE,
)

# CJKWidthFilter core contract for web text: fold fullwidth ASCII
# variants (U+FF01-FF5E) to their ASCII counterparts and the
# ideographic space to a plain space.
_FULLWIDTH = {i: i - 0xFEE0 for i in range(0xFF01, 0xFF5F)}
_FULLWIDTH[0x3000] = 0x20

_MAX_TOKEN_LEN = 255


def fold_width(text: str) -> str:
    return text.translate(_FULLWIDTH)


def cjk_analyze(text: str) -> List[str]:
    """CJKAnalyzer contract: bigrams over CJK runs, standard word
    tokens (lowercased, stop-filtered) elsewhere."""
    if not text:
        return []
    out: List[str] = []
    for m in _CJK_TOKEN_RE.finditer(fold_width(text)):
        run = m.group("cjk")
        if run is not None:
            if len(run) == 1:
                out.append(run)
            else:
                out.extend(run[i:i + 2] for i in range(len(run) - 1))
        else:
            w = m.group("word").lower()
            if w and len(w) <= _MAX_TOKEN_LEN and w not in CJK_STOP_WORDS:
                out.append(w)
    return out


# ------------------------------------------------------------- French

# Lucene FrenchAnalyzer's ElisionFilter article set
# (FrenchAnalyzer.DEFAULT_ARTICLES).
FRENCH_ELISION_ARTICLES = frozenset(
    ["l", "m", "t", "qu", "n", "s", "j", "d", "c",
     "jusqu", "quoiqu", "lorsqu", "puisqu"]
)

# Snowball French stop list (the set Lucene's FrenchAnalyzer loads
# from french_stop.txt) — function words only, no content terms.
FRENCH_STOP_WORDS = frozenset(
    """au aux avec ce ces dans de des du elle en et eux il ils je la
    le les leur lui ma mais me même mes moi mon ne nos notre nous on
    ou par pas pour qu que qui sa se ses son sur ta te tes toi ton tu
    un une vos votre vous c d j l à m n s t y été étée étées étés
    étant suis es est sommes êtes sont serai seras sera serons serez
    seront serais serait serions seriez seraient étais était étions
    étiez étaient fus fut fûmes fûtes furent sois soit soyons soyez
    soient fusse fusses fût fussions fussiez fussent ayant eu eue
    eues eus ai as avons avez ont aurai auras aura aurons aurez
    auront aurais aurait aurions auriez auraient avais avait avions
    aviez avaient eut eûmes eûtes eurent aie aies ait ayons ayez
    aient eusse eusses eût eussions eussiez eussent ceci cela celà
    cet cette ici ils les leurs quel quels quelle quelles sans
    soi""".split()
)

_APOSTROPHES = ("'", "’")


def fr_minimal_stem(w: str) -> str:
    """Savoy's minimal French stemmer (JASIS 50(10), 1999; Lucene
    ``FrenchMinimalStemFilter``): words under 6 chars unchanged;
    plural -aux -> -al; then strip final x/s/r/e/é and collapse a
    doubled final letter, in that order."""
    if len(w) < 6:
        return w
    if w[-1] == "x":
        if w.endswith("aux"):
            w = w[:-2] + "l"
        else:
            w = w[:-1]
        return w
    if w[-1] == "s":
        w = w[:-1]
    if w[-1] == "r":
        w = w[:-1]
    if w[-1] == "e":
        w = w[:-1]
    if w[-1] == "é":  # é
        w = w[:-1]
    if len(w) > 1 and w[-1] == w[-2]:
        w = w[:-1]
    return w


def _elide(tok: str) -> str:
    """Strip a leading elided article (l', d', qu', ... case
    insensitive) — ElisionFilter semantics."""
    for apo in _APOSTROPHES:
        i = tok.find(apo)
        if 0 < i and tok[:i].lower() in FRENCH_ELISION_ARTICLES:
            return tok[i + 1:]
    return tok


# same word shape as the English tokenizer (apostrophe keeps
# "l'avion" one token for the elision filter to split)
_FR_TOKEN_RE = re.compile(
    r"\w+(?:['’.]\w+|,(?=\d)\d+)*", re.UNICODE)


def fr_analyze(text: str) -> List[str]:
    """FrenchAnalyzer chain: tokenize -> elision -> lowercase ->
    French stop set -> Savoy minimal stem."""
    if not text:
        return []
    out: List[str] = []
    for tok in _FR_TOKEN_RE.findall(text):
        t = _elide(tok).lower()
        if not t or len(t) > _MAX_TOKEN_LEN or t in FRENCH_STOP_WORDS:
            continue
        out.append(fr_minimal_stem(t))
    return out


# Registry used by IndexConfig/searchers to route per-language chains
# (the `-language` flag analogue, `IndexCollection.java:739-772`).
LANG_ANALYZERS = {
    "zh": "cjk",
    "ja": "cjk",
    "ko": "cjk",
    "fr": "fr",
    "en": "porter",
}


def analyzer_for_lang(lang: str) -> str:
    """Map a corpus language code to the engine's analyzer name
    (unknown languages fall back to the no-stem English chain, the
    reference's default-analyzer behavior)."""
    return LANG_ANALYZERS.get(lang, "none")
