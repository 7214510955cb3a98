"""Anserini-equivalent English analyzer chain, Spark-first.

Chain (reference: `analysis/DefaultEnglishAnalyzer.java:51-74`):

    StandardTokenizer (UAX#29 word-break)
      -> EnglishPossessiveFilter  (strip trailing 's)
      -> LowerCaseFilter
      -> StopFilter               (Lucene English stop set, 33 words)
      -> PorterStemFilter         (original Porter)

Implemented from scratch for vectorized execution: the tokenizer is a
single compiled regex approximating UAX#29 word segmentation for
Latin-script web text (the corpus is `lang == 'en'`):

* runs of word characters (letters / digits / underscore) form tokens;
* ``'`` / ``’`` and ``.`` do not break letter-letter boundaries
  (UAX#29 MidNumLet / Single_Quote: ``can't``, ``example.com`` are one
  token each — matching Lucene's StandardTokenizer);
* ``,`` and ``.`` do not break digit-digit boundaries (``3.14``,
  ``1,000``);
* everything else (hyphens, slashes, whitespace, punctuation) breaks.

Tokens longer than 255 chars are dropped (StandardTokenizer's
maxTokenLength discards over-long runs).

The whole chain runs inside an Arrow-batched pandas UDF
(`analyze_udf`) — no per-row Python in the Spark plan. A plain-Python
`analyze()` is exposed for query-side (driver) use, mirroring
`analysis/AnalyzerUtils.java:31-55`.
"""

from __future__ import annotations

import re
from typing import Iterable, List

import pandas as pd

from .krovetz import kstem
from .porter import porter_stem
from .stopwords import ENGLISH_STOP_WORDS


def stem_mode(analyzer: str) -> str:
    """Map an index analyzer name -> the ``stem`` argument of
    ``analyze`` ("porter" | "krovetz" | "none")."""
    return analyzer if analyzer in ("porter", "krovetz") else "none"

# UAX#29-ish word regex for Latin web text. \w in Python3 re is
# unicode-aware (letters, digits, underscore).
_TOKEN_RE = re.compile(
    r"""
    \w+                       # initial run of word chars
    (?:
        ['’.]\w+         # '  /  '  /  .  joining two word chars
      | ,(?=\d)\d+            # ,  joining digits (1,000)
    )*
    """,
    re.VERBOSE | re.UNICODE,
)

_POSSESSIVE_RE = re.compile(r"['’][sS]$")

_MAX_TOKEN_LEN = 255


def tokenize(text: str) -> List[str]:
    """UAX#29-style word segmentation (see module docstring)."""
    if not text:
        return []
    return [t for t in _TOKEN_RE.findall(text) if len(t) <= _MAX_TOKEN_LEN]


# per-(stem, keep_stopwords) token-result cache: web-text vocabularies
# are Zipf, so the hit rate is near 1 — turns the per-token chain into
# a dict lookup. None = token removed by the chain. Size-capped.
_TOKEN_CACHE: dict = {}
_CACHE_CAP = 1_000_000
_MISS = object()


def _process_token(tok: str, stem: str, keep_stopwords: bool):
    t = _POSSESSIVE_RE.sub("", tok).lower()
    if not t:
        return None
    if not keep_stopwords and t in ENGLISH_STOP_WORDS:
        return None
    if stem == "porter":
        return porter_stem(t)
    if stem == "krovetz":
        return kstem(t)
    return t


def analyze(text: str, stem: str = "porter", keep_stopwords: bool = False) -> List[str]:
    """Full chain: tokenize -> possessive strip -> lowercase -> stop -> stem.

    ``stem`` in {"porter", "none"}; ``keep_stopwords`` mirrors
    `-keepStopwords` (`IndexCollection.java:746-748`).
    """
    cache = _TOKEN_CACHE.setdefault((stem, keep_stopwords), {})
    out: List[str] = []
    for tok in tokenize(text):
        r = cache.get(tok, _MISS)
        if r is _MISS:
            r = _process_token(tok, stem, keep_stopwords)
            if len(cache) < _CACHE_CAP:
                cache[tok] = r
        if r is not None:
            out.append(r)
    return out


def analyze_with_positions(
    text: str, stem: str = "porter", keep_stopwords: bool = False
) -> List[tuple]:
    """Like ``analyze`` but returns [(term, position)] where position
    is the token's index in the tokenized stream BEFORE stopword
    removal — Lucene's StopFilter keeps position increments, so
    removed stopwords leave gaps (`DefaultEnglishAnalyzer.java:57`,
    enablePositionIncrements default). SDM's ordered/unordered windows
    measure distances over these positions."""
    cache = _TOKEN_CACHE.setdefault((stem, keep_stopwords), {})
    out: List[tuple] = []
    for pos, tok in enumerate(tokenize(text)):
        r = cache.get(tok, _MISS)
        if r is _MISS:
            r = _process_token(tok, stem, keep_stopwords)
            if len(cache) < _CACHE_CAP:
                cache[tok] = r
        if r is not None:
            out.append((r, pos))
    return out


def analyze_series(texts: pd.Series, stem: str = "porter",
                   keep_stopwords: bool = False) -> pd.Series:
    """Vectorized (batch) form used inside pandas UDFs."""
    return texts.map(
        lambda t: analyze(t if isinstance(t, str) else "", stem, keep_stopwords)
    )


def make_analyze_udf(stem: str = "porter", keep_stopwords: bool = False):
    """Returns a pandas UDF ``string -> array<string>`` running the chain
    JVM->Arrow-batched (no per-row Python dispatch in the plan)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _analyze(texts: pd.Series) -> pd.Series:
        return analyze_series(texts, stem=stem, keep_stopwords=keep_stopwords)

    return _analyze


def analyze_queries(queries: Iterable[str], **kw) -> List[List[str]]:
    """Driver-side batch analysis for (tiny) query sets."""
    return [analyze(q, **kw) for q in queries]
