"""HTML -> text extraction with Jsoup ``Element.text()`` semantics.

Reference contract (`collection/JsoupStringTransform.java:24-32`,
`ClueWeb09Collection.java:386`): parse the DOM, concatenate text nodes,
normalize whitespace runs to single spaces, separate block-level
elements by a space, exclude <script>/<style> data nodes, decode
character entities. The corpus generator (`corpus/synth.py`) and this
extractor are written against the same contract, and the per-row
invariant is ``extract_text(html) == text`` byte-identical per url
(BASELINE.json input_hint).

Implemented twice with pinned equivalence:

* ``_extract_text_parser`` — the REFERENCE implementation on the
  stdlib ``html.parser`` event stream (handles every construct).
* the default fast path — three compiled-regex passes (comment strip,
  script/style span strip, quote-aware tag replacement) + entity
  unescape. ~6-10x faster per page; it FALLS BACK to the parser
  implementation whenever a construct the regexes cannot mirror
  remains (unterminated comments, CDATA, processing instructions,
  nested/unterminated skip tags). Equivalence parser-vs-fast is
  pinned on the golden fixtures, the full synthetic corpus, and
  adversarial samples (`tests/test_html2text.py`).

Wrapped in an Arrow-batched pandas UDF for the Spark plan.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List

import pandas as pd

# HTML block-level elements: entering/leaving one is a whitespace
# boundary (Jsoup inserts whitespace between block siblings).
_BLOCK_TAGS = frozenset(
    """address article aside blockquote body br caption center dd details
    dir div dl dt fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6
    head header hr html li main menu nav ol p pre section summary table
    tbody td tfoot th thead title tr ul""".split()
)

_SKIP_TAGS = frozenset(["script", "style", "template", "noscript"])

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        # convert_charrefs=True decodes &amp; &#97; etc. into text
        super().__init__(convert_charrefs=True)
        self._parts: List[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS and tag not in _VOID_TAGS:
            self._skip_depth += 1
        if tag in _BLOCK_TAGS:
            self._parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag in _BLOCK_TAGS:
            self._parts.append("\n")

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self._parts.append("\n")

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self._parts.append(data)


def _extract_text_parser(html: str) -> str:
    """Reference implementation (stdlib HTMLParser event stream)."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    # normalize: any whitespace run -> single space; strip ends
    return " ".join("".join(p._parts).split())


import re as _re

_COMMENT_RE = _re.compile(r"<!--.*?-->", _re.S)
_SKIP_RE = _re.compile(
    r"<(script|style|template|noscript)\b[^>]*>.*?</\1\s*>",
    _re.S | _re.I,
)
_SKIP_OPEN_RE = _re.compile(r"<(?:script|style|template|noscript)\b",
                            _re.I)
# quote-aware tag matcher: quoted attribute values may contain < or >
_TAG_RE = _re.compile(
    r"""</?([a-zA-Z][a-zA-Z0-9-]*)(?:"[^"]*"|'[^']*'|[^<>"'])*>"""
)
_DECL_RE = _re.compile(r"<![^>]*>")
_RISKY_RE = _re.compile(r"<!\[CDATA\[|<\?")


def extract_text(html: bytes | str | None) -> str:
    """Extract visible text; whitespace-normalized, space-joined.
    Regex fast path with automatic fallback to the HTMLParser
    reference implementation on constructs the regexes can't mirror."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    if _RISKY_RE.search(html):
        return _extract_text_parser(html)
    stripped = _COMMENT_RE.sub("", html)  # comments emit nothing
    if "<!--" in stripped:  # unterminated comment
        return _extract_text_parser(html)
    stripped = _SKIP_RE.sub("", stripped)  # skip spans emit nothing
    if _SKIP_OPEN_RE.search(stripped):  # nested/unterminated skip tag
        return _extract_text_parser(html)
    stripped = _DECL_RE.sub("", stripped)

    def _tag_repl(m: "_re.Match[str]") -> str:
        return "\n" if m.group(1).lower() in _BLOCK_TAGS else ""

    text = _TAG_RE.sub(_tag_repl, stripped)
    if "<" in text:
        # leftover markup-ish content the tag regex refused: the
        # parser also treats bare '<' followed by non-letter as text,
        # but anything else means a construct we didn't mirror
        if _re.search(r"<[a-zA-Z/!?]", text):
            return _extract_text_parser(html)
    import html as _htmlmod

    return " ".join(_htmlmod.unescape(text).split())


def extract_series(htmls: pd.Series) -> pd.Series:
    return htmls.map(extract_text)


def make_extract_udf():
    """pandas UDF ``binary -> string`` (vectorized HTML->text)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _extract(htmls: pd.Series) -> pd.Series:
        return extract_series(htmls)

    return _extract
