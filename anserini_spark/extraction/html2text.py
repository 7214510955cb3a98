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


# ---------------------------------------------------------------------------
# Vectorized batch path (round 4): the per-page cost of the Python fast
# path is dominated by `_TAG_RE.sub(_tag_repl, ...)` — one Python
# callback per tag (~37 of 60 us/page measured). pyarrow's re2-based
# string kernels run the same passes in C++ with no per-match Python.
# re2 has no backreferences or lookaround, so the passes are rewritten:
#   * the skip-span strip (`</\1>` backref) becomes four per-tag passes
#     — same spans per tag name; exotic interleavings (e.g. a <style>
#     span swallowing a <script> open) change only which rows fall back
#     to the row-wise path, never the output;
#   * the conditional tag replacement (block -> "\n", inline -> "")
#     becomes two passes: a block-name alternation first, then the
#     generic tag pattern. Equivalent ONLY when no quoted attribute
#     value contains '<' or '>' (a quoted '<div>' inside another tag's
#     attribute would be visible to the block pass) — such rows are
#     detected up front with the quote-aware grammar and routed to the
#     row-wise path, as are rows with comments/CDATA/PIs.
# Every mask/post-check mirrors a fallback the row-wise path already
# has; ineligible rows go through `extract_text` unchanged, so
# `extract_series(s) == s.map(extract_text)` byte-identical always
# (pinned over the full synthetic corpus + adversarial fixtures in
# tests/test_html2text.py).

# tag-name boundary without lookahead: immediately '>' or one
# non-name-char then the generic quote-aware body
_A_BLOCK = ("(?i)</?(?:" + "|".join(sorted(_BLOCK_TAGS)) + ")"
            "(?:>|(?:\"[^\"]*\"|'[^']*'|[^<>\"'a-zA-Z0-9-])"
            "(?:\"[^\"]*\"|'[^']*'|[^<>\"'])*>)")
_A_GENERIC = "</?[a-zA-Z](?:\"[^\"]*\"|'[^']*'|[^<>\"'])*>"
# Hazards checked on the POST-strip text (skip/decl removal can create
# them by juxtaposition), routed to the row-wise path:
#  * a tag whose quoted attribute value contains '<' or '>' — visible
#    to the two-pass scheme but opaque to the single conditional pass
#    (consume the angle-free quote-aware body, then an angle in a quote)
#  * a tag-open whose body runs into another '<' before any '>' — the
#    single pass scans past it position-by-position, while a second
#    pass would rescan across earlier replacements
_A_HAZARD = ("<[a-zA-Z/](?:\"[^\"<>]*\"|'[^'<>]*'|[^<>\"'])*"
             "(?:\"[^\"]*[<>]|'[^']*[<>])"
             "|<[a-zA-Z/](?:\"[^\"]*\"|'[^']*'|[^<>\"'])*<")
_A_INELIGIBLE = r"<!\[CDATA\[|<\?|<!--"
# STRICT skip spans — content may not contain '<'. The row-wise
# `<tag>.*?</tag>` alternation is leftmost-across-names; sequential
# per-name passes are order-DEPENDENT on interleaved spans (a
# dismembered open can capture a later span's close). With '<'-free
# content, spans of all names are provably disjoint and
# order-independent; spans that do contain markup (real-world JS with
# `a<b`, nested skip tags) leave their open behind and the post-check
# routes the row to the row-wise path.
_A_SKIP = [(t, "(?is)<%s\\b[^>]*>[^<]*</%s\\s*>" % (t, t))
           for t in ("script", "style", "template", "noscript")]
_A_SKIP_OPEN = r"(?i)<(?:script|style|template|noscript)\b"
_A_LEFTOVER = r"<[a-zA-Z/!?]"


def _decode(h) -> str:
    if h is None:
        return ""
    if isinstance(h, (bytes, bytearray, memoryview)):
        return bytes(h).decode("utf-8", errors="replace")
    return h


def extract_series(htmls: pd.Series) -> pd.Series:
    import html as _htmlmod

    try:
        import pyarrow as pa
        import pyarrow.compute as pc
    except ImportError:  # pragma: no cover - pyarrow ships with pyspark
        return htmls.map(extract_text)

    decoded = [_decode(h) for h in htmls]
    arr = pa.array(decoded, type=pa.string())
    ok = pc.invert(pc.match_substring_regex(arr, _A_INELIGIBLE))
    idx = pc.indices_nonzero(ok).to_numpy(zero_copy_only=False)
    out: List[str] = [None] * len(decoded)  # type: ignore[list-item]
    if len(idx):
        sub = pc.take(arr, pa.array(idx))
        for _round in range(2):  # round 2 catches one nesting level
            for tag, pat in _A_SKIP:
                # cheap literal presence gate: a skip-tag absent from
                # the whole batch (template/noscript on most corpora,
                # everything in round 2) skips its regex pass entirely
                present = pc.any(pc.match_substring(
                    sub, "<" + tag, ignore_case=True)).as_py()
                if present:
                    sub = pc.replace_substring_regex(sub, pat, "")
        bad = pc.match_substring_regex(sub, _A_SKIP_OPEN)
        sub = pc.replace_substring_regex(sub, r"<![^>]*>", "")
        bad = pc.or_(bad, pc.match_substring_regex(sub, _A_HAZARD))
        sub = pc.replace_substring_regex(sub, _A_BLOCK, "\n")
        sub = pc.replace_substring_regex(sub, _A_GENERIC, "")
        bad = pc.or_(bad, pc.match_substring_regex(sub, _A_LEFTOVER))
        bad_np = bad.to_numpy(zero_copy_only=False)
        for i, text, is_bad in zip(idx, sub.to_pylist(), bad_np):
            out[i] = (extract_text(decoded[i]) if is_bad
                      else " ".join(_htmlmod.unescape(text).split()))
    for i, done in enumerate(out):
        if done is None:
            out[i] = extract_text(decoded[i])
    return pd.Series(out, index=htmls.index, dtype="object")


def extract_series_safe(items) -> List[str]:
    """Batch extraction with the ingest kernels' row-level exception
    isolation: a malformed page yields "", never a dead batch.
    Returns stripped text per item."""
    try:
        return [t.strip() for t in extract_series(
            pd.Series(items, dtype="object"))]
    except Exception:
        out = []
        for it in items:
            try:
                out.append(extract_text(it).strip())
            except Exception:
                out.append("")
        return out


def make_extract_udf():
    """pandas UDF ``binary -> string`` (vectorized HTML->text)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _extract(htmls: pd.Series) -> pd.Series:
        return extract_series(htmls)

    return _extract
