"""HTML->text extraction fixtures (FIXTURES.md §5) — the behaviors of
Jsoup ``Element.text()`` (`collection/JsoupStringTransform.java:24-32`)
the extractor must reproduce, plus the generator roundtrip invariant
(byte-identical extracted text per url, BASELINE.json input_hint)."""

import random

from anserini_spark.corpus.synth import _render_html
from anserini_spark.extraction.html2text import extract_text


def test_basic_blocks_and_inline():
    assert extract_text(b"<p>a</p><p>b</p>") == "a b"
    assert extract_text(b"<b>a</b>c") == "ac"
    assert extract_text(b"<div>x<span>y</span></div>z") == "xy z"


def test_script_style_excluded():
    html = b"<head><style>p {color: red}</style><script>var x=1;</script></head><body><p>hi</p></body>"
    assert extract_text(html) == "hi"
    assert extract_text(b"<noscript>no</noscript><p>yes</p>") == "yes"


def test_entities_decoded():
    assert extract_text(b"<p>salt &amp; pepper</p>") == "salt & pepper"
    assert extract_text(b"<p>&#97;&#98;c</p>") == "abc"
    assert extract_text("<p>caf&eacute;</p>".encode()) == "café"


def test_whitespace_normalized():
    assert extract_text(b"<p>  a \n\t  b  </p>") == "a b"
    assert extract_text(b"a\n\nb") == "a b"


def test_malformed_unclosed():
    assert extract_text(b"<p>a<p>b<div>c") == "a b c"
    assert extract_text(b"<b>bold text") == "bold text"


def test_title_and_br():
    assert extract_text(b"<title>T</title><p>b</p>") == "T b"
    assert extract_text(b"a<br>b") == "a b"


def test_empty_and_none():
    assert extract_text(b"") == ""
    assert extract_text(None) == ""
    assert extract_text(b"<div>   </div>") == ""


def test_generator_roundtrip_invariant():
    random.seed(11)
    vocab = ["spark", "join", "the", "scan", "dog's", "3.14", "can't",
             "merge", "window", "a", "filter", "batch"]
    for doc_id in range(0, 300, 11):
        text = " ".join(random.choice(vocab) for _ in range(random.randint(0, 80)))
        html = _render_html(doc_id, text, "en").encode("utf-8")
        assert extract_text(html) == text


def test_fast_path_equals_parser_randomized():
    """The regex fast path must equal the HTMLParser reference
    implementation on randomized adversarial HTML (or fall back)."""
    import random

    from anserini_spark.extraction.html2text import (
        _extract_text_parser,
        extract_text,
    )

    random.seed(23)
    pieces = [
        "<p>", "</p>", "<div class='a>b'>", "</div>", "<b>", "</b>",
        "<script>var x = '<p>';</script>", "<style>.x{}</style>",
        "<!-- a <div> comment -->", "<!DOCTYPE html>", "<br/>",
        "<img src=x alt=\"y>z\">", "&amp;", "&lt;tag&gt;", "&#65;",
        "plain words here", "1 < 2", "a > b", "  spaces\t\n ",
        "<noscript>hidden</noscript>", "<ul><li>x</li></ul>",
        "<table><tr><td>c</td></tr></table>", "<span>inline</span>",
        "<!-- unterminated", "<![CDATA[weird]]>", "<?pi data?>",
        "<p>unclosed", "text<", "<3 hearts",
    ]
    for _ in range(300):
        html = "".join(random.choice(pieces)
                       for _ in range(random.randint(1, 25)))
        assert extract_text(html) == _extract_text_parser(html), html


def test_fast_path_equals_parser_on_corpus(spark):
    """Zero divergence across the full synthetic corpus (which
    deliberately exercises entities, script/style noise, nested
    inline tags and empty bodies)."""
    from anserini_spark.corpus.synth import web_corpus
    from anserini_spark.extraction.html2text import (
        _extract_text_parser,
        extract_text,
    )

    rows = web_corpus(spark, "/root/testdata/sf0.001").collect()
    for r in rows:
        if r["html"] is None:
            continue
        h = bytes(r["html"]).decode("utf-8", "replace")
        assert extract_text(h) == _extract_text_parser(h)


def test_vectorized_batch_equals_rowwise_randomized():
    """extract_series (arrow/re2 vectorized batch path, round 4) must
    be byte-identical to row-wise extract_text on randomized
    adversarial HTML — including the constructs that force its
    hazard-mask fallbacks (angle-in-quote, tag-open hitting '<',
    interleaved skip spans, comments, CDATA, PIs)."""
    import random

    import pandas as pd

    from anserini_spark.extraction.html2text import (
        extract_series,
        extract_text,
    )

    random.seed(29)
    pieces = [
        "<p>", "</p>", "<div class='a>b'>", "</div>", "<b>", "</b>",
        "<script>var x = '<p>';</script>", "<style>.x{}</style>",
        "<!-- a <div> comment -->", "<!DOCTYPE html>", "<br/>",
        "<img src=x alt=\"y>z\">", "&amp;", "&lt;tag&gt;", "&#65;",
        "plain words here", "1 < 2", "a > b", "  spaces\t\n ",
        "<noscript>hidden</noscript>", "<ul><li>x</li></ul>",
        "<!-- unterminated", "<![CDATA[weird]]>", "<?pi data?>",
        "<p>unclosed", "text<", "<3 hearts",
        "<a href=x<div>y>", '<a href="<div>">t</a>',
        "<style>a<script>b</style>c</script>d",
        "<script>a<style>b</script>c</style>d",
        "<style><script></style></script>",
        "<scr<!a>ipt>alert</script>", "<!x<div>>",
        "<header>h</header><head>x</head>", "<menuitem>m</menuitem>",
        "<divx>notdiv</divx>", "</div stray attr>t",
        "<template><td>t</td></template>z", "<DIV>UP</DIV>",
        "<p title='a\"b'>mix</p>", "unclosed <a href=",
    ]
    batch = []
    for _ in range(400):
        batch.append("".join(random.choice(pieces)
                             for _ in range(random.randint(1, 25))))
    batch += [None, "", b"<p>bytes &#98;</p>"]
    s = pd.Series(batch, dtype="object")
    got = extract_series(s)
    ref = s.map(extract_text)
    for i in range(len(s)):
        assert got[i] == ref[i], batch[i]


def test_vectorized_batch_equals_rowwise_on_corpus(spark):
    """Zero vectorized-vs-rowwise divergence across the full synthetic
    corpus, and the vectorized fast path (not the fallback) must carry
    nearly all rows — otherwise the batch path silently degrades to
    the row-wise speed."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from anserini_spark.corpus.synth import web_corpus
    from anserini_spark.extraction.html2text import (
        _A_INELIGIBLE,
        _decode,
        extract_series,
        extract_text,
    )

    rows = web_corpus(spark, "/root/testdata/sf0.001").collect()
    s = pd.Series([r["html"] for r in rows])
    got = extract_series(s)
    ref = s.map(extract_text)
    assert (got == ref).all()
    arr = pa.array([_decode(h) for h in s], type=pa.string())
    eligible = len(arr) - pc.sum(
        pc.match_substring_regex(arr, _A_INELIGIBLE)).as_py()
    assert eligible / len(arr) > 0.95
