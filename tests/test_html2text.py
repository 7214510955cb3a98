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
