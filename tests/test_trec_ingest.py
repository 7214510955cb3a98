"""TREC SGML reader vs the reference's documented parse semantics
(`TrecCollectionTest.java:42-56`: only whitelisted content tags are
retained in raw; DOCNO may span lines; <DOC id="..."> variant)."""

import pytest

from anserini_spark.corpus.trec_ingest import parse_trec_file

SEGMENT = """<DOC>
<DOCNO> AP-0001 </DOCNO>
<FILEID>AP-NR-001</FILEID>
<FIRST>should be excluded</FIRST>
<HEAD>This is head and should be included</HEAD>
<HEADLINE>This is headline and should be included</HEADLINE>
<NOTE>should be excluded</NOTE>
<TEXT>
Hopefully we
get this
right
</TEXT>
</DOC>
<DOC>
<DOCNO>
WSJ_1
</DOCNO>
<DOCID>should not leak</DOCID>
<HL>
   head text
</HL>
<SO>excluded source</SO>
<TEXT>
here is some text.
</TEXT>
</DOC>
<DOC id="LDC-42">
<KEYWORD>nope</KEYWORD>
<TEXT>
attribute id variant
</TEXT>
</DOC>
"""


def test_parse_trec_records():
    recs = dict(parse_trec_file(SEGMENT))
    assert set(recs) == {"AP-0001", "WSJ_1", "LDC-42"}
    assert recs["AP-0001"] == (
        "<HEAD>This is head and should be included</HEAD>\n"
        "<HEADLINE>This is headline and should be included</HEADLINE>\n"
        "<TEXT>\nHopefully we\nget this\nright\n</TEXT>"
    )
    assert recs["WSJ_1"] == (
        "<HL>\nhead text\n</HL>\n<TEXT>\nhere is some text.\n</TEXT>"
    )
    assert recs["LDC-42"] == "<TEXT>\nattribute id variant\n</TEXT>"


def test_trec_corpus_end_to_end(spark, tmp_path):
    """File -> records -> tag-stripped contents -> index -> search."""
    from anserini_spark.corpus.trec_ingest import trec_corpus
    from anserini_spark.index.build import IndexConfig, build_index
    from anserini_spark.search.bm25 import BM25Params
    from anserini_spark.search.searcher import InvertedIndex, search_kernel

    seg = tmp_path / "segment1.txt"
    seg.write_text(SEGMENT)
    corpus = trec_corpus(spark, str(seg))
    rows = {r["url"]: r for r in corpus.collect()}
    assert set(rows) == {"AP-0001", "WSJ_1", "LDC-42"}
    assert rows["WSJ_1"]["text"] == "head text here is some text."

    out = str(tmp_path / "tidx")
    build_index(spark, corpus.select("url", "text", "lang"),
                IndexConfig(out_dir=out, doc_partitions=1,
                            block_partitions=1))
    idx = InvertedIndex(spark, out)
    hits = search_kernel(idx, {1: "headline", 2: "attribute variant"},
                         BM25Params(k=5)).collect()
    got = {(r["qid"], r["docid"]) for r in hits}
    assert (1, "AP-0001") in got
    assert (2, "LDC-42") in got


TRECWEB_SEGMENT = """<DOC>
<DOCNO> WEB-0001 </DOCNO>
<DOCHDR>http://example.org/1 HTTP/1.1 200
Content-Type: text/html</DOCHDR>
<html><body>first web page body</body></html>
</DOC>
<DOC>
WEB-0002 </DOCNO>
<DOCHDR>broken: no DOCNO start tag</DOCHDR>
<html>should be skipped</html>
</DOC>
<DOC>
<DOCNO> WEB-0003 </DOCNO>
<DOCHDR>http://example.org/3 HTTP/1.1 200</DOCHDR>
<html><body>third <b>page</b></body></html>
</DOC>
"""


def test_parse_trecweb_skips_malformed():
    """Mirrors the reference's trecweb sample: record 2 lacks the
    <DOCNO> start tag and must be skipped, not raise
    (`TrecwebCollectionTest` sample comments)."""
    from anserini_spark.corpus.trec_ingest import parse_trecweb_file

    recs = parse_trecweb_file(TRECWEB_SEGMENT)
    assert [d for d, _ in recs] == ["WEB-0001", "WEB-0003"]
    assert recs[0][1].startswith("<html>")
    assert "DOCHDR" not in recs[0][1]


def test_trecweb_corpus(spark, tmp_path):
    from anserini_spark.corpus.trec_ingest import trecweb_corpus

    seg = tmp_path / "web1.txt"
    seg.write_text(TRECWEB_SEGMENT)
    rows = {r["url"]: r["text"] for r in trecweb_corpus(spark, str(seg)).collect()}
    assert rows == {"WEB-0001": "first web page body",
                    "WEB-0003": "third page"}


def test_clean_trec_keeps_tags(spark, tmp_path):
    """CleanTrecCollection contract: contents == raw, tags NOT
    stripped (`CleanTrecCollection.java:25-55`)."""
    from anserini_spark.corpus.trec_ingest import clean_trec_corpus

    seg = tmp_path / "clean1.txt"
    seg.write_text(
        "<DOC>\n<DOCNO>doc1</DOCNO>\n<TEXT>\n"
        "a bit of text, and the <p>tags should not be removed.</p>\n"
        "</TEXT>\n</DOC>\n"
        '<DOC id="doc2">\n<TEXT>\nhere is some text.\n</TEXT>\n</DOC>\n'
    )
    rows = {r["url"]: r["text"] for r in clean_trec_corpus(spark, str(seg)).collect()}
    assert set(rows) == {"doc1", "doc2"}
    assert "<p>tags should not be removed.</p>" in rows["doc1"]
    assert rows["doc2"] == "<TEXT>\nhere is some text.\n</TEXT>"
