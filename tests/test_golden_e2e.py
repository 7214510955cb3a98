"""End-to-end golden run-line parity with the reference's pinned CI
outputs (`integration/TrecEndToEndTest.java:83-126`, quoted in
BASELINE.md): TREC SGML file -> record split -> tag strip -> porter
analyzer -> block index -> retrieval -> EXACT 6-decimal score lines,
for bm25 (default/lossy norms), qld, qljm, inl2, f2exp and f2log.

The corpus/topic fixtures reproduce the reference's 3-document test
collection and TREC topic; the expected lines are the reference's
published goldens. SPL is excluded: Lucene 8.3's DistributionSPL
binary arithmetic is not reconstructible from the sources available
here (the published SPL formula is implemented and brute-verified in
test_similarities.py).
"""

import pytest

from anserini_spark.corpus.trec_ingest import trec_corpus
from anserini_spark.index.build import IndexConfig, build_index
from anserini_spark.io.runs import read_trec_topics
from anserini_spark.search.bm25 import BM25Params
from anserini_spark.search.qld import search_qld, search_qljm
from anserini_spark.search.searcher import InvertedIndex, search_kernel
from anserini_spark.search.similarities import (
    search_f2exp,
    search_f2log,
    search_inl2,
)

SEGMENT = """<DOC>
<DOCNO> TREC_DOC_1 </DOCNO>
<FILEID>FILEID1</FILEID>
<FIRST> not sure what is this </FIRST>
<SECOND> not sure </SECOND>
<HEAD>This is head</HEAD>
<DATELINE>TOKYO (AP) </DATELINE>
<TEXT>
   very simple
   text
</TEXT>
</DOC>
<DOC>
<DOCNO> DOC222 </DOCNO>
<FILEID>FILEID2</FILEID>
<FIRST> again, not sure</FIRST>
<SECOND> umh?</SECOND>
<HEAD>HEAD</HEAD>
<DATELINE>MEXICO CITY (AP) </DATELINE>
<TEXT>
   simple
   enough
   text
   text
   text
</TEXT>
</DOC>
<DOC>
<DOCNO>
WSJ_1
</DOCNO>
<DOCID>
1A2B3C
</DOCID>
<HL>
   head text
</HL>
<DATE>
01/30/03
</DATE>
<SO>
WALL STREET JOURNAL (J), PAGE -16
</SO>
<CO>
   Anserini Who
</CO>
<MS>
FINANCIAL (FIN)
</MS>
<IN>
CENTRAL U.S. BANKS (BAC)
</IN>
<NS>
ACQUISITIONS &amp; MERGERS, TAKEOVERS, BOARD BATTLES (TNM)
</NS>
<RE>
NORTH AMERICA (NME)
OHIO (OH)
UNITED STATES (US)
</RE>
<LP>
content
</LP>
<TEXT>
</TEXT>
</DOC>
"""

TOPIC = """<top>

<num> Number:  001

<title> Topic:  simple text

<desc> Description:

Find some news articles

<narr> Narrative:

Find as many as possible news articles

</top>
"""

# `TrecEndToEndTest.java` referenceRunOutput (tag column dropped)
GOLDEN = {
    "bm25": [("DOC222", 1, "0.343200"), ("TREC_DOC_1", 2, "0.333400"),
             ("WSJ_1", 3, "0.068700")],
    "qld": [("DOC222", 1, "0.002500"), ("TREC_DOC_1", 2, "0.001700"),
            ("WSJ_1", 3, "0.000000")],
    "qljm": [("DOC222", 1, "4.872300"), ("TREC_DOC_1", 2, "4.619100"),
             ("WSJ_1", 3, "1.658200")],
    "inl2": [("TREC_DOC_1", 1, "0.133200"), ("DOC222", 2, "0.126100"),
             ("WSJ_1", 3, "0.021100")],
    "f2exp": [("DOC222", 1, "1.434700"), ("TREC_DOC_1", 2, "1.269600"),
              ("WSJ_1", 3, "0.536200")],
    "f2log": [("DOC222", 1, "0.548500"), ("TREC_DOC_1", 2, "0.523100"),
              ("WSJ_1", 3, "0.139500")],
}


@pytest.fixture(scope="module")
def golden_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("golden")
    seg = root / "segment1.txt"
    seg.write_text(SEGMENT)
    corpus = trec_corpus(spark, str(seg))
    # the documented contents contract (`TrecEndToEndTest.java:38-66`)
    contents = {r["url"]: r["text"] for r in corpus.collect()}
    assert contents == {
        "TREC_DOC_1": "This is head very simple text",
        "DOC222": "HEAD simple enough text text text",
        "WSJ_1": "head text 01/30/03 content",
    }
    out = str(root / "idx")
    build_index(spark, corpus.select("url", "text", "lang"),
                IndexConfig(out_dir=out, doc_partitions=1,
                            block_partitions=1))
    topic = root / "topics.txt"
    topic.write_text(TOPIC)
    topics = read_trec_topics(str(topic))
    assert topics == {1: "simple text"}
    return out, topics


def _lines(df):
    return [(r["docid"], r["rank"], f"{float(r['score']):.6f}")
            for r in df.collect() if r["qid"] == 1]


def test_golden_bm25_default_lossy(spark, golden_index):
    out, topics = golden_index
    idx = InvertedIndex(spark, out)
    got = _lines(search_kernel(idx, topics, BM25Params(lossy=True)))
    assert got == GOLDEN["bm25"]


def test_golden_qld(spark, golden_index):
    out, topics = golden_index
    idx = InvertedIndex(spark, out)
    got = _lines(search_qld(idx, topics, mu=1000.0))
    assert got == GOLDEN["qld"]


def test_golden_qljm(spark, golden_index):
    out, topics = golden_index
    idx = InvertedIndex(spark, out)
    got = _lines(search_qljm(idx, topics, lam=0.1))
    assert got == GOLDEN["qljm"]


def test_golden_inl2(spark, golden_index):
    out, topics = golden_index
    idx = InvertedIndex(spark, out)
    got = _lines(search_inl2(idx, topics, c=0.1))
    assert got == GOLDEN["inl2"]


def test_golden_f2exp(spark, golden_index):
    out, topics = golden_index
    idx = InvertedIndex(spark, out)
    got = _lines(search_f2exp(idx, topics, s=0.5))
    assert got == GOLDEN["f2exp"]


def test_golden_f2log(spark, golden_index):
    out, topics = golden_index
    idx = InvertedIndex(spark, out)
    got = _lines(search_f2log(idx, topics, s=0.5))
    assert got == GOLDEN["f2log"]
