"""Golden top-k runs (FIXTURES.md §7): both Spark engines must be
rank- AND score-identical to the pure-numpy float32 oracle, with
tie adjustment applied — the analogue of the reference's pinned
6-decimal run lines (`integration/TrecEndToEndTest.java:83-126`).
Also pins engine-vs-engine identity and segment-count invariance
(merge/parallelism parity, `MultiThreadingSearchTest` analogue)."""

import pytest

from anserini_spark.analysis.analyzer import analyze
from anserini_spark.search.bm25 import BM25Params
from anserini_spark.search.oracle import oracle_topk
from anserini_spark.search.searcher import (
    InvertedIndex,
    SimpleSearcher,
    search_dataframe,
    search_kernel,
)

QUERIES = {
    1: "spark merge join",
    2: "the window batch stream",      # leading stopword
    3: "zzz-notfound quux",            # zero-hit
    4: "customer value",
    5: "scan",                         # single common term -> many ties
    6: "City buses are running on schedule",  # analyzer chain exercised
}


def _rows(df):
    return [
        (r["qid"], r["docid"], r["rank"], round(float(r["score"]), 6))
        for r in df.collect()
    ]


@pytest.fixture(scope="module")
def golden(tiny_docs):
    runs = oracle_topk(tiny_docs, QUERIES, analyze, BM25Params(k=20))
    out = []
    for qid in sorted(runs):
        for url, rank, score in runs[qid]:
            out.append((qid, url, rank, round(score, 6)))
    return out


def test_dataframe_engine_matches_oracle(spark, tiny_index, golden):
    idx = InvertedIndex(spark, tiny_index)
    got = _rows(search_dataframe(idx, QUERIES, BM25Params(k=20)))
    assert got == golden


def test_kernel_engine_matches_oracle(spark, tiny_index, golden):
    idx = InvertedIndex(spark, tiny_index)
    got = _rows(search_kernel(idx, QUERIES, BM25Params(k=20)))
    assert got == golden


def test_segment_count_invariance(spark, tiny_docs, golden, tmp_path):
    """Same corpus indexed with a different segment/partition layout
    must produce the identical run (Lucene's thread-count invariance)."""
    from anserini_spark.corpus.synth import web_corpus
    from anserini_spark.index.build import IndexConfig, build_index

    out = str(tmp_path / "idx7")
    corpus = web_corpus(spark, "/root/testdata/sf0.001")
    build_index(spark, corpus, IndexConfig(out_dir=out, doc_partitions=7,
                                           block_partitions=2))
    idx = InvertedIndex(spark, out)
    assert _rows(search_kernel(idx, QUERIES, BM25Params(k=20))) == golden
    assert _rows(search_dataframe(idx, QUERIES, BM25Params(k=20))) == golden


def test_simple_searcher_api(spark, tiny_index):
    s = SimpleSearcher(spark, tiny_index)
    hits = s.search("spark merge join", k=5)
    assert len(hits) == 5
    assert hits[0][1] == 1
    scores = [h[2] for h in hits]
    assert scores == sorted(scores, reverse=True)
    s.set_bm25(1.2, 0.75)
    hits2 = s.search("spark merge join", k=5)
    assert len(hits2) == 5


def test_score_ties_strictly_decreasing(spark, tiny_index):
    idx = InvertedIndex(spark, tiny_index)
    rows = _rows(search_kernel(idx, {5: "scan"}, BM25Params(k=50)))
    scores = [r[3] for r in rows]
    assert all(a > b for a, b in zip(scores, scores[1:])), "ties not adjusted"


def test_batch_search_list_form(spark, tiny_index):
    """Reference-parity batch_search(List[str] queries, List[str] qids,
    k, threads) -> {qid: [(docid, rank, score)]}
    (`SimpleSearcher.java:213-284`), identical hits to the dict form."""
    from anserini_spark.search.searcher import SimpleSearcher

    s = SimpleSearcher(spark, tiny_index)
    queries = ["spark merge join", "customer value"]
    got = s.batch_search(queries, ["q-a", "q-b"], k=5, threads=4)
    assert set(got) == {"q-a", "q-b"}
    df = s.batch_search({0: queries[0], 1: queries[1]}, k=5)
    want = {"q-a": [], "q-b": []}
    for r in df.collect():
        want["q-a" if r["qid"] == 0 else "q-b"].append(
            (r["docid"], r["rank"], r["score"]))
    assert got == want
    assert [h[1] for h in got["q-a"]] == [1, 2, 3, 4, 5]
    with pytest.raises(ValueError):
        s.batch_search(queries, ["only-one"], k=5)
    with pytest.raises(ValueError):
        s.batch_search(queries, ["a", "b"], k=5, threads=0)


def test_simple_searcher_set_qld(spark, tiny_index):
    """set_qld routes ranking through the QLD kernel shape
    (`SimpleSearcher.setLMDirichletSimilarity`, SimpleSearcher.java:
    192-198); set_bm25 switches back."""
    from anserini_spark.search.kernel_sim import search_kernel_similarity

    s = SimpleSearcher(spark, tiny_index)
    bm25 = s.search("spark merge join", k=5)
    s.set_qld(mu=1000.0)
    qld = s.search("spark merge join", k=5)
    idx = s.index
    want = [(r["docid"], r["rank"], r["score"]) for r in
            search_kernel_similarity(idx, {0: "spark merge join"}, "qld",
                                     k=5, mu=1000.0).collect()]
    assert qld == want
    assert qld != bm25  # different similarity, different scores
    s.set_rm3()
    try:
        s.search("spark", k=5)
        raise AssertionError("qld+rm3 must refuse, not silently ignore")
    except NotImplementedError:
        pass
    s.unset_rm3()
    s.set_bm25(0.9, 0.4)
    assert s.search("spark merge join", k=5) == bm25
