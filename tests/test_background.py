"""Background linking (`search/background.py`): tf-idf query
generation from a docid, weighted search, cosine-dedup rerank,
paragraph round-robin, date filter."""

import datetime

import pytest

from anserini_spark.index.build import IndexConfig, build_index


@pytest.fixture(scope="module")
def bg(spark, tmp_path_factory):
    """Corpus with a query doc, an exact duplicate of it, two related
    docs (one newer), and noise."""
    rows = [
        ("doc/query", datetime.datetime(2020, 1, 10),
         "solar panels power the grid\n\nsolar adoption is growing fast",
         "en"),
        ("doc/dup", datetime.datetime(2020, 1, 11),
         "solar panels power the grid\n\nsolar adoption is growing fast",
         "en"),
        ("doc/rel1", datetime.datetime(2020, 1, 5),
         "grid operators add solar capacity", "en"),
        ("doc/rel2", datetime.datetime(2020, 2, 1),
         "new solar farm powers the region grid", "en"),
        ("doc/noise1", datetime.datetime(2020, 1, 1),
         "cooking pasta with tomato sauce", "en"),
        ("doc/noise2", datetime.datetime(2020, 1, 2),
         "football season results and scores", "en"),
    ]
    corpus = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, lang string")
    out = str(tmp_path_factory.mktemp("bg") / "idx")
    build_index(spark, corpus, IndexConfig(
        out_dir=out, doc_partitions=2, block_partitions=2,
        store_contents=True, store_timestamps=True))
    from anserini_spark.search.searcher import InvertedIndex

    return InvertedIndex(spark, out)


def test_background_query_tfidf(bg):
    from anserini_spark.search.background import background_query

    q = background_query(bg, "doc/query", k=5)
    assert q  # non-empty weighted query
    # rare doc-only terms (df=1, e.g. 'adopt') outrank the common
    # 'solar' (tf 3, df 4): 1*ln(7/1) > 3*ln(7/4)
    assert "solar" in q and "adopt" in q
    assert q["adopt"] > q["solar"] > 0
    # unweighted mode: all weights 1.0, same term set
    q1 = background_query(bg, "doc/query", k=5, weighted=False)
    assert set(q1) == set(q) and all(v == 1.0 for v in q1.values())


def test_search_removes_query_doc_and_duplicates(spark, bg):
    from anserini_spark.search.background import search_background_linking
    from anserini_spark.search.bm25 import BM25Params

    hits = search_background_linking(
        bg, {1: "doc/query"}, BM25Params(k=10)).collect()
    ids = [r["docid"] for r in hits]
    # the query doc (cosine 1.0) and its exact duplicate are dropped
    assert "doc/query" not in ids and "doc/dup" not in ids
    # related docs survive, ranked
    assert "doc/rel1" in ids and "doc/rel2" in ids
    assert [r["rank"] for r in hits] == list(range(1, len(hits) + 1))


def test_date_filter_drops_newer_docs(spark, bg):
    from anserini_spark.search.background import search_background_linking
    from anserini_spark.search.bm25 import BM25Params

    hits = search_background_linking(
        bg, {1: "doc/query"}, BM25Params(k=10),
        date_filter=True).collect()
    ids = [r["docid"] for r in hits]
    # rel2 (2020-02-01) was published after the query doc (2020-01-10)
    assert "doc/rel2" not in ids and "doc/rel1" in ids


def test_paragraph_mode_round_robin(spark, bg):
    from anserini_spark.search.background import search_background_linking
    from anserini_spark.search.bm25 import BM25Params

    hits = search_background_linking(
        bg, {1: "doc/query"}, BM25Params(k=10),
        paragraph=True).collect()
    ids = [r["docid"] for r in hits]
    assert "doc/query" not in ids and "doc/dup" not in ids
    assert "doc/rel1" in ids or "doc/rel2" in ids
    # synthetic round-robin scores are strictly decreasing
    scores = [r["score"] for r in sorted(hits, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)


def test_unknown_docid_raises(bg):
    from anserini_spark.search.background import background_query

    with pytest.raises(ValueError, match="not found"):
        background_query(bg, "doc/missing")


def test_batched_driver_runs_one_kernel_search(spark, bg, monkeypatch):
    """Round-7 batching contract: the driver loop issues ONE kernel
    search for the whole topic batch (not one per topic), and the
    batched output equals per-topic runs concatenated."""
    import anserini_spark.search.background as B
    from anserini_spark.search.bm25 import BM25Params

    params = BM25Params(k=10)
    topics = {1: "doc/query", 2: "doc/rel1", 3: "doc/rel2"}

    singles = []
    for qid, d in topics.items():
        singles.extend(
            (qid, r["docid"], r["rank"], r["score"])
            for r in B.search_background_linking(
                bg, {qid: d}, params).collect())

    calls = []
    real = B.search_kernel

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(B, "search_kernel", counting)
    batched = [
        (r["qid"], r["docid"], r["rank"], r["score"])
        for r in B.search_background_linking(bg, topics, params).collect()
    ]
    assert len(calls) == 1  # one kernel search for all topics
    assert sorted(batched) == sorted(singles)
