"""Tweet JSONL reader (`corpus/tweet_ingest.py`) — the
TweetCollection/TweetGenerator filter contract, plus end-to-end
JSONL -> tweet index -> search_tweets."""

import json

import pytest


@pytest.fixture(scope="module")
def jsonl(tmp_path_factory):
    d = tmp_path_factory.mktemp("tweets")
    rows = [
        {"id_str": "100", "text": "spark is awesome #spark",
         "created_at": "Fri Mar 29 11:03:41 +0000 2013", "lang": "en"},
        {"id_str": "200",
         "text": "read this http://t.co/abc about spark",
         "created_at": "Sat Mar 30 09:00:00 +0000 2013", "lang": "en"},
        # deletion notice -> skipped
        {"delete": {"status": {"id_str": "300"}}},
        # retweet -> skipped by default
        {"id_str": "400", "text": "RT spark rocks",
         "created_at": "Sun Mar 31 10:00:00 +0000 2013", "lang": "en",
         "retweeted_status": {"id_str": "100"}},
        # URL-only text -> empty after stripping -> skipped
        {"id_str": "500", "text": "http://only.example/x",
         "created_at": "Mon Apr 01 10:00:00 +0000 2013", "lang": "en"},
        # beyond max_id when one is set
        {"id_str": "900", "text": "tweet from the future",
         "created_at": "Tue Apr 02 10:00:00 +0000 2013", "lang": "en"},
        # malformed (no created_at) -> skipped
        {"id_str": "600", "text": "no timestamp"},
    ]
    p = d / "statuses.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n\n")
    return str(p)


def test_reader_filters(spark, jsonl):
    from anserini_spark.corpus.tweet_ingest import tweet_corpus

    rows = {r["url"]: r for r in tweet_corpus(spark, jsonl).collect()}
    assert set(rows) == {"100", "200", "900"}
    # URL stripped, text trimmed
    assert rows["200"]["text"] == "read this  about spark".replace("  ", " ") \
        or rows["200"]["text"] == "read this  about spark"
    # created_at parsed
    ts = rows["100"]["warc_ts"]
    assert (ts.year, ts.month, ts.day, ts.hour) == (2013, 3, 29, 11)
    assert rows["100"]["lang"] == "en"


def test_reader_options(spark, jsonl):
    from anserini_spark.corpus.tweet_ingest import tweet_corpus

    with_rt = {r["url"] for r in
               tweet_corpus(spark, jsonl, keep_retweets=True).collect()}
    assert "400" in with_rt
    capped = {r["url"] for r in
              tweet_corpus(spark, jsonl, max_id=500).collect()}
    assert capped == {"100", "200"}
    kept_urls = {r["url"]: r["text"] for r in
                 tweet_corpus(spark, jsonl, keep_urls=True).collect()}
    assert "http://only.example/x" in kept_urls["500"]


def test_jsonl_to_search_end_to_end(spark, jsonl, tmp_path):
    from anserini_spark.corpus.tweet_ingest import tweet_corpus
    from anserini_spark.index.build import IndexConfig, build_index
    from anserini_spark.search.searcher import BM25Params, InvertedIndex
    from anserini_spark.search.tweets import search_tweets

    corpus = tweet_corpus(spark, jsonl)
    out = str(tmp_path / "tw_idx")
    build_index(spark, corpus, IndexConfig(
        out_dir=out, analyzer="tweet", lang=None,
        doc_partitions=2, block_partitions=2))
    idx = InvertedIndex(spark, out)
    # querytweettime 250 excludes tweet 900
    hits = search_tweets(idx, {1: "spark"}, {1: 250},
                         BM25Params(k=10)).collect()
    ids = [r["docid"] for r in hits]
    assert set(ids) == {"100", "200"}
