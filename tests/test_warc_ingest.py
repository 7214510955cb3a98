"""WARC reader vs the reference's record semantics
(`ClueWeb09Collection.java`): only response records become documents,
docid = WARC-TREC-ID, content = payload after the HTTP Content-Length
header line; multi-member gzip files decode transparently."""

import gzip


def _record(wtype: str, trec_id: str, uri: str, http_body: str) -> bytes:
    payload = (
        "HTTP/1.1 200 OK\r\n"
        "Content-Type: text/html\r\n"
        f"Content-Length: {len(http_body)}\r\n"
        "\r\n"
        f"{http_body}"
    ).encode()
    head = (
        "WARC/0.18\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-TREC-ID: {trec_id}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _warcinfo() -> bytes:
    body = b"software: synthetic\r\n"
    head = (
        "WARC/0.18\r\n"
        "WARC-Type: warcinfo\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


WARC_BYTES = (
    _warcinfo()
    + _record("response", "clueweb09-en0000-00-00001",
              "http://example.org/a",
              "<html><body>first warc page body</body></html>")
    + _record("request", "", "http://example.org/a", "GET / HTTP/1.1")
    + _record("response", "clueweb09-en0000-00-00002",
              "http://example.org/b",
              "<html><body>second <b>page</b> here</body></html>")
)


def test_parse_warc_records():
    from anserini_spark.corpus.warc_ingest import parse_warc, response_content

    recs = parse_warc(WARC_BYTES)
    assert [r["type"] for r in recs] == [
        "warcinfo", "response", "request", "response"]
    responses = [r for r in recs if r["type"] == "response"]
    assert [r["docid"] for r in responses] == [
        "clueweb09-en0000-00-00001", "clueweb09-en0000-00-00002"]
    body = response_content(responses[0]["payload"])
    # reference contract: everything after the HTTP Content-Length line
    assert body.strip().startswith("<html>")
    assert "first warc page body" in body


def test_warc_corpus_gz_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from anserini_spark.corpus.warc_ingest import warc_corpus
    from anserini_spark.index.build import IndexConfig, build_index
    from anserini_spark.search.bm25 import BM25Params
    from anserini_spark.search.searcher import InvertedIndex, search_kernel

    # two gzip members concatenated (ClueWeb layout)
    half = len(WARC_BYTES) // 2
    gz = gzip.compress(WARC_BYTES[:half]) + gzip.compress(WARC_BYTES[half:])
    f = tmp_path / "seg.warc.gz"
    f.write_bytes(gz)

    corpus = warc_corpus(spark, str(f))
    rows = {r["docid"]: r["text"] for r in corpus.collect()}
    assert rows == {
        "clueweb09-en0000-00-00001": "first warc page body",
        "clueweb09-en0000-00-00002": "second page here",
    }

    out = str(tmp_path / "widx")
    build_index(
        spark,
        corpus.select(F.col("docid").alias("url"), "text", "lang"),
        IndexConfig(out_dir=out, doc_partitions=1, block_partitions=1),
    )
    hits = search_kernel(InvertedIndex(spark, out), {1: "second page"},
                         BM25Params(k=5)).collect()
    assert hits[0]["docid"] == "clueweb09-en0000-00-00002"
