from __future__ import annotations

import shutil

import pytest

from anserini_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="anserini-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_index(spark, tmp_path_factory):
    """Build one small index from the sf0.001-derived web corpus,
    shared across search/index tests."""
    from anserini_spark.corpus.synth import web_corpus
    from anserini_spark.index.build import IndexConfig, build_index

    out = str(tmp_path_factory.mktemp("idx") / "tiny")
    corpus = web_corpus(spark, "/root/testdata/sf0.001")
    cfg = IndexConfig(out_dir=out, doc_partitions=3, block_partitions=5)
    build_index(spark, corpus, cfg)
    yield out
    shutil.rmtree(out, ignore_errors=True)


@pytest.fixture(scope="session")
def tiny_docs(spark):
    """The same corpus as plain dict url -> text (en, non-empty,
    deduped) — oracle input."""
    from anserini_spark.corpus.synth import web_corpus

    rows = web_corpus(spark, "/root/testdata/sf0.001").collect()
    docs = {}
    for r in rows:
        if r["lang"] == "en" and r["text"] and r["text"].strip():
            docs[r["url"]] = r["text"]
    return docs
