"""JsonCollection path: jsonl -> corpus shape -> index -> search,
mirroring the reference's MS MARCO flow end-to-end."""

import json

import pytest

from anserini_spark.corpus.json_ingest import read_json_collection
from anserini_spark.index.build import IndexConfig, build_index
from anserini_spark.search.bm25 import BM25Params
from anserini_spark.search.searcher import InvertedIndex, search_kernel

DOCS = [
    {"id": "d1", "contents": "the quick brown fox jumps", "source": "a"},
    {"id": "d2", "contents": "quick quick fox", "source": "b"},
    {"id": "d3", "contents": "lazy dogs sleep all day", "source": "a"},
    {"id": "d4", "contents": "brown dogs and brown foxes", "source": "c"},
]


@pytest.fixture(scope="module")
def jsonl(tmp_path_factory):
    p = tmp_path_factory.mktemp("jsonl") / "docs.jsonl"
    with open(p, "w") as f:
        for d in DOCS:
            f.write(json.dumps(d) + "\n")
    return str(p)


def test_read_json_collection_shape(spark, jsonl):
    df = read_json_collection(spark, jsonl)
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"d1", "d2", "d3", "d4"}
    assert rows["d1"]["text"] == "the quick brown fox jumps"
    assert rows["d1"]["fields"] == {"source": "a"}
    assert rows["d1"]["lang"] == "en"


def test_json_collection_end_to_end(spark, jsonl, tmp_path):
    corpus = read_json_collection(spark, jsonl)
    out = str(tmp_path / "jidx")
    build_index(spark, corpus, IndexConfig(out_dir=out, doc_partitions=2,
                                           block_partitions=2))
    idx = InvertedIndex(spark, out)
    hits = search_kernel(idx, {1: "quick fox"}, BM25Params(k=5)).collect()
    got = [r["docid"] for r in hits]
    # d2 has quick x2 + fox and is shortest -> top
    assert got[0] == "d2"
    assert set(got) == {"d1", "d2", "d4"}  # d4 matches neither... fox->fox
    # actually d4 has "foxes"->fox via porter ("foxes" -> "fox")
    assert idx.stats["num_docs"] == 4


def test_missing_fields_error(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"docid": "x", "body": "y"}\n')
    with pytest.raises(ValueError):
        read_json_collection(spark, str(p))
