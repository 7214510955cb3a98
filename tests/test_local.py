"""LocalSearcher (no-Spark serving path) must be result-identical to
the distributed kernel engine, and fast (no Spark jobs)."""

import time

from anserini_spark.search.bm25 import BM25Params
from anserini_spark.search.local import LocalSearcher
from anserini_spark.search.searcher import InvertedIndex, search_kernel

QUERIES = {1: "spark merge join", 2: "customer value", 3: "scan",
           4: "zzz-nothing"}


def test_local_matches_kernel(spark, tiny_index):
    idx = InvertedIndex(spark, tiny_index)
    spark_rows = {}
    for r in search_kernel(idx, QUERIES, BM25Params(k=15)).collect():
        spark_rows.setdefault(r["qid"], []).append(
            (r["docid"], r["rank"], round(float(r["score"]), 6))
        )
    ls = LocalSearcher(tiny_index)
    for qid, qtext in QUERIES.items():
        got = [(u, rk, round(s, 6)) for u, rk, s in ls.search(qtext, k=15)]
        assert got == spark_rows.get(qid, []), qid


def test_local_latency_no_spark(tiny_index):
    ls = LocalSearcher(tiny_index)
    ls.search("spark join", k=10)  # warm pyarrow datasets
    t0 = time.time()
    for _ in range(5):
        ls.search("spark merge join", k=10)
    per_query = (time.time() - t0) / 5
    assert per_query < 0.5, f"local search too slow: {per_query:.3f}s"


def test_local_set_bm25(tiny_index):
    ls = LocalSearcher(tiny_index)
    a = ls.search("spark join", k=5)
    ls.set_bm25(3.44, 0.87)
    b = ls.search("spark join", k=5)
    assert a and b and a != b
