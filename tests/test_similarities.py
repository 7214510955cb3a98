"""InL2 / F2EXP / F2LOG vs brute-force python recompute."""

import math
from collections import Counter

import pytest

from anserini_spark.analysis.analyzer import analyze
from anserini_spark.search.searcher import InvertedIndex
from anserini_spark.search.similarities import (
    search_f2exp,
    search_f2log,
    search_inl2,
)

QUERIES = {1: "spark merge join", 2: "customer value"}


@pytest.fixture(scope="module")
def stats(tiny_docs):
    tf, dl, df = {}, {}, Counter()
    for url, text in tiny_docs.items():
        toks = analyze(text)
        tf[url] = Counter(toks)
        dl[url] = len(toks)
        df.update(tf[url].keys())
    n = sum(1 for v in dl.values() if v > 0)
    avgdl = sum(dl.values()) / n
    return tf, dl, df, n, avgdl


def _rank(spark_df):
    got = {}
    for r in spark_df.collect():
        got.setdefault(r["qid"], []).append((r["docid"], r["rank"]))
    return got


def _brute(tiny_docs, stats, contrib, k=20):
    tf, dl, df, n, avgdl = stats
    out = {}
    for qid, qtext in QUERIES.items():
        qc = Counter(analyze(qtext))
        hits = []
        for url in tiny_docs:
            s = 0.0
            for t, boost in qc.items():
                f = tf[url].get(t)
                if f and t in df:
                    s += boost * contrib(f, dl[url], df[t], n, avgdl)
            if s > 0:
                hits.append((url, s))
        hits.sort(key=lambda x: (-x[1], x[0]))
        out[qid] = [(u, r + 1) for r, (u, _) in enumerate(hits[:k])]
    return out


def test_inl2(spark, tiny_index, tiny_docs, stats):
    c = 1.0

    def contrib(f, d, dfv, n, avgdl):
        tfn = f * math.log2(1 + c * avgdl / d)
        return (1 / (tfn + 1)) * tfn * math.log2((n + 1) / (dfv + 0.5))

    idx = InvertedIndex(spark, tiny_index)
    assert _rank(search_inl2(idx, QUERIES, k=20)) == _brute(
        tiny_docs, stats, contrib)


def test_f2exp(spark, tiny_index, tiny_docs, stats):
    def contrib(f, d, dfv, n, avgdl):
        return f / (f + 0.5 + 0.5 * d / avgdl) * ((n + 1) / dfv) ** 0.35

    idx = InvertedIndex(spark, tiny_index)
    assert _rank(search_f2exp(idx, QUERIES, k=20)) == _brute(
        tiny_docs, stats, contrib)


def test_f2log(spark, tiny_index, tiny_docs, stats):
    def contrib(f, d, dfv, n, avgdl):
        return f / (f + 0.5 + 0.5 * d / avgdl) * math.log((n + 1) / dfv)

    idx = InvertedIndex(spark, tiny_index)
    assert _rank(search_f2log(idx, QUERIES, k=20)) == _brute(
        tiny_docs, stats, contrib)


def test_spl(spark, tiny_index, tiny_docs, stats):
    from anserini_spark.search.similarities import search_spl

    c = 1.0

    def contrib(f, d, dfv, n, avgdl):
        tfn = f * math.log2(1 + c * avgdl / d)
        lam = (dfv + 1.0) / (n + 1.0)
        return -math.log2((lam ** (tfn / (tfn + 1)) - lam) / (1 - lam))

    idx = InvertedIndex(spark, tiny_index)
    assert _rank(search_spl(idx, QUERIES, k=20)) == _brute(
        tiny_docs, stats, contrib)
