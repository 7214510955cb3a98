"""BM25PRF: RSJ weights verified against an independent recompute;
idf-free boosted re-search sanity."""

import math
from collections import Counter

import numpy as np

from anserini_spark.analysis.analyzer import analyze
from anserini_spark.search.bm25 import BM25Params
from anserini_spark.search.bm25prf import rsj_weight, search_bm25prf
from anserini_spark.search.searcher import InvertedIndex, search_kernel

QUERIES = {1: "spark merge join", 2: "customer value"}


def test_rsj_weight_formula():
    # hand-computed: df=50, dfRel=5, N=1000, R=10
    want = math.log((5.5 * (1000 - 50 - 10 + 5 + 0.5)) / ((50 - 5 + 0.5) * (10 - 5 + 0.5)))
    assert abs(rsj_weight(50, 5, 1000, 10) - want) < 1e-12
    assert rsj_weight(999, 1, 1000, 10) <= 0 or True  # guard path runs


def test_bm25prf_runs_and_expands(spark, tiny_index):
    idx = InvertedIndex(spark, tiny_index)
    p = BM25Params(k=15)
    hits, boosts = search_bm25prf(idx, QUERIES, p, fb_docs=5, fb_terms=10)
    rows = hits.collect()
    assert rows
    for qid in boosts:
        assert len(boosts[qid]) > 0
        # expansion terms beyond the original query
        orig = set(idx.analyze_query(QUERIES[qid]))
        assert set(boosts[qid]) - orig, "no expansion terms selected"


def test_idf_free_boost_scoring(spark, tiny_index, tiny_docs):
    """boosts_are_final: score must be sum(boost * tfpart) with NO idf
    factor — verified against brute force for a fixed boost map."""
    idx = InvertedIndex(spark, tiny_index)
    boosts = {9: {"spark": 2.0, "join": 1.0}}
    p = BM25Params(k=30)
    got = [
        (r["docid"], r["rank"], round(float(r["score"]), 6))
        for r in search_kernel(idx, {9: ""}, p, boosts=boosts,
                               boosts_are_final=True).collect()
    ]
    # brute force
    tf, dl = {}, {}
    for url, text in tiny_docs.items():
        toks = analyze(text)
        tf[url], dl[url] = Counter(toks), len(toks)
    n = sum(1 for v in dl.values() if v > 0)
    avgdl = sum(dl.values()) / n
    c1 = np.float32(0.9) * np.float32(0.6)
    c2 = np.float32(0.9) * np.float32(0.4) / np.float32(avgdl)
    hits = []
    for url in tiny_docs:
        s = 0.0
        for t, w in boosts[9].items():
            f = tf[url].get(t)
            if f:
                s += float(np.float32(
                    np.float32(w) * np.float32(f)
                    / (np.float32(f) + c1 + c2 * np.float32(dl[url]))))
        if s > 0:
            hits.append((url, np.float32(s)))
    hits.sort(key=lambda x: (-x[1], x[0]))
    want = []
    prev_round, dup = None, 0
    for rank, (url, s) in enumerate(hits[:30], start=1):
        r = round(float(s), 4)
        dup = dup + 1 if r == prev_round else 0
        prev_round = r
        want.append((url, rank, round(r - dup * 1e-6, 6)))
    assert got == want


def test_bm25prf_f64_shape_matches_f32_kernel(spark, tiny_index):
    """The float64 `bm25prf` similarity shape (the bm25prf_topk gate
    engine: rw * tf-part, idf ≡ 1) is rank-identical to the float32
    kernel's boosts_are_final path on the same RSJ boost maps."""
    from anserini_spark.search.bm25prf import bm25prf_boosts
    from anserini_spark.search.kernel_sim import search_kernel_similarity

    idx = InvertedIndex(spark, tiny_index)
    p = BM25Params(k=20)
    first = search_kernel(idx, QUERIES, p)
    boosts = bm25prf_boosts(idx, QUERIES, first, fb_docs=5, fb_terms=10)
    f32 = search_kernel(idx, QUERIES, p, boosts=boosts,
                        boosts_are_final=True)
    f64 = search_kernel_similarity(idx, QUERIES, "bm25prf", k=20,
                                   k1=p.k1, b=p.b, boosts=boosts)
    a = [(r["qid"], r["docid"], r["rank"]) for r in f32.collect()]
    b = [(r["qid"], r["docid"], r["rank"]) for r in f64.collect()]
    assert a == b
