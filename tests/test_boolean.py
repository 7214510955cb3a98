"""Boolean composition (SHOULD/MUST/MUST_NOT/FILTER) vs a brute-force
python evaluation over the same corpus."""

from collections import Counter

import numpy as np
import pytest

from anserini_spark.analysis.analyzer import analyze
from anserini_spark.search.bm25 import BM25Params, idf
from anserini_spark.search.boolean import search_boolean
from anserini_spark.search.searcher import InvertedIndex

QUERIES = {
    1: {"should": ["spark", "merge"], "must": ["join"], "must_not": [],
        "filter": []},
    2: {"should": ["customer value"], "must": [], "must_not": ["spark"],
        "filter": []},
    3: {"should": ["scan"], "must": [], "must_not": [], "filter": ["filter"]},
    4: {"should": ["spark"], "must": ["zzz-nonexistent"], "must_not": [],
        "filter": []},
    # filter-only: matches with score 0 (Lucene BooleanQuery semantics)
    5: {"should": [], "must": [], "must_not": [], "filter": ["merge"]},
    # filter + must_not, no scoring clause
    6: {"should": [], "must": [], "must_not": ["spark"], "filter": ["scan"]},
}


def _brute(docs, queries, k):
    tf, dl, df = {}, {}, Counter()
    for url, text in docs.items():
        toks = analyze(text)
        c = Counter(toks)
        tf[url], dl[url] = c, len(toks)
        df.update(c.keys())
    n = sum(1 for v in dl.values() if v > 0)
    avgdl = sum(dl.values()) / n
    c1 = np.float32(0.9) * np.float32(0.6)
    c2 = np.float32(0.9) * np.float32(0.4) / np.float32(avgdl)
    out = {}
    for qid, cl in queries.items():
        a = {c: [t for raw in cl.get(c, []) for t in analyze(raw)]
             for c in ("should", "must", "must_not", "filter")}
        hits = []
        if any(t not in df for t in a["must"]) or any(
            t not in df for t in a["filter"]
        ):
            out[qid] = []
            continue
        for url in docs:
            if a["must"] and not all(t in tf[url] for t in set(a["must"])):
                continue
            if a["filter"] and not all(t in tf[url] for t in set(a["filter"])):
                continue
            if any(t in tf[url] for t in a["must_not"]):
                continue
            s = 0.0
            for t in set(a["should"]) | set(a["must"]):
                f = tf[url].get(t)
                if f and t in df:
                    w = np.float32(idf(df[t], n))
                    s += float(np.float32(
                        w * np.float32(f) / (np.float32(f) + c1 + c2 * np.float32(dl[url]))))
            # SHOULD is required (min 1 match) only when the query has
            # no MUST/FILTER clause; otherwise zero-score matches stay
            req_should = not a["must"] and not a["filter"]
            if req_should and s <= 0:
                continue
            hits.append((url, np.float32(s)))
        hits.sort(key=lambda x: (-x[1], x[0]))
        out[qid] = [(u, r + 1) for r, (u, _) in enumerate(hits[:k])]
    return out


def test_boolean_matches_bruteforce(spark, tiny_index, tiny_docs):
    idx = InvertedIndex(spark, tiny_index)
    got = {}
    res = search_boolean(idx, QUERIES, BM25Params(k=15))
    for r in res.collect():
        got.setdefault(r["qid"], []).append((r["docid"], r["rank"]))
    want = _brute(tiny_docs, QUERIES, 15)
    for qid in QUERIES:
        assert got.get(qid, []) == want[qid], qid


def test_must_not_excludes(spark, tiny_index):
    idx = InvertedIndex(spark, tiny_index)
    plain = search_boolean(
        idx, {9: {"should": ["customer value"]}}, BM25Params(k=100)
    ).collect()
    excl = search_boolean(
        idx, {9: {"should": ["customer value"], "must_not": ["spark"]}},
        BM25Params(k=100),
    ).collect()
    assert 0 < len(excl) < len(plain)


def test_boolean_plan_is_term_pruned(spark, tiny_index):
    """Boolean queries must read the term-pruned block scan, not
    explode the whole docvec posting table."""
    idx = InvertedIndex(spark, tiny_index)
    df = search_boolean(idx, {1: {"should": ["spark"], "filter": ["merge"]}},
                        BM25Params(k=5))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "arrays_zip" not in plan
    assert "blocks" in plan
