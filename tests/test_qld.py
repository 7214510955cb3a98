"""QLD vs brute-force python recompute (formula-level parity)."""

import math
from collections import Counter

from anserini_spark.analysis.analyzer import analyze
from anserini_spark.search.qld import search_qld
from anserini_spark.search.searcher import InvertedIndex

QUERIES = {1: "spark merge join", 2: "customer value", 3: "the scan"}
MU = 1000.0


def _brute(docs, queries, k=20):
    tf, dl, cf = {}, {}, Counter()
    for url, text in docs.items():
        toks = analyze(text)
        tf[url] = Counter(toks)
        dl[url] = len(toks)
        cf.update(toks)
    sum_tf = sum(dl.values())
    out = {}
    for qid, qtext in queries.items():
        qc = Counter(analyze(qtext))
        hits = []
        for url in docs:
            s = 0.0
            matched = False
            for t, boost in qc.items():
                f = tf[url].get(t)
                if not f or t not in cf:
                    continue
                p_c = (cf[t] + 1.0) / (sum_tf + 1.0)
                # per-term clamp at 0 (Lucene LMSimilarity.score)
                s += max(0.0, boost * (math.log(1 + f / (MU * p_c))
                                       + math.log(MU / (dl[url] + MU))))
                matched = True
            if matched:
                hits.append((url, s))
        hits.sort(key=lambda x: (-x[1], x[0]))
        out[qid] = [(u, r + 1, round(s, 6)) for r, (u, s) in enumerate(hits[:k])]
    return out


def test_qld_matches_bruteforce(spark, tiny_index, tiny_docs):
    idx = InvertedIndex(spark, tiny_index)
    got = {}
    for r in search_qld(idx, QUERIES, mu=MU, k=20).collect():
        got.setdefault(r["qid"], []).append(
            (r["docid"], r["rank"])
        )
    want = _brute(tiny_docs, QUERIES)
    for qid in QUERIES:
        w = [(u, rk) for u, rk, _ in want.get(qid, [])]
        assert got.get(qid, []) == w, qid


def _brute_jm(docs, queries, lam=0.1, k=20):
    tf, dl, cf = {}, {}, Counter()
    for url, text in docs.items():
        toks = analyze(text)
        tf[url] = Counter(toks)
        dl[url] = len(toks)
        cf.update(toks)
    sum_tf = sum(dl.values())
    out = {}
    for qid, qtext in queries.items():
        qc = Counter(analyze(qtext))
        hits = []
        for url in docs:
            s = 0.0
            for t, boost in qc.items():
                f = tf[url].get(t)
                if not f or t not in cf:
                    continue
                p_c = (cf[t] + 1.0) / (sum_tf + 1.0)
                s += max(0.0, boost * math.log(
                    1 + ((1 - lam) * f / dl[url]) / (lam * p_c)
                ))
            if s > 0:
                hits.append((url, s))
        hits.sort(key=lambda x: (-x[1], x[0]))
        out[qid] = [(u, r + 1) for r, (u, _) in enumerate(hits[:k])]
    return out


def test_qljm_matches_bruteforce(spark, tiny_index, tiny_docs):
    from anserini_spark.search.qld import search_qljm

    idx = InvertedIndex(spark, tiny_index)
    got = {}
    for r in search_qljm(idx, QUERIES, lam=0.1, k=20).collect():
        got.setdefault(r["qid"], []).append((r["docid"], r["rank"]))
    want = _brute_jm(tiny_docs, QUERIES)
    for qid in QUERIES:
        assert got.get(qid, []) == want.get(qid, []), qid
