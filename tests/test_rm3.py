"""RM3 expansion: model math verified against an independent
recomputation from docvec + first-pass scores; boosted re-search
sanity (original-terms-only query with boost 1 == plain search)."""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from anserini_spark.search.bm25 import BM25Params
from anserini_spark.search.rm3 import rm3_boosts, search_rm3
from anserini_spark.search.searcher import InvertedIndex, search_kernel

QUERIES = {1: "spark merge join", 2: "customer value"}


def test_rm3_model_matches_independent_recompute(spark, tiny_index):
    idx = InvertedIndex(spark, tiny_index)
    p = BM25Params(k=50)
    first = search_kernel(idx, QUERIES, p)
    boosts = rm3_boosts(idx, QUERIES, first, fb_docs=5, fb_terms=8, alpha=0.5)

    # independent recompute
    top = {r["qid"]: [] for r in first.collect()}
    for r in first.filter(F.col("rank") <= 5).collect():
        top[r["qid"]].append((r["docid"], float(r["score"])))
    docvec = {
        r["url"]: (dict(zip(r["terms"], r["tfs"])), r["doclen"])
        for r in idx.docvec.collect()
    }
    dict_rows = {r["term"]: r["df"] for r in idx.dictionary.collect()}
    n_docs = idx.stats["num_docs"]
    for qid, qtext in QUERIES.items():
        qtoks = idx.analyze_query(qtext)
        rm = defaultdict(float)
        for url, score in top[qid]:
            tfs, dl = docvec[url]
            filt = {}
            for t, tf in tfs.items():
                if not (2 <= len(t) <= 20) or not t.isalnum():
                    continue
                if t not in dict_rows or dict_rows[t] / n_docs > 0.1:
                    continue
                filt[t] = float(tf)
            # per-doc pruneToSize(fbTerms) + L1-of-pruned normalization
            pruned = dict(
                sorted(filt.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
            )
            norm = sum(pruned.values())
            if norm <= 0.001:
                continue
            for t, tf in pruned.items():
                rm[t] += tf / norm * score
        sel = sorted(rm.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
        norm = sum(v for _, v in sel)
        want = defaultdict(float)
        for t in qtoks:
            want[t] += 0.5 / len(qtoks)
        for t, v in sel:
            want[t] += 0.5 * v / norm
        got = boosts[qid]
        assert set(got) == set(want)
        for t in want:
            assert abs(got[t] - want[t]) < 1e-9, t


def test_rm3_search_runs_and_differs(spark, tiny_index):
    idx = InvertedIndex(spark, tiny_index)
    p = BM25Params(k=10)
    plain = [(r["qid"], r["docid"], r["rank"])
             for r in search_kernel(idx, QUERIES, p).collect()]
    hits, boosts = search_rm3(idx, QUERIES, p, fb_docs=5, fb_terms=8)
    rm3 = [(r["qid"], r["docid"], r["rank"]) for r in hits.collect()]
    assert len(rm3) > 0
    for qid in QUERIES:
        assert len(boosts[qid]) > len(idx.analyze_query(QUERIES[qid])) - 1
    # expansion usually changes the ranking on this corpus
    assert rm3 != plain


def test_boost_path_identity_with_uniform_boosts(spark, tiny_index):
    """Searching with explicit boosts == analyzed-term counts must
    equal the plain text path (weight = count * idf both ways)."""
    idx = InvertedIndex(spark, tiny_index)
    p = BM25Params(k=15)
    q = {3: "spark merge join"}
    toks = idx.analyze_query(q[3])
    from collections import Counter

    boosts = {3: {t: float(c) for t, c in Counter(toks).items()}}
    a = [(r["qid"], r["docid"], r["rank"], round(float(r["score"]), 6))
         for r in search_kernel(idx, q, p).collect()]
    b = [(r["qid"], r["docid"], r["rank"], round(float(r["score"]), 6))
         for r in search_kernel(idx, q, p, boosts=boosts).collect()]
    assert a == b


def test_kernel_similarity_boosts_path(spark, tiny_index):
    """The float64 shape path with explicit boosts (the rm3_topk gate
    engine) is rank-identical to the float32 kernel's boosted path —
    the BoostQuery analogue behaves the same in both engines."""
    from anserini_spark.search.kernel_sim import search_kernel_similarity

    idx = InvertedIndex(spark, tiny_index)
    p = BM25Params(k=20)
    first = search_kernel(idx, QUERIES, p)
    boosts = rm3_boosts(idx, QUERIES, first, fb_docs=5, fb_terms=8,
                        alpha=0.5)
    f32 = search_kernel(idx, QUERIES, p, boosts=boosts)
    f64 = search_kernel_similarity(idx, QUERIES, "bm25", k=20,
                                   k1=p.k1, b=p.b, boosts=boosts)
    a = [(r["qid"], r["docid"], r["rank"]) for r in f32.collect()]
    b = [(r["qid"], r["docid"], r["rank"]) for r in f64.collect()]
    assert a == b
