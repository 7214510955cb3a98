"""BM25PRF — Robertson-Sparck-Jones relevance-weight pseudo feedback
(`rerank/lib/BM25PrfReranker.java:67-330`).

1. First-pass BM25; top ``fb_docs`` = pseudo-relevant set (R docs).
2. For each candidate term t from the feedback docs (hygiene:
   ``[a-z0-9]+`` length 2-20, `BM25PrfReranker.java:153-157`):

       dfRel = # feedback docs containing t
       rw(t) = log( (dfRel+0.5) * (N - df - R + dfRel + 0.5)
                  / ((df - dfRel + 0.5) * (R - dfRel + 0.5)) )
       offer(t) = rw(t) * log(dfRel)        (L227-258)

3. Keep the top ``fb_terms`` by offer weight (dfRel >= 2 so that
   log(dfRel) > 0); always include the original query terms with
   their own rw.
4. Re-search with term weights = rw and **idf ≡ 1**
   (BM25PrfSimilarity, L54-65) — the engines' ``boosts_are_final``
   path: score(d) = sum_t rw(t) * tf/(tf + k1(1-b) + k1*b/avgdl*dl).
"""

from __future__ import annotations

import math
import re
from collections import defaultdict
from typing import Dict, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25 import BM25Params
from .searcher import InvertedIndex, search_kernel

_TERM_OK = re.compile(r"^[a-z0-9]+$")


def rsj_weight(df: int, df_rel: int, n_docs: int, r: int) -> float:
    num = (df_rel + 0.5) * (n_docs - df - r + df_rel + 0.5)
    den = (df - df_rel + 0.5) * (r - df_rel + 0.5)
    if den <= 0 or num <= 0:
        return 0.0
    return math.log(num / den)


def bm25prf_boosts(
    index: InvertedIndex,
    queries: Dict[int, str],
    first_pass: DataFrame,
    fb_docs: int = 10,
    fb_terms: int = 20,
) -> Dict[int, Dict[str, float]]:
    # tiny fb-doc set -> url IN (...) pushdown filter (row-group
    # pruning on the url-sorted docvec; a join could not prune)
    top = first_pass.filter(F.col("rank") <= fb_docs).select(
        "qid", F.col("docid").alias("url")
    ).collect()
    by_url: Dict[str, list] = defaultdict(list)
    for r in top:
        by_url[r["url"]].append(int(r["qid"]))
    fb_sets: Dict[int, list] = defaultdict(list)
    if by_url:
        rows = (
            index.docvec.select("url", "terms")
            .filter(F.col("url").isin(sorted(by_url)))
            .collect()
        )
        for r in rows:
            tset = set(r["terms"])
            for qid in by_url[r["url"]]:
                fb_sets[qid].append(tset)
    cand = {
        t
        for sets in fb_sets.values()
        for s in sets
        for t in s
        if _TERM_OK.match(t) and 2 <= len(t) <= 20
    }
    qtoks = {qid: index.analyze_query(q) for qid, q in queries.items()}
    cand |= {t for toks in qtoks.values() for t in toks}
    dfs = index.term_dfs(cand)
    n_docs = index.stats["num_docs"]

    boosts: Dict[int, Dict[str, float]] = {}
    for qid, sets in fb_sets.items():
        r = len(sets)
        df_rel = defaultdict(int)
        for s in sets:
            for t in s:
                df_rel[t] += 1
        scored: Dict[str, Tuple[float, float]] = {}
        for t, dr in df_rel.items():
            if t not in dfs or not _TERM_OK.match(t) or not 2 <= len(t) <= 20:
                continue
            rw = rsj_weight(dfs[t], dr, n_docs, r)
            if rw <= 0 or dr < 2:
                continue
            scored[t] = (rw * math.log(dr), rw)
        top_terms = sorted(scored.items(), key=lambda kv: (-kv[1][0], kv[0]))[
            :fb_terms
        ]
        bmap = {t: rw for t, (_, rw) in top_terms}
        for t in qtoks.get(qid, []):
            if t in bmap or t not in dfs:
                continue
            rw = rsj_weight(dfs[t], df_rel.get(t, 0), n_docs, r)
            if rw > 0:
                bmap[t] = rw
        if bmap:
            boosts[qid] = bmap
    return boosts


def search_bm25prf(
    index: InvertedIndex,
    queries: Dict[int, str],
    params: BM25Params,
    fb_docs: int = 10,
    fb_terms: int = 20,
) -> Tuple[DataFrame, Dict[int, Dict[str, float]]]:
    first = search_kernel(index, queries, params)
    boosts = bm25prf_boosts(index, queries, first, fb_docs, fb_terms)
    hits = search_kernel(index, queries, params, boosts=boosts,
                         boosts_are_final=True)
    return hits, boosts
