"""Axiomatic semantic-relevance reranker — the reference's ``-axiom``
flag in deterministic mode (`rerank/lib/AxiomReranker.java:83-553`).

Semantics per the reference:

1. Reranking pool: the top ``r`` first-pass docs plus deterministic
   seeded picks from the whole index until the pool holds ``r * n``
   docs (`AxiomReranker.selectDocs:307-351`). Two modes (``pool=``):
   "hash" — the extra picks are the ``xxhash64(url, seed)``-smallest
   urls, a distributed TakeOrdered instead of an all-docids driver
   cache (the Spark-native scale mode); "random" — the reference's
   own protocol: the ascending docid list sampled with a bit-exact
   ``java.util.Random(seed)`` (`util/javarandom.py`), round 6.
2. Pool inverted lists: term -> set(pool docs) from the docvecs,
   keeping only terms matching ``[a-z]{2,}``
   (`AxiomReranker.extractTerms:353-398` noise heuristic).
3. Term scores (`AxiomReranker.computeTermScore:420-516`): for each
   distinct query term qt with df > 0,
   ``idf = ln((1 + docCount) / df)`` — integer division, mirroring the
   reference's long/long arithmetic — and every pool term t scores
   ``idf * qtf`` when t == qt else
   ``idf * beta * qtf * MI(qt, t) / MI(qt, qt)`` over the pool's
   four-cell mutual information (`computeMutualInformation:518-545`).
   Scores <= 1e-8 are dropped; per-query-term rankings break score
   ties by case-insensitive term order; summed across query terms,
   divided by the query length, top ``m`` kept.
4. Re-search with the expanded weighted query (BoostQuery SHOULD
   analogue -> the kernel's ``boosts`` path, weight = boost * idf).

The pool is r*n docs per query (tiny), so steps 2-3 run driver-side
on one IN-pruned docvec scan — the same bounded-feedback design as
RM3 (`rm3.py`); nothing here scales with the corpus.
"""

from __future__ import annotations

import math
import re
from collections import defaultdict
from typing import Dict, List, Set, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25 import BM25Params
from .searcher import InvertedIndex, search_kernel

_TERM_OK = re.compile(r"^[a-z]+$")
AXIOM_K = 1000  # top similar terms per query term (reference K)


def _mutual_information(x: Set[str], y: Set[str], total: int) -> float:
    """Four-cell MI over pool-doc occurrence sets
    (`AxiomReranker.computeMutualInformation:518-545`)."""
    x1, y1 = len(x), len(y)
    x0, y0 = total - x1, total - y1
    if x1 == 0 or x0 == 0 or y1 == 0 or y0 == 0:
        return 0.0
    p_x0, p_x1 = x0 / total, x1 / total
    p_y0, p_y1 = y0 / total, y1 / total
    n11 = len(x & y)
    n10, n01 = x1 - n11, y1 - n11
    n00 = total - n11 - n10 - n01
    mi = 0.0
    for n, px, py in ((n00, p_x0, p_y0), (n01, p_x0, p_y1),
                      (n10, p_x1, p_y0), (n11, p_x1, p_y1)):
        p = n / total
        if p != 0:
            mi += p * math.log(p / (px * py))
    return mi


def _select_pool(index: InvertedIndex, first_pass: DataFrame,
                 qids: List[int], r: int, n: int, seed: int,
                 pool: str = "hash") -> Dict[int, List[str]]:
    """qid -> pool urls: top-r first-pass docs + deterministic extra
    picks from the whole index up to r*n.

    ``pool="hash"`` (default, the gate-pinned mode): extras are the
    xxhash64(url, seed)-smallest urls — one distributed TakeOrdered
    serves every query, nothing corpus-sized reaches the driver.

    ``pool="random"``: the reference's seeded mode
    (`AxiomReranker.java:326-338`): the docid list sorted ascending
    (BREAK_SCORE_TIES_BY_DOCID order) is sampled with a FRESH
    ``java.util.Random(seed)`` per query — bit-exact LCG in
    `util/javarandom.py` — drawing until the pool reaches r*n
    (collisions with already-present docs consume a draw, exactly the
    reference's Set.add loop). Like the reference's
    internalDocidsCache this materializes every docid driver-side;
    it is the fidelity mode, not the scale mode."""
    top = first_pass.filter(F.col("rank") <= r).select(
        "qid", "rank", F.col("docid").alias("url")).collect()
    pools: Dict[int, List[str]] = defaultdict(list)
    for row in sorted(top, key=lambda t: (t["qid"], t["rank"])):
        pools[row["qid"]].append(row["url"])
    target = r * n
    if n > 1 and pool == "random":
        from ..util.javarandom import JavaRandom

        all_urls = [row["url"] for row in
                    index.live_docvec.select("url").orderBy("url")
                    .collect()]
        for qid in qids:
            rng = JavaRandom(seed)
            have = set(pools[qid])
            while len(have) < min(target, len(all_urls)):
                url = all_urls[rng.next_int(len(all_urls))]
                if url not in have:
                    have.add(url)
                    pools[qid].append(url)
    elif n > 1:
        # one distributed TakeOrdered serves every query's extra picks
        # (the reference reuses one seeded stream per query too)
        extras = [
            row["url"]
            for row in index.live_docvec.select("url")
            .orderBy(F.xxhash64(F.col("url"), F.lit(seed)), F.col("url"))
            .limit(target + r).collect()
        ]
        for qid in qids:
            have = set(pools[qid])
            for url in extras:
                if len(have) >= target:
                    break
                if url not in have:
                    have.add(url)
                    pools[qid].append(url)
    return pools


def axiom_boosts(
    index: InvertedIndex,
    queries: Dict[int, str],
    first_pass: DataFrame,
    r: int = 20,
    n: int = 2,
    beta: float = 0.4,
    m: int = 20,
    seed: int = 42,
    pool: str = "hash",
) -> Dict[int, Dict[str, float]]:
    """Expanded weighted queries (qid -> term -> weight), reference
    defaults r=20 n=2 beta=0.4 top=20 seed=42 (`SearchArgs.java`
    axiom block). ``pool`` picks the extra-doc selection: "hash"
    (scale mode) or "random" (the reference's java.util.Random seeded
    mode, see ``_select_pool``)."""
    qids = sorted(queries)
    pools = _select_pool(index, first_pass, qids, r, n, seed, pool=pool)
    all_urls = sorted({u for p in pools.values() for u in p})
    if not all_urls:
        return {}
    # one IN-pruned docvec scan fetches every pool vector
    rows = (
        index.docvec.select("url", "terms")
        .filter(F.col("url").isin(all_urls))
        .collect()
    )
    vec_of: Dict[str, List[str]] = {r_["url"]: list(r_["terms"]) for r_ in rows}

    doc_count = int(index.stats["doc_count"])
    qterms_all = {
        qid: index.analyze_query(text) for qid, text in queries.items()
    }
    dfs = index.term_dfs(
        {t for toks in qterms_all.values() for t in toks}
    )

    boosts: Dict[int, Dict[str, float]] = {}
    for qid in qids:
        qtoks = qterms_all.get(qid) or []
        if not qtoks:
            continue
        # pool inverted lists with the reference's noise filter
        inv: Dict[str, Set[str]] = defaultdict(set)
        for url in pools.get(qid, []):
            for t in vec_of.get(url, []):
                if len(t) >= 2 and _TERM_OK.match(t):
                    inv[t].add(url)
        if not inv:
            continue
        pool_doc_cnt = len({u for s in inv.values() for u in s})
        qcounts: Dict[str, int] = defaultdict(int)
        for t in qtoks:
            qcounts[t] += 1

        agg: Dict[str, float] = defaultdict(float)
        for qt, qtf in qcounts.items():
            df = dfs.get(qt, 0)
            if df == 0 or qt not in inv:
                continue
            # reference long/long arithmetic: integer division inside
            # the log (AxiomReranker.java:470)
            idf = math.log((1 + doc_count) // df)
            self_mi = _mutual_information(inv[qt], inv[qt], pool_doc_cnt)
            scored: List[Tuple[str, float]] = []
            for t, docs_t in inv.items():
                if t == qt:
                    score = idf * qtf
                else:
                    cross = _mutual_information(inv[qt], docs_t,
                                                pool_doc_cnt)
                    score = (idf * beta * qtf * cross / self_mi
                             if self_mi != 0 else 0.0)
                scored.append((t, score))
            scored.sort(key=lambda kv: (-kv[1], kv[0].lower()))
            for t, score in scored[: max(m, AXIOM_K)]:
                if score > 1e-8:
                    agg[t] += score
        if not agg:
            continue
        ranked = sorted(
            ((t, s / len(qtoks)) for t, s in agg.items()),
            key=lambda kv: (-kv[1], kv[0].lower()),
        )
        boosts[qid] = dict(ranked[:m])
    return boosts


def search_axiom(
    index: InvertedIndex,
    queries: Dict[int, str],
    params: BM25Params,
    r: int = 20,
    n: int = 2,
    beta: float = 0.4,
    m: int = 20,
    seed: int = 42,
    pool: str = "hash",
) -> Tuple[DataFrame, Dict[int, Dict[str, float]]]:
    """Full axiomatic cascade: first pass -> deterministic pool ->
    MI expansion -> boosted re-search. Returns (hits, boosts)."""
    first = search_kernel(index, queries, params)
    boosts = axiom_boosts(index, queries, first, r=r, n=n, beta=beta,
                          m=m, seed=seed, pool=pool)
    # queries with no usable expansion fall back to the original text
    hits = search_kernel(index, queries, params, boosts=boosts or None)
    return hits, boosts
