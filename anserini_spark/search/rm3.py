"""RM3 pseudo-relevance-feedback query expansion
(`rerank/lib/Rm3Reranker.java:49-248`).

Semantics per the reference (SURVEY.md §2.4/§2.11):

1. First-pass BM25 retrieval; take the top ``fb_docs`` documents.
2. Estimate the relevance model from their term vectors
   (`Rm3Reranker.java:127-172`): each feedback doc's vector is first
   hygiene-filtered (``[a-z0-9]+`` of length 2-20 with collection
   df-ratio <= 10%, `Rm3Reranker.java:185-230`), then pruned to its
   own top ``fb_terms`` entries (``docVector.pruneToSize(fbTerms)``,
   `Rm3Reranker.java:138-140`); the doc contributes
   ``(tf_term / L1(pruned vector)) * score(d)`` — docs whose pruned
   L1 norm is <= 0.001 are skipped (`Rm3Reranker.java:152-163`).
3. Prune the summed model to the top ``fb_terms`` terms and
   L1-normalize (`util/FeatureVector.java:43-74`).
4. Interpolate with the L1-normalized original query vector:
   ``alpha * q + (1 - alpha) * rm`` (defaults fb_docs=10, fb_terms=10,
   alpha=0.5 — `SearchArgs.java` RM3 defaults).
5. Re-search with per-term boosts (BoostQuery analogue — the engines'
   ``boosts`` path: weight = boost * idf).

The feedback model is computed driver-side — it touches only
``fb_docs * |queries|`` docvec rows, fetched via one pruned join.
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Dict, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25 import BM25Params
from .searcher import InvertedIndex, search_kernel

_TERM_OK = re.compile(r"^[a-z0-9]+$")


def _feedback_vectors(
    index: InvertedIndex, first_pass: DataFrame, fb_docs: int
) -> Dict[int, list]:
    """qid -> [(score, {term: tf}, doclen)] for its top fb_docs.

    The fb-doc set is tiny (fb_docs x |queries|), so it is collected
    and pushed into the docvec scan as an ``url IN (...)`` filter —
    docvec files are url-sorted within segments, so parquet row-group
    min/max pruning applies (a url-keyed JOIN could not prune)."""
    top = first_pass.filter(F.col("rank") <= fb_docs).select(
        "qid", F.col("docid").alias("url"), "score"
    ).collect()
    by_url: Dict[str, list] = defaultdict(list)
    for r in top:
        by_url[r["url"]].append((int(r["qid"]), float(r["score"])))
    if not by_url:
        return defaultdict(list)
    rows = (
        index.docvec.select("url", "doclen", "terms", "tfs")
        .filter(F.col("url").isin(sorted(by_url)))
        .collect()
    )
    out: Dict[int, list] = defaultdict(list)
    for r in rows:
        tfs = dict(zip(r["terms"], r["tfs"]))
        for qid, score in by_url[r["url"]]:
            out[qid].append((score, tfs, int(r["doclen"])))
    return out


def rm3_boosts(
    index: InvertedIndex,
    queries: Dict[int, str],
    first_pass: DataFrame,
    fb_docs: int = 10,
    fb_terms: int = 10,
    alpha: float = 0.5,
    max_df_ratio: float = 0.1,
) -> Dict[int, Dict[str, float]]:
    """Interpolated query models (qid -> term -> boost)."""
    fb = _feedback_vectors(index, first_pass, fb_docs)
    # collection df for hygiene filter
    cand_terms = {
        t
        for docs in fb.values()
        for _, tfs, _ in docs
        for t in tfs
        if _TERM_OK.match(t) and 2 <= len(t) <= 20
    }
    dfs = index.term_dfs(cand_terms)
    n_docs = max(1, index.stats["num_docs"])

    boosts: Dict[int, Dict[str, float]] = {}
    for qid, qtext in queries.items():
        # original query vector, L1-normalized counts
        qtoks = index.analyze_query(qtext)
        if not qtoks:
            continue
        qvec: Dict[str, float] = defaultdict(float)
        for t in qtoks:
            qvec[t] += 1.0 / len(qtoks)
        # relevance model: per-doc hygiene filter -> pruneToSize ->
        # L1-of-pruned normalization (`Rm3Reranker.java:129-166`)
        rm: Dict[str, float] = defaultdict(float)
        for score, tfs, _doclen in fb.get(qid, []):
            filt = {
                t: float(tf)
                for t, tf in tfs.items()
                if t in dfs and dfs[t] / n_docs <= max_df_ratio
            }
            pruned = dict(
                sorted(filt.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
            )
            norm = sum(pruned.values())
            if norm <= 0.001:  # zero-length feedback doc guard
                continue
            for t, tf in pruned.items():
                rm[t] += (tf / norm) * score
        top = sorted(rm.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
        norm = sum(v for _, v in top)
        interpolated: Dict[str, float] = defaultdict(float)
        for t, w in qvec.items():
            interpolated[t] += alpha * w
        if norm > 0:
            for t, v in top:
                interpolated[t] += (1.0 - alpha) * (v / norm)
        boosts[qid] = dict(interpolated)
    return boosts


def search_rm3(
    index: InvertedIndex,
    queries: Dict[int, str],
    params: BM25Params,
    fb_docs: int = 10,
    fb_terms: int = 10,
    alpha: float = 0.5,
) -> Tuple[DataFrame, Dict[int, Dict[str, float]]]:
    """Full RM3 pipeline: first pass -> expansion -> boosted re-search.
    Returns (hits, boosts) so callers/tests can inspect the model."""
    first = search_kernel(index, queries, params)
    boosts = rm3_boosts(index, queries, first, fb_docs, fb_terms, alpha)
    hits = search_kernel(index, queries, params, boosts=boosts)
    return hits, boosts
