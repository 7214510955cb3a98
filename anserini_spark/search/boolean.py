"""Boolean query composition over posting sets (SURVEY.md §2.6).

Reference semantics (`BooleanQuery.Builder` usage,
`BagOfWordsQueryGenerator.java:37-41`, `SearchCollection.java:509-515,
578-582`):

* SHOULD    — union with score sum (the default bag-of-words path)
* MUST      — intersection; MUST clauses also contribute score
* MUST_NOT  — exclusion; contributes no score
* FILTER    — intersection without scoring

Spark mapping: one broadcast join of clause terms against the flat
postings (decoded from the term-pruned block scan — O(matching
postings), never an explode of the whole docvec), then a conditional
aggregate per (qid, doc): score sums SHOULD+MUST contributions,
HAVING counts enforce matched-MUST == |MUST|, matched-FILTER ==
|FILTER|, matched-MUST_NOT == 0 — set algebra as groupBy, no joins
per clause.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bm25 import BM25Params, BM25Scorer
from .searcher import InvertedIndex
from .tieadjust import adjust_score_ties

CLAUSES = ("should", "must", "must_not", "filter")


def search_boolean(
    index: InvertedIndex,
    queries: Dict[int, Dict[str, List[str]]],
    params: BM25Params,
) -> DataFrame:
    """queries: qid -> {"should": [...], "must": [...],
    "must_not": [...], "filter": [...]} of RAW terms (each clause list
    is analyzed with the index's analyzer)."""
    scorer = BM25Scorer(index.stats["doc_count"], index.stats["avgdl"], params)
    analyzed: Dict[int, Dict[str, List[str]]] = {}
    all_terms = set()
    for qid, clauses in queries.items():
        a = {
            c: [t for raw in clauses.get(c, []) for t in index.analyze_query(raw)]
            for c in CLAUSES
        }
        analyzed[qid] = a
        for ts in a.values():
            all_terms.update(ts)
    dfs = index.term_dfs(all_terms)

    rows = []
    must_counts = []
    for qid, a in analyzed.items():
        n_must = len(set(t for t in a["must"] if t in dfs))
        n_filter = len(set(t for t in a["filter"] if t in dfs))
        # a MUST term with no postings can never match -> empty result;
        # encode as an impossible requirement
        if len(set(a["must"])) != n_must or len(set(a["filter"])) != n_filter:
            n_must = 10**6
        # Lucene BooleanQuery: SHOULD clauses are required (min 1) only
        # when the query has no MUST/FILTER clause; with MUST/FILTER
        # present, a doc matching only filters matches with score 0
        req_should = 1 if (n_must == 0 and n_filter == 0) else 0
        must_counts.append((qid, n_must, n_filter, req_should))
        for c in CLAUSES:
            scored = c in ("should", "must")
            for t in set(a[c]):
                if t not in dfs:
                    continue
                w = float(np.float32(scorer.weight(dfs[t]))) if scored else 0.0
                rows.append((qid, t, c, w))
    if not rows:
        return index.spark.createDataFrame(
            [], "qid int, docid string, rank int, score double"
        )
    spark = index.spark
    qterms = spark.createDataFrame(
        rows, "qid int, term string, clause string, weight float"
    )
    req = spark.createDataFrame(
        must_counts, "qid int, n_must int, n_filter int, req_should int"
    )
    from .searcher import postings_from_blocks

    postings = postings_from_blocks(
        index, sorted({t for _, t, _, _ in rows})
    )
    tf = F.col("tf").cast("float")
    dl = F.col("doclen").cast("float")
    contrib = (
        F.col("weight") * tf
        / (tf + F.lit(float(scorer.cache1)).cast("float")
           + F.lit(float(scorer.cache2)).cast("float") * dl)
    )
    agg = (
        postings.join(F.broadcast(qterms), "term")
        .withColumn("contrib", contrib.cast("float"))
        .groupBy("qid", "doc_id")
        .agg(
            F.sum(
                F.when(F.col("clause").isin("should", "must"),
                       F.col("contrib").cast("double")).otherwise(0.0)
            ).alias("score64"),
            F.count(F.when(F.col("clause") == "must", 1)).alias("m"),
            F.count(F.when(F.col("clause") == "filter", 1)).alias("f"),
            F.count(F.when(F.col("clause") == "must_not", 1)).alias("mn"),
        )
    )
    hits = (
        agg.join(F.broadcast(req), "qid")
        .filter(
            (F.col("m") == F.col("n_must"))
            & (F.col("f") == F.col("n_filter"))
            & (F.col("mn") == 0)
            & ((F.col("req_should") == 0) | (F.col("score64") > 0))
        )
        .withColumn("score", F.col("score64").cast("float"))
    )
    docmap = index.docmap.select("doc_id", "url")
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("url"))
    ranked = (
        hits.join(docmap, "doc_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= params.k)
        .select("qid", F.col("url").alias("docid"), "rank", "score")
    )
    return adjust_score_ties(ranked).orderBy("qid", "rank")
