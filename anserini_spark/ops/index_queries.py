"""Driver-gate query through the REAL block index.

Unlike `corpus_queries.bm25_topk` (a pure-DataFrame recompute over
``documents.parquet``), ``bm25_index_topk`` builds — or resumes via
the manifest — an actual inverted index (docvec + delta/varint block
postings + dictionary + stats, `index/build.py`) and answers the
fixed query set through the per-segment Arrow kernel with MaxScore
pruning (`search/kernel_sim.py`, float64 BM25 shape). The DuckDB
oracle recomputes the same float64 math, the same (score desc,
doc_id asc) tie-break, and the same ScoreTiesAdjuster rounding
(round to 4 decimals, subtract 1e-6 per preceding duplicate —
`rerank/lib/ScoreTiesAdjusterReranker.java:36-73`), so the external
correctness gate exercises ``blocks.parquet`` + MaxScore end to end.

Whitespace analyzer keeps the oracle SQL-expressible; urls are
zero-padded doc ids so the index's url tie-break equals numeric
doc_id order.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.build import IndexConfig, build_index
from ..search.kernel_sim import search_kernel_similarity
from ..search.searcher import InvertedIndex
from .corpus_queries import FIXED_QUERIES, TOPK, _bm25_oracle

K1 = 0.9
B = 0.4


def _gate_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (or reuse — fingerprint-keyed dir + resumable manifest)
    a ws-analyzer block index over the sf documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = docs.agg(
        F.count("*").alias("n"), F.max("doc_id").alias("m")
    ).collect()[0]
    tag = f"{os.path.basename(os.path.normpath(sf_dir))}_{fp['n']}_{fp['m']}"
    out_dir = f"/tmp/anserini_gate_idx_{tag}"
    corpus = docs.select(
        F.format_string("%020d", F.col("doc_id")).alias("url"),
        "text",
        F.lit("en").alias("lang"),
    )
    build_index(
        spark, corpus,
        IndexConfig(out_dir=out_dir, analyzer="ws",
                    doc_partitions=8, block_partitions=16),
    )
    return out_dir


def bm25_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-query BM25 top-10 answered through the block index +
    MaxScore kernel; (qid, doc_id, rank, score) with tie-adjusted
    4-decimal scores."""
    idx = InvertedIndex(spark, _gate_index(spark, sf_dir))
    queries: dict[int, str] = {}
    for qid, term in FIXED_QUERIES:
        queries[qid] = (queries.get(qid, "") + " " + term).strip()
    hits = search_kernel_similarity(idx, queries, "bm25", k=TOPK,
                                    k1=K1, b=B)
    return hits.select(
        "qid",
        F.col("docid").cast("long").alias("doc_id"),
        "rank",
        "score",
    ).orderBy("qid", "rank")


def oracle_sqls() -> dict[str, str]:
    # the corpus oracle, plus the ScoreTiesAdjuster transform the
    # engine applies (round 4, perturb duplicate runs by 1e-6*i)
    base = _bm25_oracle(K1, B).strip().rstrip()
    return {
        "bm25_index_topk": f"""
WITH base AS (
{base}
)
SELECT qid, doc_id, rank,
       score - 1e-6 * (row_number() OVER (
           PARTITION BY qid, score ORDER BY rank) - 1) AS score
FROM base
""",
    }
