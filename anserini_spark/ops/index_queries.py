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
from .corpus_queries import (
    FIXED_QUERIES,
    TOPK,
    _bm25_oracle,
    _TOK_CTE,
    _values_clause,
)

K1 = 0.9
B = 0.4
MU = 1000.0


def _gate_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (or reuse — fingerprint-keyed dir + resumable manifest)
    a ws-analyzer block index over the sf documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = docs.agg(
        F.count("*").alias("n"),
        F.max("doc_id").alias("m"),
        # content digest: edited text with unchanged count/ids must not
        # reuse a stale cached index (order-independent xor of row hashes;
        # xor, not sum — sum of 64-bit hashes overflows under ANSI mode)
        F.bit_xor(F.xxhash64("doc_id", "text")).alias("h"),
    ).collect()[0]
    tag = (f"{os.path.basename(os.path.normpath(sf_dir))}"
           f"_{fp['n']}_{fp['m']}_{(fp['h'] or 0) & 0xFFFFFFFFFFFF:x}")
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


def _fixed_queries() -> dict[int, str]:
    queries: dict[int, str] = {}
    for qid, term in FIXED_QUERIES:
        queries[qid] = (queries.get(qid, "") + " " + term).strip()
    return queries


def _index_topk(spark: SparkSession, sf_dir: str, sim: str,
                **params) -> DataFrame:
    idx = InvertedIndex(spark, _gate_index(spark, sf_dir))
    hits = search_kernel_similarity(idx, _fixed_queries(), sim, k=TOPK,
                                    **params)
    return hits.select(
        "qid",
        F.col("docid").cast("long").alias("doc_id"),
        "rank",
        "score",
    ).orderBy("qid", "rank")


def bm25_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-query BM25 top-10 answered through the block index +
    MaxScore kernel; (qid, doc_id, rank, score) with tie-adjusted
    4-decimal scores."""
    return _index_topk(spark, sf_dir, "bm25", k1=K1, b=B)


def qld_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-query QLD (Dirichlet mu=1000, per-term clamp at 0 —
    Lucene LMDirichletSimilarity semantics) through the same block
    index + MaxScore kernel."""
    return _index_topk(spark, sf_dir, "qld", mu=MU)


def _with_tie_adjust(base_sql: str) -> str:
    """Wrap a (qid, doc_id, rank, score-rounded-4) query with the
    ScoreTiesAdjuster transform (subtract 1e-6 per preceding row in a
    run of equal rounded scores)."""
    return f"""
WITH base AS (
{base_sql.strip()}
)
SELECT qid, doc_id, rank,
       score - 1e-6 * (row_number() OVER (
           PARTITION BY qid, score ORDER BY rank) - 1) AS score
FROM base
"""


def _qld_oracle(mu: float) -> str:
    return f"""
WITH {_TOK_CTE},
q(qid, term) AS (VALUES {_values_clause()}),
stats AS (SELECT CAST(sum(doclen) AS DOUBLE) AS sum_tf FROM dl),
cf AS (
  SELECT term, CAST(sum(tf) AS DOUBLE) AS cf FROM tf
  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term
),
scored AS (
  SELECT q.qid, tf.doc_id,
         sum(greatest(0.0,
           ln(1.0 + CAST(tf.tf AS DOUBLE) / ({mu!r} * ((c.cf + 1.0) / (s.sum_tf + 1.0))))
           + ln({mu!r} / (CAST(dl.doclen AS DOUBLE) + {mu!r}))
         )) AS score
  FROM q
  JOIN cf c ON q.term = c.term
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, tf.doc_id
)
SELECT qid, doc_id, rank, round(score, 4) AS score
FROM (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank,
         score
  FROM scored
)
WHERE rank <= {TOPK}
"""


def oracle_sqls() -> dict[str, str]:
    # the corpus oracles, plus the ScoreTiesAdjuster transform the
    # engine applies (round 4, perturb duplicate runs by 1e-6*i)
    return {
        "bm25_index_topk": _with_tie_adjust(_bm25_oracle(K1, B)),
        "qld_index_topk": _with_tie_adjust(_qld_oracle(MU)),
    }
