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


def _gate_index(spark: SparkSession, sf_dir: str,
                positions: bool = False) -> str:
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
    from ..index.build import SEG_SHIFT

    tag = (f"{os.path.basename(os.path.normpath(sf_dir))}"
           f"_{fp['n']}_{fp['m']}_{(fp['h'] or 0) & 0xFFFFFFFFFFFF:x}"
           f"_s{SEG_SHIFT}{'_pos' if positions else ''}")
    out_dir = f"/tmp/anserini_gate_idx_{tag}"
    corpus = docs.select(
        F.format_string("%020d", F.col("doc_id")).alias("url"),
        "text",
        F.lit("en").alias("lang"),
    )
    build_index(
        spark, corpus,
        IndexConfig(out_dir=out_dir, analyzer="ws",
                    doc_partitions=8, block_partitions=16,
                    store_positions=positions),
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


def sdm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-query Sequential Dependence Model top-10 through a
    POSITIONAL block index (`-storePositions`) + the per-segment SDM
    window kernel (`search/sdm.py`, `SdmQueryGenerator.java:36-88`
    weights 0.85/0.1/0.05, ordered slop 1 / unordered window 8).
    The DuckDB oracle rebuilds positions with a window function and
    counts the same ordered/unordered position pairs in SQL."""
    from ..search.bm25 import BM25Params
    from ..search.sdm import search_sdm

    idx = InvertedIndex(spark, _gate_index(spark, sf_dir, positions=True))
    hits = search_sdm(idx, _fixed_queries(), BM25Params(k1=K1, b=B, k=TOPK))
    return hits.select(
        "qid",
        F.col("docid").cast("long").alias("doc_id"),
        "rank",
        "score",
    ).orderBy("qid", "rank")


def _pair_values_clause() -> str:
    """Consecutive query-term pairs (qid, pid, term_a, term_b) of the
    fixed ws-analyzed queries."""
    rows = []
    for qid, query in _fixed_queries().items():
        toks = query.split()
        for i in range(len(toks) - 1):
            rows.append(f"({qid}, {i}, '{toks[i]}', '{toks[i + 1]}')")
    return ", ".join(rows)


def _sdm_oracle(k1: float, b: float) -> str:
    """SDM in pure SQL: bag part = Lucene-shape BM25 (no (k1+1)
    numerator); each consecutive pair is a pseudo-term whose tf is the
    ordered (1 <= Δ <= 2) / unordered (Δ != 0, |Δ| <= 8) position-pair
    count, scored with the same tf-part at its exact pair df."""
    c0, cb = k1 * (1 - b), k1 * b
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
),
tokp AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY rawpos) - 1 AS pos
  FROM (
    SELECT doc_id, unnest(str_split(text, ' ')) AS term,
           generate_subscripts(str_split(text, ' '), 1) AS rawpos
    FROM docs
  )
  WHERE term <> ''
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tokp GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS doclen
  FROM tokp GROUP BY doc_id
),
q(qid, term) AS (VALUES {_values_clause()}),
qp(qid, pid, term_a, term_b) AS (VALUES {_pair_values_clause()}),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(doclen) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
dfreq AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS dfreq FROM tf
  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term
),
bag AS (
  SELECT q.qid, tf.doc_id,
         sum(
           ln(1.0 + (s.n - d.dfreq + 0.5) / (d.dfreq + 0.5))
           * CAST(tf.tf AS DOUBLE)
           / (CAST(tf.tf AS DOUBLE) + {c0!r}
              + {cb!r} / s.avgdl * CAST(dl.doclen AS DOUBLE))
         ) AS bag
  FROM q
  JOIN dfreq d ON q.term = d.term
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, tf.doc_id
),
pairj AS (
  SELECT qp.qid, qp.pid, a.doc_id,
         CAST(sum(CASE WHEN b.pos - a.pos BETWEEN 1 AND 2
                       THEN 1 ELSE 0 END) AS DOUBLE) AS o,
         CAST(sum(CASE WHEN b.pos <> a.pos AND abs(b.pos - a.pos) <= 8
                       THEN 1 ELSE 0 END) AS DOUBLE) AS u
  FROM qp
  JOIN tokp a ON a.term = qp.term_a
  JOIN tokp b ON b.term = qp.term_b AND b.doc_id = a.doc_id
  GROUP BY qp.qid, qp.pid, a.doc_id
),
pdf AS (
  SELECT qid, pid,
         CAST(sum(CASE WHEN o > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_o,
         CAST(sum(CASE WHEN u > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_u
  FROM pairj GROUP BY qid, pid
),
pairsc AS (
  SELECT pj.qid, pj.doc_id,
         sum(
           CASE WHEN pj.o > 0 THEN
             0.1 * ln(1.0 + (s.n - pdf.df_o + 0.5) / (pdf.df_o + 0.5))
             * pj.o / (pj.o + {c0!r}
                       + {cb!r} / s.avgdl * CAST(dl.doclen AS DOUBLE))
           ELSE 0.0 END
           + CASE WHEN pj.u > 0 THEN
             0.05 * ln(1.0 + (s.n - pdf.df_u + 0.5) / (pdf.df_u + 0.5))
             * pj.u / (pj.u + {c0!r}
                       + {cb!r} / s.avgdl * CAST(dl.doclen AS DOUBLE))
           ELSE 0.0 END
         ) AS pairs
  FROM pairj pj
  JOIN pdf ON pdf.qid = pj.qid AND pdf.pid = pj.pid
  JOIN dl ON dl.doc_id = pj.doc_id
  CROSS JOIN stats s
  GROUP BY pj.qid, pj.doc_id
),
scored AS (
  SELECT b.qid, b.doc_id,
         0.85 * b.bag + coalesce(p.pairs, 0.0) AS score
  FROM bag b
  LEFT JOIN pairsc p ON p.qid = b.qid AND p.doc_id = b.doc_id
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
        "sdm_topk": _with_tie_adjust(_sdm_oracle(K1, B)),
    }
