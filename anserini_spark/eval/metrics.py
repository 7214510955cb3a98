"""Rank-effectiveness metrics over (run, qrels) DataFrames — the
evaluation surface of the reference's regression harness
(`src/main/python/msmarco/msmarco_eval.py` MRR@10; trec_eval MAP /
recall via `docs/regressions.md`).

Inputs:
  run   — (qid int, docid string, rank int, score double)
  qrels — (qid int, docid string, grade int); relevant = grade > 0

All metrics macro-average over the qids present in QRELS (trec_eval
convention: judged topics count even when the run returns nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rel(qrels: DataFrame) -> DataFrame:
    return qrels.filter(F.col("grade") > 0).select("qid", "docid").distinct()


def mrr_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> float:
    rel = _rel(qrels)
    first_hit = (
        run.filter(F.col("rank") <= k)
        .join(rel, ["qid", "docid"])
        .groupBy("qid")
        .agg(F.min("rank").alias("r"))
        .select("qid", (F.lit(1.0) / F.col("r")).alias("rr"))
    )
    n_topics = rel.select("qid").distinct().count()
    if n_topics == 0:
        return 0.0
    s = first_hit.agg(F.sum("rr")).collect()[0][0] or 0.0
    return float(s) / n_topics


def average_precision(run: DataFrame, qrels: DataFrame,
                      cutoff: int = 1000) -> DataFrame:
    """Per-qid AP@cutoff as a DataFrame (qid, ap)."""
    rel = _rel(qrels)
    hits = run.filter(F.col("rank") <= cutoff).join(
        rel.withColumn("is_rel", F.lit(1)), ["qid", "docid"], "inner"
    )
    w = Window.partitionBy("qid").orderBy("rank")
    prec_at_hit = hits.withColumn(
        "hit_idx", F.row_number().over(w)
    ).withColumn("p", F.col("hit_idx").cast("double") / F.col("rank"))
    ap_num = prec_at_hit.groupBy("qid").agg(F.sum("p").alias("sum_p"))
    n_rel = rel.groupBy("qid").agg(F.count("*").alias("n_rel"))
    return (
        n_rel.join(ap_num, "qid", "left")
        .select(
            "qid",
            (F.coalesce(F.col("sum_p"), F.lit(0.0)) / F.col("n_rel")).alias("ap"),
        )
    )


def map_at(run: DataFrame, qrels: DataFrame, cutoff: int = 1000) -> float:
    ap = average_precision(run, qrels, cutoff)
    row = ap.agg(F.avg("ap")).collect()[0][0]
    return float(row or 0.0)


def recall_at_k(run: DataFrame, qrels: DataFrame, k: int = 1000) -> float:
    rel = _rel(qrels)
    found = (
        run.filter(F.col("rank") <= k)
        .join(rel, ["qid", "docid"])
        .groupBy("qid")
        .agg(F.count("*").alias("found"))
    )
    n_rel = rel.groupBy("qid").agg(F.count("*").alias("n_rel"))
    per_q = n_rel.join(found, "qid", "left").select(
        (F.coalesce(F.col("found"), F.lit(0)).cast("double") / F.col("n_rel")
         ).alias("r")
    )
    row = per_q.agg(F.avg("r")).collect()[0][0]
    return float(row or 0.0)


def evaluate(run: DataFrame, qrels: DataFrame) -> dict:
    """The reference's headline triple (BASELINE.md rows)."""
    return {
        "mrr@10": round(mrr_at_k(run, qrels, 10), 4),
        "map": round(map_at(run, qrels, 1000), 4),
        "recall@1000": round(recall_at_k(run, qrels, 1000), 4),
    }
