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


def precision_at_k(run: DataFrame, qrels: DataFrame, k: int = 30) -> float:
    """trec_eval ``P.k``: (#relevant in top k) / k, macro-averaged over
    judged topics (the reference's regression YAMLs pin ``p30``)."""
    rel = _rel(qrels)
    n_topics = rel.select("qid").distinct().count()
    if n_topics == 0:
        return 0.0
    found = (
        run.filter(F.col("rank") <= k)
        .join(rel, ["qid", "docid"])
        .count()
    )
    return float(found) / (k * n_topics)


def ndcg_at_k(run: DataFrame, qrels: DataFrame, k: int = 20) -> float:
    """trec_eval ``ndcg_cut.k``: linear gain (the raw grade), log2(rank+1)
    discount, ideal DCG from the topic's grades sorted descending and cut
    at k; macro-averaged over topics with at least one positive grade
    (the reference pins ``ndcg20`` for its graded web collections)."""
    # one row per (qid, docid): a duplicated qrels line must not
    # double-count its gain in DCG or emit two IDCG rows (same hygiene
    # as _rel()'s distinct); max(grade) wins on conflicting duplicates
    graded = (
        qrels.filter(F.col("grade") > 0)
        .groupBy("qid", "docid")
        .agg(F.max("grade").alias("grade"))
    )
    # DCG@k from the run's ranks
    dcg = (
        run.filter(F.col("rank") <= k)
        .join(graded, ["qid", "docid"])
        .groupBy("qid")
        .agg(F.sum(
            F.col("grade").cast("double") / F.log2(F.col("rank") + 1.0)
        ).alias("dcg"))
    )
    # IDCG@k: grades sorted descending per topic (docid tiebreak for
    # determinism — grade order alone fixes the value)
    w = Window.partitionBy("qid").orderBy(F.desc("grade"), F.asc("docid"))
    idcg = (
        graded.withColumn("i", F.row_number().over(w))
        .filter(F.col("i") <= k)
        .groupBy("qid")
        .agg(F.sum(
            F.col("grade").cast("double") / F.log2(F.col("i") + 1.0)
        ).alias("idcg"))
    )
    per_q = idcg.join(dcg, "qid", "left").select(
        (F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")).alias("ndcg")
    )
    row = per_q.agg(F.avg("ndcg")).collect()[0][0]
    return float(row or 0.0)


def _graded_dedup(qrels: DataFrame) -> DataFrame:
    return (
        qrels.filter(F.col("grade") > 0)
        .groupBy("qid", "docid")
        .agg(F.max("grade").alias("grade"))
    )


def gd_ndcg_at_k(run: DataFrame, qrels: DataFrame, k: int = 20) -> float:
    """gdeval ndcg@k (`eval/gdeval.pl` dcg sub — the reference's web
    track contract, `regression/cw09b.yaml` ndcg20): EXPONENTIAL gain
    ``2^grade - 1`` (trec_eval's ndcg_cut uses the raw grade),
    ``log2(rank+1)`` discount, ideal DCG from the topic's grades
    sorted descending cut at k; macro-averaged over topics present in
    BOTH the run and the positive qrels (gdeval default, no ``-c``)."""
    graded = _graded_dedup(qrels)
    gain = F.pow(F.lit(2.0), F.col("grade").cast("double")) - F.lit(1.0)
    dcg = (
        run.filter(F.col("rank") <= k)
        .join(graded, ["qid", "docid"])
        .groupBy("qid")
        .agg(F.sum(gain / F.log2(F.col("rank") + 1.0)).alias("dcg"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("grade"), F.asc("docid"))
    idcg = (
        graded.withColumn("i", F.row_number().over(w))
        .filter(F.col("i") <= k)
        .groupBy("qid")
        .agg(F.sum(gain / F.log2(F.col("i") + 1.0)).alias("idcg"))
    )
    topics = run.select("qid").distinct().join(idcg, "qid")
    per_q = topics.join(dcg, "qid", "left").select(
        (F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")).alias("ndcg")
    )
    row = per_q.agg(F.avg("ndcg")).collect()[0][0]
    return float(row or 0.0)


def err_at_k(run: DataFrame, qrels: DataFrame, k: int = 20,
             max_grade: int = 4) -> float:
    """gdeval err@k (`eval/gdeval.pl` err sub): per rank i (1-based),
    ``r_i = (2^g_i - 1) / 2^MAX_JUDGMENT`` (MAX_JUDGMENT = 4, a
    constant of the script, NOT the data maximum), then the cascade
    ``sum_i r_i / i * prod_{j<i} (1 - r_j)``. Declarative: the decay
    product is ``exp(sum(ln(1 - r)))`` over the preceding-rows window
    (r <= 15/16 < 1, so the log is finite). Averaged over run∩qrels
    topics like gd_ndcg_at_k."""
    graded = _graded_dedup(qrels)
    hits = (
        run.filter(F.col("rank") <= k)
        .join(graded, ["qid", "docid"], "left")
        .withColumn(
            "r",
            (F.pow(F.lit(2.0),
                   F.coalesce(F.col("grade"), F.lit(0)).cast("double"))
             - F.lit(1.0)) / F.lit(float(2 ** max_grade)),
        )
    )
    w = (Window.partitionBy("qid").orderBy("rank")
         .rowsBetween(Window.unboundedPreceding, -1))
    decay = F.exp(F.coalesce(
        F.sum(F.log(F.lit(1.0) - F.col("r"))).over(w), F.lit(0.0)))
    per_q = (
        hits.withColumn("c", F.col("r") * decay / F.col("rank"))
        .groupBy("qid")
        .agg(F.sum("c").alias("err"))
    )
    topics = run.select("qid").distinct().join(
        graded.select("qid").distinct(), "qid")
    row = (topics.join(per_q, "qid", "left")
           .select(F.coalesce(F.col("err"), F.lit(0.0)).alias("err"))
           .agg(F.avg("err")).collect()[0][0])
    return float(row or 0.0)


def evaluate(run: DataFrame, qrels: DataFrame) -> dict:
    """The reference's headline triple (BASELINE.md rows)."""
    return {
        "mrr@10": round(mrr_at_k(run, qrels, 10), 4),
        "map": round(map_at(run, qrels, 1000), 4),
        "recall@1000": round(recall_at_k(run, qrels, 1000), 4),
        "p@30": round(precision_at_k(run, qrels, 30), 4),
        "ndcg@20": round(ndcg_at_k(run, qrels, 20), 4),
        # gdeval pair — the web-track regression contract
        # (`regression/cw09b.yaml:54-64` runs eval/gdeval.pl)
        "gd_ndcg@20": round(gd_ndcg_at_k(run, qrels, 20), 4),
        "err@20": round(err_at_k(run, qrels, 20), 4),
    }
