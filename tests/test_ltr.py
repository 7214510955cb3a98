"""LTR feature extraction (`ops/ltr.py`) — hand-checked semantics on
a tiny corpus; the full formula surface is externally verified by the
`ltr_features` DuckDB gate."""

import math
import os

import pytest


@pytest.fixture(scope="module")
def tiny_sf(spark, tmp_path_factory):
    """documents.parquet with a 3-doc hand-checkable corpus using the
    fixed-query vocabulary."""
    d = tmp_path_factory.mktemp("ltr_sf")
    rows = [
        (0, "spark join spark", "en", "s", 16),
        (1, "join window", "en", "s", 11),
        (2, "table table table", "en", "s", 17),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_ltr_feature_semantics(spark, tiny_sf):
    from anserini_spark.ops.ltr import ltr_features

    feats = {(r["qid"], r["doc_id"]): r.asDict()
             for r in ltr_features(spark, tiny_sf).collect()}

    # qid 1 = "spark join": doc 0 matches both terms, doc 1 only join
    f = feats[(1, 0)]
    assert f["f_matching_terms"] == 2.0
    assert f["f_doc_len"] == 3.0
    assert f["f_sum_matching_tf"] == 3.0  # spark x2 + join x1
    assert f["f_query_len"] == 2.0 and f["f_query_uniq"] == 2.0
    f10 = feats[(1, 1)]
    assert f10["f_matching_terms"] == 1.0
    assert f10["f_sum_matching_tf"] == 1.0

    # avg_idf for qid 1: N=3, df(spark)=1, df(join)=2
    exp = (math.log(3 / 1) + math.log(3 / 2)) / 2
    assert f["f_avg_idf"] == round(exp, 4)
    # avg_ictf: C=8 tokens, cf(spark)=2, cf(join)=2
    exp = (math.log2(8 / 2) + math.log2(8 / 2)) / 2
    assert f["f_avg_ictf"] == round(exp, 4)
    # scs: p(t|q)=1/2 each, p(t|C)=2/8
    exp = 2 * (0.5 * math.log2(0.5 / (2 / 8)))
    assert f["f_scs"] == round(exp, 4)

    # query-level features identical across docs of the same query
    assert f["f_scq_avg"] == f10["f_scq_avg"]
    assert f["f_scq_max"] >= f["f_scq_avg"]

    # unmatched (query, doc) pairs are absent (doc 2 matches no
    # qid-1 term)
    assert (1, 2) not in feats

    # qid 8 = "slow query table": doc 2 matches only 'table'
    f82 = feats[(8, 2)]
    assert f82["f_matching_terms"] == 1.0
    assert f82["f_sum_matching_tf"] == 3.0
    assert f82["f_query_len"] == 3.0


def test_ltr_plan_broadcasts_dimensions(spark, tiny_sf):
    """The per-pair join must broadcast the tiny query/stat sides —
    the only shuffle at scale is the (qid, doc_id) groupBy."""
    from anserini_spark.ops.ltr import ltr_features

    plan = ltr_features(spark, tiny_sf)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_ltr_window_features(spark, tiny_sf):
    """Ordered/unordered window-8 counts over consecutive query-term
    pairs: doc 0 = 'spark join spark' vs qid 1 = 'spark join'."""
    from anserini_spark.ops.ltr import ltr_features

    feats = {(r["qid"], r["doc_id"]): r.asDict()
             for r in ltr_features(spark, tiny_sf).collect()}
    f = feats[(1, 0)]
    # pair (spark, join): spark@0 -> join@1 (Δ=1), spark@2 -> join@1
    # (Δ=-1): ordered counts only Δ in [1,8] = 1; unordered both = 2
    assert f["f_ordered_w8"] == 1.0
    assert f["f_unordered_w8"] == 2.0
    # doc 1 = 'join window' has no (spark, join) pair occurrence
    assert feats[(1, 1)]["f_ordered_w8"] == 0.0
    assert feats[(1, 1)]["f_unordered_w8"] == 0.0
