"""Metric math pinned on a hand-computed mini case."""

import pytest

from anserini_spark.eval.metrics import evaluate, map_at, mrr_at_k, recall_at_k


@pytest.fixture(scope="module")
def case(spark):
    # q1: rel docs {a, c}; run ranks a=1, b=2, c=3  -> AP=(1/1+2/3)/2=0.8333
    #     first rel rank 1 -> RR=1.0 ; recall 2/2
    # q2: rel docs {x, y}; run ranks z=1, x=2       -> AP=(1/2)/2=0.25
    #     RR=0.5 ; recall 1/2
    # q3: rel {m}; run has nothing relevant          -> AP=0, RR=0, recall 0
    run = spark.createDataFrame(
        [
            (1, "a", 1, 9.0), (1, "b", 2, 8.0), (1, "c", 3, 7.0),
            (2, "z", 1, 9.0), (2, "x", 2, 8.0),
            (3, "q", 1, 9.0),
        ],
        "qid int, docid string, rank int, score double",
    )
    qrels = spark.createDataFrame(
        [
            (1, "a", 1), (1, "c", 2), (2, "x", 1), (2, "y", 1), (3, "m", 1),
            (1, "b", 0),  # judged non-relevant: must not count
        ],
        "qid int, docid string, grade int",
    )
    return run, qrels


def test_mrr(spark, case):
    run, qrels = case
    assert abs(mrr_at_k(run, qrels, 10) - (1.0 + 0.5 + 0.0) / 3) < 1e-9


def test_map(spark, case):
    run, qrels = case
    want = ((1 / 1 + 2 / 3) / 2 + 0.25 + 0.0) / 3
    assert abs(map_at(run, qrels) - want) < 1e-9


def test_recall(spark, case):
    run, qrels = case
    assert abs(recall_at_k(run, qrels) - (1.0 + 0.5 + 0.0) / 3) < 1e-9


def test_evaluate_bundle(spark, case):
    run, qrels = case
    m = evaluate(run, qrels)
    assert set(m) == {"mrr@10", "map", "recall@1000"}
    assert m["mrr@10"] == 0.5
