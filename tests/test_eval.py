"""Metric math pinned on a hand-computed mini case."""

import pytest

from anserini_spark.eval.metrics import (
    err_at_k,
    gd_ndcg_at_k,
    evaluate,
    map_at,
    mrr_at_k,
    ndcg_at_k,
    precision_at_k,
    recall_at_k,
)


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


def test_precision(spark, case):
    # q1: 2 rel in top30 ; q2: 1 ; q3: 0  -> P@30 = (2/30 + 1/30 + 0)/3
    run, qrels = case
    assert abs(precision_at_k(run, qrels, 30) - (3 / 30) / 3) < 1e-9
    # at k=2: q1 top-2 = {a,b} -> 1 rel ; q2 top-2 = {z,x} -> 1 rel
    assert abs(precision_at_k(run, qrels, 2) - (0.5 + 0.5 + 0.0) / 3) < 1e-9


def test_ndcg(spark, case):
    # hand-computed (trec_eval ndcg_cut: linear gain, log2(rank+1)):
    # q1 run a(g1)@1, c(g2)@3: DCG = 1/log2(2) + 2/log2(4) = 2.0
    #    ideal grades [2,1]:   IDCG = 2/log2(2) + 1/log2(3)
    # q2 run x(g1)@2:          DCG = 1/log2(3)
    #    ideal grades [1,1]:   IDCG = 1/log2(2) + 1/log2(3)
    # q3: DCG 0
    import math

    run, qrels = case
    l3 = math.log2(3)
    want = (2.0 / (2.0 + 1.0 / l3) + (1.0 / l3) / (1.0 + 1.0 / l3) + 0.0) / 3
    assert abs(ndcg_at_k(run, qrels, 20) - want) < 1e-9
    # cutoff below a hit drops it: at k=2, q1 loses doc c from DCG but
    # the ideal is also cut at 2 (grades [2,1] both stay)
    want1 = (1.0 / (2.0 + 1.0 / l3) + (1.0 / l3) / (1.0 + 1.0 / l3)) / 3
    assert abs(ndcg_at_k(run, qrels, 2) - want1) < 1e-9


def test_evaluate_bundle(spark, case):
    run, qrels = case
    m = evaluate(run, qrels)
    assert set(m) == {"mrr@10", "map", "recall@1000", "p@30", "ndcg@20",
                      "gd_ndcg@20", "err@20"}
    assert m["mrr@10"] == 0.5


def test_ndcg_duplicate_qrels_rows(spark):
    """A duplicated (qid, docid) qrels line must not double-count DCG
    gain or emit two IDCG rows (same hygiene as _rel's distinct)."""
    run = spark.createDataFrame(
        [(1, "a", 1, 9.0), (1, "b", 2, 8.0)],
        "qid int, docid string, rank int, score double",
    )
    clean = spark.createDataFrame(
        [(1, "a", 2), (1, "b", 1)], "qid int, docid string, grade int")
    dup = spark.createDataFrame(
        [(1, "a", 2), (1, "a", 2), (1, "b", 1), (1, "a", 1)],
        "qid int, docid string, grade int")  # dup rows + a lower-grade dup
    assert ndcg_at_k(run, dup, 20) == pytest.approx(
        ndcg_at_k(run, clean, 20))


def test_gdeval_ndcg_exponential_gain(spark, case):
    """gdeval ndcg@20 golden, hand-computed on the fixture:
    q1 gains (2^g - 1): a(g=1)->1 @r1, c(g=2)->3 @r3;
       DCG = 1/log2(2) + 3/log2(4) = 1 + 1.5 = 2.5
       IDCG = 3/log2(2) + 1/log2(3); q2 DCG = 1/log2(3),
       IDCG = 1 + 1/log2(3); q3 in run & qrels but no hit -> 0."""
    import math

    run, qrels = case
    l3 = math.log2(3.0)
    expect = (2.5 / (3.0 + 1.0 / l3)
              + (1.0 / l3) / (1.0 + 1.0 / l3)
              + 0.0) / 3.0
    assert gd_ndcg_at_k(run, qrels, 20) == pytest.approx(expect, abs=1e-12)


def test_gdeval_err(spark, case):
    """gdeval err@20 golden (MAX_JUDGMENT=4 -> r = (2^g - 1)/16):
    q1: r=[1/16, 0, 3/16] -> 1/16 + (3/16)(15/16)/3 = 0.12109375
    q2: r=[0, 1/16]      -> (1/16)/2 = 0.03125 ; q3 -> 0."""
    run, qrels = case
    expect = (0.0625 + (3.0 / 16) * (15.0 / 16) / 3 + 0.03125 + 0.0) / 3.0
    assert err_at_k(run, qrels, 20) == pytest.approx(expect, abs=1e-12)
    assert expect == pytest.approx(0.05078125)


def test_gdeval_sequential_reference(spark, case):
    """Cross-check the declarative window implementation against a
    literal sequential transcription of gdeval.pl's err/dcg loops."""
    import math

    run, qrels = case
    rel = {}
    for r in qrels.collect():
        if r["grade"] > 0:
            rel[(r["qid"], r["docid"])] = max(
                r["grade"], rel.get((r["qid"], r["docid"]), 0))
    by_q = {}
    for r in run.collect():
        by_q.setdefault(r["qid"], []).append((r["rank"], r["docid"]))
    qrels_topics = {q for q, _ in rel}
    errs, ndcgs = [], []
    for q in sorted(set(by_q) & qrels_topics):
        ranked = [g for _, d in sorted(by_q[q])
                  for g in [rel.get((q, d), 0)]]
        err, decay = 0.0, 1.0
        dcg = 0.0
        for i, g in enumerate(ranked[:20]):
            r_i = (2 ** g - 1) / 2 ** 4
            err += r_i * decay / (i + 1)
            decay *= 1 - r_i
            dcg += (2 ** g - 1) / math.log2(i + 2)
        ideal = sorted((g for (qq, _), g in rel.items() if qq == q),
                       reverse=True)
        idcg = sum((2 ** g - 1) / math.log2(i + 2)
                   for i, g in enumerate(ideal[:20]))
        errs.append(err)
        ndcgs.append(dcg / idcg if idcg else 0.0)
    assert err_at_k(run, qrels, 20) == pytest.approx(
        sum(errs) / len(errs), abs=1e-12)
    assert gd_ndcg_at_k(run, qrels, 20) == pytest.approx(
        sum(ndcgs) / len(ndcgs), abs=1e-12)
