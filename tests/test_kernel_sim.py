"""Pluggable-similarity kernel engine: rank-identity vs the
declarative DataFrame path for all six similarities, and plan
assertions that the kernel path never scans the full docvec postings
(term-pruned blocks scan only — the round-1 scale defect)."""

import pytest

from anserini_spark.search.qld import search_qld, search_qljm
from anserini_spark.search.searcher import InvertedIndex
from anserini_spark.search.similarities import (
    search_f2exp,
    search_f2log,
    search_inl2,
    search_spl,
)

QUERIES = {1: "spark merge join", 2: "customer value", 3: "the scan"}


def _rows(df):
    return [
        (r["qid"], r["docid"], r["rank"], round(float(r["score"]), 6))
        for r in df.collect()
    ]


@pytest.mark.parametrize("fn,kw", [
    (search_qld, {"mu": 1000.0}),
    (search_qld, {"mu": 250.0}),
    (search_qljm, {"lam": 0.1}),
    (search_inl2, {"c": 1.0}),
    (search_spl, {"c": 1.0}),
    (search_f2exp, {"s": 0.5}),
    (search_f2log, {"s": 0.5}),
])
def test_kernel_matches_dataframe(spark, tiny_index, fn, kw):
    idx = InvertedIndex(spark, tiny_index)
    kern = _rows(fn(idx, QUERIES, k=25, engine="kernel", **kw))
    dfrm = _rows(fn(idx, QUERIES, k=25, engine="dataframe", **kw))
    assert kern == dfrm


def test_kernel_plan_is_term_pruned(spark, tiny_index):
    """The kernel similarity plan must read blocks.parquet with the
    query terms pushed into the scan, and must NOT explode docvec
    postings (no full-corpus scan)."""
    idx = InvertedIndex(spark, tiny_index)
    df = search_qld(idx, {1: "spark merge"}, k=10, engine="kernel")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "blocks" in plan
    assert "Generate explode" not in plan and "arrays_zip" not in plan
    # the dataframe oracle path, by contrast, explodes every posting
    plan_df = (
        search_qld(idx, {1: "spark merge"}, k=10, engine="dataframe")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "explode" in plan_df
