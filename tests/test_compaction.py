"""Tiered compaction (`index/compaction.py`): the policy is pure and
deterministic; executing it over real slices preserves search results
exactly (compaction is an optimization, never a semantic change)."""

import pytest
from pyspark.sql import functions as F

from anserini_spark.corpus.synth import web_corpus
from anserini_spark.index.build import IndexConfig, build_index
from anserini_spark.index.compaction import compact, plan_compaction
from anserini_spark.search.multislice import MultiSliceIndex
from anserini_spark.search.bm25 import BM25Params
from anserini_spark.search.searcher import InvertedIndex, search_kernel

QUERIES = {1: "spark merge join", 2: "customer value"}


def test_plan_noop_when_compact():
    assert plan_compaction([10, 20, 30], max_slices=3) == []
    assert plan_compaction([], max_slices=1) == []


def test_plan_merges_smallest_first():
    # sizes at indices:      0    1   2    3   4
    plan = plan_compaction([50, 5, 40, 1, 30], max_slices=3,
                           merge_factor=4)
    # one group of the (5 - 3 + 1) = 3 smallest: 1, 5, 30
    assert plan == [[1, 3, 4]]


def test_plan_cascades_through_tiers():
    # 9 equal slices down to 1: merged outputs re-enter the pool and
    # merge again — every original index ends up covered exactly once
    # per tier level
    plan = plan_compaction([1] * 9, max_slices=1, merge_factor=3)
    assert len(plan) >= 2
    covered = sorted(plan[-1])
    assert covered == list(range(9))  # final merge covers everything


def test_plan_respects_merge_factor_bound():
    for n in (5, 9, 17):
        for mf in (2, 3, 4):
            plan = plan_compaction(list(range(1, n + 1)), max_slices=2,
                                   merge_factor=mf)
            # no group merges more CURRENT slices than merge_factor:
            # group members that were already merged together count
            # as ONE input
            merged_as = {}
            for gi, group in enumerate(plan):
                inputs = {merged_as.get(i, i) for i in group}
                assert len(inputs) <= mf, (n, mf, plan)
                for i in group:
                    merged_as[i] = f"out{gi}"


@pytest.fixture(scope="module")
def five_slices(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("compaction")
    full = web_corpus(spark, "/root/testdata/sf0.001")
    dirs = []
    for i in range(5):
        d = str(root / f"s{i}")
        build_index(spark, full.filter(F.crc32("url") % 5 == i),
                    IndexConfig(out_dir=d, doc_partitions=2,
                                block_partitions=2))
        dirs.append(d)
    mono = str(root / "mono")
    build_index(spark, full, IndexConfig(out_dir=mono, doc_partitions=3,
                                         block_partitions=4))
    return str(root), dirs, mono


def _hits(index, k=25):
    df = search_kernel(index, QUERIES, BM25Params(k=k))
    return [(r["qid"], r["docid"], r["rank"], round(float(r["score"]), 6))
            for r in df.collect()]


def test_compact_preserves_search_exactly(spark, five_slices):
    root, dirs, mono = five_slices
    want = _hits(InvertedIndex(spark, mono))
    assert _hits(MultiSliceIndex(spark, dirs)) == want
    out = compact(spark, dirs, IndexConfig(out_dir=root + "/c1"),
                  max_slices=2, merge_factor=3)
    assert len(out) <= 2
    assert _hits(MultiSliceIndex(spark, out)) == want
    # idempotent once compact
    assert compact(spark, out, IndexConfig(out_dir=root + "/c2"),
                   max_slices=2, merge_factor=3) == out


def test_coalescing_merge_bounds_segment_count(spark, five_slices):
    """Segment-preserving merge accumulates segments forever (16
    slices compacted still answer with all original segments);
    coalescing merge must restore cfg.doc_partitions fresh segments —
    the monolithic query shape."""
    import json as _json

    root, dirs, mono = five_slices
    out = compact(spark, dirs, IndexConfig(out_dir=root + "/c3",
                                           doc_partitions=3),
                  max_slices=1, merge_factor=5, coalesce=True)
    assert len(out) == 1
    with open(out[0] + "/stats.json") as f:
        segs = _json.load(f)["segments"]
    assert len(segs) <= 3
    assert _hits(MultiSliceIndex(spark, out)) == \
        _hits(InvertedIndex(spark, mono))


def test_compact_plans_on_live_size(spark, tmp_path):
    """stats.json num_docs still counts tombstoned docs; the planner
    must size slices by LIVE docs so a heavily-deleted large slice is
    correctly treated as small (round-6 advice fix)."""
    from anserini_spark.index.tombstones import add_tombstones

    corpus = web_corpus(spark, "/root/testdata/sf0.001").limit(60)
    rows = corpus.collect()
    # slice A: 30 docs but 25 tombstoned (live 5); B: 10; C: 12 —
    # live-size order is A(5) < B(10) < C(12); raw order B < C < A
    bounds = [(0, 30), (30, 40), (40, 52)]
    dirs = []
    for i, (lo, hi) in enumerate(bounds):
        d = str(tmp_path / f"s{i}")
        sub = spark.createDataFrame(rows[lo:hi], corpus.schema)
        build_index(spark, sub, IndexConfig(out_dir=d, doc_partitions=1,
                                            block_partitions=1))
        dirs.append(d)
    dead = [r["url"] for r in rows[:25]]
    add_tombstones(spark, dirs[0], dead)

    # merge_factor 2, max 2: the two LIVE-smallest (A live=5, B=10)
    # must merge; C survives untouched
    out = compact(spark, dirs,
                  IndexConfig(out_dir=str(tmp_path / "cmp"),
                              doc_partitions=1, block_partitions=1),
                  max_slices=2, merge_factor=2)
    assert len(out) == 2
    assert dirs[2] in out          # raw-largest-but-live-mid survives?
    # C (12 live) is the largest by live size -> untouched
    assert dirs[0] not in out and dirs[1] not in out
