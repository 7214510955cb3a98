"""Sliced builds (`index/sliced.py`): per-partition checkpointing.

A killed build must resume skipping completed slices entirely; the
sliced result must search identically to the monolithic build; and
resuming with a different n_slices must refuse (membership would
re-shard silently)."""

import json
import os

import pytest

from anserini_spark.corpus.synth import web_corpus
from anserini_spark.index.build import IndexConfig, build_index
from anserini_spark.index.sliced import build_sliced_index
from anserini_spark.search.multislice import MultiSliceIndex
from anserini_spark.search.bm25 import BM25Params
from anserini_spark.search.searcher import InvertedIndex, search_kernel

QUERIES = {1: "spark merge join", 2: "customer value"}


def _hits(index, k=25):
    df = search_kernel(index, QUERIES, BM25Params(k=k))
    return [(r["qid"], r["docid"], r["rank"], round(float(r["score"]), 6))
            for r in df.collect()]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sliced")
    corpus = web_corpus(spark, "/root/testdata/sf0.001")
    cfg = IndexConfig(out_dir=str(root / "sliced"), doc_partitions=2,
                      block_partitions=3)
    dirs = build_sliced_index(spark, corpus, cfg, n_slices=3)
    build_index(spark, corpus,
                IndexConfig(out_dir=str(root / "mono"), doc_partitions=3,
                            block_partitions=4))
    return corpus, cfg, dirs, str(root / "mono")


def test_sliced_searches_like_monolithic(spark, built):
    _, _, dirs, mono = built
    assert _hits(MultiSliceIndex(spark, dirs)) == \
        _hits(InvertedIndex(spark, mono))


def test_resume_skips_completed_slices(spark, built):
    corpus, cfg, dirs, _ = built
    stamps = lambda: [
        json.load(open(os.path.join(d, "manifest.json")))["stats"]["ts"]
        for d in dirs
    ]
    before = stamps()
    assert build_sliced_index(spark, corpus, cfg, n_slices=3) == dirs
    assert stamps() == before  # nothing re-ran

    # damage slice 1: resume rebuilds ONLY it
    os.remove(os.path.join(dirs[1], "manifest.json"))
    build_sliced_index(spark, corpus, cfg, n_slices=3)
    after = stamps()
    assert after[0] == before[0] and after[2] == before[2]
    assert after[1] != before[1]
    assert _hits(MultiSliceIndex(spark, dirs)) == \
        _hits(MultiSliceIndex(spark, [dirs[0], dirs[1], dirs[2]]))


def test_resume_with_different_n_refuses(spark, built):
    corpus, cfg, _, _ = built
    with pytest.raises(ValueError, match="re-shard"):
        build_sliced_index(spark, corpus, cfg, n_slices=4)


def test_slice_membership_is_disjoint_and_total(spark, built):
    _, _, dirs, mono = built
    per_slice = [
        spark.read.parquet(os.path.join(d, "docvec.parquet")).count()
        for d in dirs
    ]
    mono_n = spark.read.parquet(os.path.join(mono, "docvec.parquet")).count()
    assert sum(per_slice) == mono_n
    assert all(n > 0 for n in per_slice)
