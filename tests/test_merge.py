"""Merge parity (FIXTURES.md §7 invariance): a corpus built as two
independent slices and merged must produce the identical golden run
and identical collection stats as the single-slice build."""

import json
import os

from pyspark.sql import functions as F

from anserini_spark.corpus.synth import web_corpus
from anserini_spark.index.build import IndexConfig, build_index
from anserini_spark.index.merge import merge_indexes
from anserini_spark.search.bm25 import BM25Params
from anserini_spark.search.searcher import InvertedIndex, search_kernel

QUERIES = {1: "spark merge join", 2: "customer value", 3: "scan"}


def _rows(df):
    return [
        (r["qid"], r["docid"], r["rank"], round(float(r["score"]), 6))
        for r in df.collect()
    ]


def test_sliced_build_plus_merge_equals_single(spark, tiny_index, tmp_path):
    corpus = web_corpus(spark, "/root/testdata/sf0.001")
    # two disjoint url slices (hash split)
    s0 = corpus.filter(F.abs(F.xxhash64("url")) % 2 == 0)
    s1 = corpus.filter(F.abs(F.xxhash64("url")) % 2 == 1)
    d0, d1, dm = (str(tmp_path / n) for n in ("s0", "s1", "merged"))
    build_index(spark, s0, IndexConfig(out_dir=d0, doc_partitions=2,
                                       block_partitions=3))
    build_index(spark, s1, IndexConfig(out_dir=d1, doc_partitions=2,
                                       block_partitions=3))
    merge_indexes(spark, [d0, d1], IndexConfig(out_dir=dm, doc_partitions=2,
                                               block_partitions=4))

    with open(os.path.join(dm, "stats.json")) as f:
        merged_stats = json.load(f)
    with open(os.path.join(tiny_index, "stats.json")) as f:
        single_stats = json.load(f)
    for key in ("num_docs", "doc_count", "sum_tf", "unique_terms"):
        assert merged_stats[key] == single_stats[key], key
    assert abs(merged_stats["avgdl"] - single_stats["avgdl"]) < 1e-9

    merged_run = _rows(
        search_kernel(InvertedIndex(spark, dm), QUERIES, BM25Params(k=15))
    )
    single_run = _rows(
        search_kernel(InvertedIndex(spark, tiny_index), QUERIES, BM25Params(k=15))
    )
    assert merged_run == single_run


def test_merge_preserves_positions_for_sdm(spark, tmp_path):
    """Two positional slices merged -> SDM run identical to the
    single positional build (ADVICE: merge must not drop positions)."""
    from anserini_spark.search.sdm import search_sdm

    corpus = web_corpus(spark, "/root/testdata/sf0.001")
    s0 = corpus.filter(F.abs(F.xxhash64("url")) % 2 == 0)
    s1 = corpus.filter(F.abs(F.xxhash64("url")) % 2 == 1)
    d0, d1, dm, ds = (str(tmp_path / n) for n in ("p0", "p1", "pm", "psingle"))
    for df, d in ((s0, d0), (s1, d1), (corpus, ds)):
        build_index(spark, df, IndexConfig(out_dir=d, doc_partitions=2,
                                           block_partitions=3,
                                           store_positions=True))
    merge_indexes(spark, [d0, d1], IndexConfig(out_dir=dm, doc_partitions=2,
                                               block_partitions=4,
                                               store_positions=True))
    dv = spark.read.parquet(f"{dm}/docvec.parquet")
    assert "positions" in dv.columns

    q = {1: "spark merge join", 2: "customer value"}
    merged_run = _rows(search_sdm(InvertedIndex(spark, dm), q, BM25Params(k=15)))
    single_run = _rows(search_sdm(InvertedIndex(spark, ds), q, BM25Params(k=15)))
    assert merged_run == single_run


def test_hierarchical_merge(spark, tmp_path):
    """merge(merge(a,b), merge(c,d)) must equal the single build —
    the bit-shift segment namespacing silently corrupted doc ids at
    level 2 (segment collisions); dense reassignment fixes it."""
    corpus = web_corpus(spark, "/root/testdata/sf0.001")
    dirs = []
    for i in range(4):
        d = str(tmp_path / f"h{i}")
        build_index(spark, corpus.filter(F.abs(F.xxhash64("url")) % 4 == i),
                    IndexConfig(out_dir=d, doc_partitions=2,
                                block_partitions=2))
        dirs.append(d)
    m1, m2, top, single = (str(tmp_path / n)
                           for n in ("m1", "m2", "top", "single"))
    merge_indexes(spark, dirs[:2], IndexConfig(out_dir=m1, doc_partitions=2,
                                               block_partitions=2))
    merge_indexes(spark, dirs[2:], IndexConfig(out_dir=m2, doc_partitions=2,
                                               block_partitions=2))
    merge_indexes(spark, [m1, m2], IndexConfig(out_dir=top, doc_partitions=2,
                                               block_partitions=3))
    build_index(spark, corpus, IndexConfig(out_dir=single, doc_partitions=2,
                                           block_partitions=3))
    q = {1: "spark merge join", 2: "customer value", 3: "scan"}
    a = _rows(search_kernel(InvertedIndex(spark, top), q, BM25Params(k=15)))
    b = _rows(search_kernel(InvertedIndex(spark, single), q, BM25Params(k=15)))
    assert a == b


def test_merge_carries_warc_ts(spark, tmp_path):
    """store_timestamps docvecs keep warc_ts through a merge (the
    background-linking date filter reads it post-compaction)."""
    import datetime

    from anserini_spark.index.merge import merge_indexes

    def mk(name, rows):
        d = str(tmp_path / name)
        c = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, text string, lang string")
        build_index(spark, c, IndexConfig(
            out_dir=d, doc_partitions=1, block_partitions=1,
            store_timestamps=True))
        return d

    a = mk("a", [("u/1", datetime.datetime(2020, 1, 1), "alpha beta", "en")])
    b = mk("b", [("u/2", datetime.datetime(2021, 2, 2), "gamma delta", "en")])
    out = str(tmp_path / "m")
    merge_indexes(spark, [a, b], IndexConfig(
        out_dir=out, doc_partitions=1, block_partitions=1,
        store_timestamps=True))
    dv = {r["url"]: r["warc_ts"]
          for r in spark.read.parquet(out + "/docvec.parquet")
          .select("url", "warc_ts").collect()}
    assert dv["u/1"].year == 2020 and dv["u/2"].year == 2021
