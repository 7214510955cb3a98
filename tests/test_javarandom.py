"""java.util.Random LCG parity (`util/javarandom.py`) and the axiom
seeded-random pool mode that consumes it."""

import pytest

from anserini_spark.util.javarandom import JavaRandom


def test_documented_lcg_value():
    # the canonical cross-language check: new Random(0).nextInt()
    assert JavaRandom(0).next_int() == -1155484576


def test_deterministic_and_bounded():
    a = [JavaRandom(42).next_int(100) for _ in range(1)]
    r1, r2 = JavaRandom(42), JavaRandom(42)
    s1 = [r1.next_int(1000) for _ in range(200)]
    s2 = [r2.next_int(1000) for _ in range(200)]
    assert s1 == s2
    assert all(0 <= v < 1000 for v in s1)
    assert len(set(s1)) > 100  # actually varies
    assert a  # seed-42 stream exists


def test_power_of_two_path():
    r = JavaRandom(7)
    vals = [r.next_int(64) for _ in range(100)]
    assert all(0 <= v < 64 for v in vals)
    # power-of-two bound uses the high bits — stream differs from
    # the modulo path of a nearby non-power bound
    assert vals != [JavaRandom(7).next_int(63) for _ in range(100)]


def test_state_advances_like_java():
    # nextInt() is next(32): two draws advance the 48-bit state twice;
    # replaying the documented recurrence reproduces them
    r = JavaRandom(12345)
    a, b = r.next_int(), r.next_int()
    seed = (12345 ^ 0x5DEECE66D) & ((1 << 48) - 1)
    out = []
    for _ in range(2):
        seed = (seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        v = seed >> 16
        out.append(v - (1 << 32) if v >= (1 << 31) else v)
    assert [a, b] == out


def test_axiom_random_pool_mode(spark, tmp_path):
    from anserini_spark.corpus.synth import web_corpus
    from anserini_spark.index.build import IndexConfig, build_index
    from anserini_spark.search.axiom import _select_pool
    from anserini_spark.search.bm25 import BM25Params
    from anserini_spark.search.searcher import InvertedIndex, search_kernel

    corpus = web_corpus(spark, "/root/testdata/sf0.001")
    d = str(tmp_path / "ax_idx")
    build_index(spark, corpus, IndexConfig(out_dir=d, doc_partitions=2,
                                           block_partitions=4))
    idx = InvertedIndex(spark, d)
    first = search_kernel(idx, {1: "spark merge", 2: "customer"},
                          BM25Params(k=50))

    p1 = _select_pool(idx, first, [1, 2], r=5, n=3, seed=42,
                      pool="random")
    p2 = _select_pool(idx, first, [1, 2], r=5, n=3, seed=42,
                      pool="random")
    assert p1 == p2                       # seed-reproducible
    assert all(len(v) == 15 for v in p1.values())
    # top-r first-pass docs lead each pool
    top1 = [r_["docid"] for r_ in first.filter("qid = 1 and rank <= 5")
            .orderBy("rank").collect()]
    assert p1[1][:5] == top1
    # a different seed draws a different extra set
    p3 = _select_pool(idx, first, [1, 2], r=5, n=3, seed=7,
                      pool="random")
    assert p3[1][5:] != p1[1][5:]
    # and the hash mode differs from the random mode (two protocols)
    ph = _select_pool(idx, first, [1, 2], r=5, n=3, seed=42,
                      pool="hash")
    assert ph[1][:5] == top1 and ph[1][5:] != p1[1][5:]


def test_simple_searcher_axiom_pool_param(spark, tmp_path):
    from anserini_spark.corpus.synth import web_corpus
    from anserini_spark.index.build import IndexConfig, build_index
    from anserini_spark.search.searcher import SimpleSearcher

    corpus = web_corpus(spark, "/root/testdata/sf0.001")
    d = str(tmp_path / "ax_idx2")
    build_index(spark, corpus, IndexConfig(out_dir=d, doc_partitions=2,
                                           block_partitions=4))
    s = SimpleSearcher(spark, d)
    s.set_axiom(r=5, n=2, pool="random")
    hits = s.search("spark merge join", k=10)
    assert len(hits) == 10
    # same seed -> same results
    assert s.search("spark merge join", k=10) == hits
