"""Tiny-corpus index invariants (FIXTURES.md §6) — dictionary (df, cf),
doclens, collection stats; the quantities of `IndexUtils.java:157-176`
verified against a brute-force Python count of the same corpus."""

import json
import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from anserini_spark.analysis.analyzer import analyze


@pytest.fixture(scope="module")
def brute(tiny_docs):
    tf = {}
    df = Counter()
    doclen = {}
    for url, text in tiny_docs.items():
        toks = analyze(text)
        c = Counter(toks)
        tf[url] = c
        doclen[url] = len(toks)
        df.update(c.keys())
    return {"tf": tf, "df": df, "doclen": doclen}


def test_stats_match_bruteforce(spark, tiny_index, tiny_docs, brute):
    with open(os.path.join(tiny_index, "stats.json")) as f:
        stats = json.load(f)
    assert stats["num_docs"] == len(tiny_docs)
    sum_tf = sum(brute["doclen"].values())
    doc_count = sum(1 for v in brute["doclen"].values() if v > 0)
    assert stats["sum_tf"] == sum_tf
    assert stats["doc_count"] == doc_count
    assert abs(stats["avgdl"] - sum_tf / doc_count) < 1e-9
    assert stats["unique_terms"] == len(brute["df"])


def test_dictionary_matches_bruteforce(spark, tiny_index, brute):
    rows = spark.read.parquet(os.path.join(tiny_index, "dictionary.parquet")).collect()
    got = {r["term"]: (r["df"], r["cf"]) for r in rows}
    want_cf = Counter()
    for c in brute["tf"].values():
        want_cf.update(c)
    assert set(got) == set(brute["df"])
    for t in got:
        assert got[t] == (brute["df"][t], want_cf[t]), t


def test_doclens_match(spark, tiny_index, brute):
    rows = (
        spark.read.parquet(os.path.join(tiny_index, "docvec.parquet"))
        .select("url", "doclen")
        .collect()
    )
    got = {r["url"]: r["doclen"] for r in rows}
    assert got == brute["doclen"]


def test_docids_order_isomorphic_to_urls_within_segment(spark, tiny_index):
    """Ids are url-order-isomorphic WITHIN a segment (what the scoring
    kernel's doc_id tie-break relies on); cross-segment ordering is by
    url string at merge time. Urls are globally unique (dedup)."""
    rows = (
        spark.read.parquet(os.path.join(tiny_index, "docvec.parquet"))
        .select("segment", "doc_id", "url")
        .orderBy("segment", "doc_id")
        .collect()
    )
    from collections import defaultdict

    per_seg = defaultdict(list)
    for r in rows:
        per_seg[r["segment"]].append(r["url"])
    for seg, urls in per_seg.items():
        assert urls == sorted(urls), f"segment {seg} not url-sorted"
    all_urls = [r["url"] for r in rows]
    assert len(set(all_urls)) == len(all_urls)  # dedup happened


def test_postings_blocks_consistent_with_dictionary(spark, tiny_index):
    bl = spark.read.parquet(os.path.join(tiny_index, "blocks.parquet"))
    agg = (
        bl.groupBy("term")
        .agg(F.sum("n").alias("df"), F.sum("sum_tf").alias("cf"))
        .collect()
    )
    d = {
        r["term"]: (r["df"], r["cf"])
        for r in spark.read.parquet(
            os.path.join(tiny_index, "dictionary.parquet")
        ).collect()
    }
    for r in agg:
        assert d[r["term"]] == (r["df"], r["cf"])


def test_resumable_build_skips_done_stages(spark, tiny_index):
    from anserini_spark.corpus.synth import web_corpus
    from anserini_spark.index.build import IndexConfig, build_index

    with open(os.path.join(tiny_index, "manifest.json")) as f:
        before = json.load(f)
    corpus = web_corpus(spark, "/root/testdata/sf0.001")
    cfg = IndexConfig(out_dir=tiny_index, doc_partitions=3, block_partitions=5)
    man = build_index(spark, corpus, cfg)  # second run: all stages skipped
    assert {k: v["ts"] for k, v in man.items()} == {
        k: v["ts"] for k, v in before.items()
    }


def test_manifest_records_per_partition_bytes(tiny_index):
    """north_rule lineage contract: each write stage accounts bytes
    written PER PARTITION (skew is visible in the manifest), and the
    per-file map sums to the stage total."""
    with open(os.path.join(tiny_index, "manifest.json")) as f:
        man = json.load(f)
    for stage in ("docvec", "blocks", "dictionary"):
        pb = man[stage]["partition_bytes"]
        assert pb["partitions"] >= 1
        per = pb["per_partition"]
        assert len(per) == pb["partitions"]
        assert sum(per.values()) == pb["sum_bytes"]
        assert min(per.values()) == pb["min_bytes"]
        assert max(per.values()) == pb["max_bytes"]
        assert all(k.startswith("part-") for k in per)


def test_bm25_index_topk_matches_corpus_recompute(spark):
    """The driver-gate block-index query (real blocks.parquet +
    MaxScore, float64 BM25) must rank identically to the
    pure-DataFrame recompute over documents.parquet."""
    from anserini_spark.ops.corpus_queries import bm25_topk
    from anserini_spark.ops.index_queries import bm25_index_topk

    sf = "/root/testdata/sf0.001"
    via_index = [(r["qid"], r["doc_id"], r["rank"])
                 for r in bm25_index_topk(spark, sf).collect()]
    via_corpus = [(r["qid"], r["doc_id"], r["rank"])
                  for r in bm25_topk(spark, sf)
                  .orderBy("qid", "rank").collect()]
    assert via_index == via_corpus


def test_store_contents_doc_fetch(spark, tmp_path):
    """-storeContents analogue: SimpleSearcher.doc returns the stored
    extracted text; plain indexes return None."""
    from anserini_spark.corpus.synth import web_corpus
    from anserini_spark.index.build import IndexConfig, build_index
    from anserini_spark.search.searcher import SimpleSearcher

    corpus = web_corpus(spark, "/root/testdata/sf0.001")
    out = str(tmp_path / "cidx")
    build_index(spark, corpus, IndexConfig(out_dir=out, doc_partitions=2,
                                           block_partitions=2,
                                           store_contents=True))
    s = SimpleSearcher(spark, out)
    docid, _, _ = s.search("spark merge", k=1)[0]
    stored = s.doc(docid)
    want = {r["url"]: r["text"] for r in corpus.collect()}[docid]
    assert stored == want
    assert s.doc("https://nonexistent.example/x") is None


def test_docvec_plan_single_exchange(spark):
    """Round-4 invariant: the docvec stage's url-dedup groupBy reuses
    the explicit repartition(P, "url") clustering — the physical plan
    must contain exactly ONE Exchange (the repartition itself). A
    second exchange would mean the dedup agg re-shuffles the analyzed
    arrays."""
    import re

    from pyspark.sql import functions as F

    from anserini_spark.corpus.synth import web_corpus
    from anserini_spark.index.build import (
        SEG_SHIFT,
        IndexConfig,
        _analyze_kernel,
        analyzed_schema,
    )

    cfg = IndexConfig(out_dir="/tmp/nil_plan", source_col="html",
                      doc_partitions=4)
    df = web_corpus(spark, "/root/testdata/sf0.001")
    other_cols = ["doclen", "terms", "tfs"]
    plan_df = (
        df.select("url", "html")
        .mapInPandas(_analyze_kernel(cfg), schema=analyzed_schema(False, False))
        .repartition(4, "url")
        .groupBy("url")
        .agg(*[F.first(c).alias(c) for c in other_cols])
        .sortWithinPartitions("url")
        .withColumn("doc_id", F.monotonically_increasing_id())
        .withColumn("segment",
                    F.shiftrightunsigned("doc_id", SEG_SHIFT).cast("int"))
        .select("doc_id", "url", "segment", *other_cols)
    )
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange", plan)) == 1, plan


def test_analysis_version_gate(spark, tiny_index, tmp_path):
    """An index whose recorded analyzer/lexicon version differs from
    the engine's current chain must refuse to load (ADVICE r4: a grown
    KStem lexicon would otherwise silently query drifted stems) —
    same contract as the seg_shift id-layout gate."""
    import json
    import shutil

    from anserini_spark.analysis.analyzer import analysis_version
    from anserini_spark.search.searcher import InvertedIndex

    # current-version index loads fine
    idx = InvertedIndex(spark, tiny_index, cache=False)
    assert idx.manifest["docvec"]["lineage"]["analysis_version"] == \
        analysis_version(idx.analyzer)

    stale = str(tmp_path / "stale_idx")
    shutil.copytree(tiny_index, stale)
    mpath = f"{stale}/manifest.json"
    with open(mpath) as f:
        man = json.load(f)
    man["docvec"]["lineage"]["analysis_version"] = "tok1.stopdead.kstem0"
    with open(mpath, "w") as f:
        json.dump(man, f)
    with pytest.raises(ValueError, match="analyzer version"):
        InvertedIndex(spark, stale, cache=False)


def test_analysis_version_impact_chain_independent():
    """SLR/impact docvecs come from pre-weighted activation maps, not
    the tokenizer chain, so their version must be a constant that does
    NOT move when the stop set / lexicon does — otherwise every chain
    change would spuriously refuse valid impact indexes."""
    from anserini_spark.analysis.analyzer import analysis_version

    assert analysis_version("impact") == "impact1"
    # the chain-backed analyzers DO embed chain/lexicon hashes
    assert analysis_version("porter").startswith("tok1.stop")
    assert ".kstem" in analysis_version("krovetz")


def test_head_term_blocks_split_across_files(spark, tmp_path):
    """north_rule skew contract: a Zipf head term present in EVERY doc
    must not serialize into one task/file — its posting blocks land in
    multiple output partitions (keyed by (term, doc-range bucket) via
    segments + RANGE_SHIFT), so no single reducer owns a head term."""
    from pyspark.sql import functions as F

    from anserini_spark.corpus.synth import web_corpus
    from anserini_spark.index.build import IndexConfig, build_index

    corpus = web_corpus(spark, "/root/testdata/sf0.001").withColumn(
        "text", F.concat(F.lit("headterm "), F.col("text"))
    )
    out = str(tmp_path / "skew_idx")
    build_index(spark, corpus, IndexConfig(out_dir=out, analyzer="ws",
                                           doc_partitions=4,
                                           block_partitions=8))
    files = (
        spark.read.parquet(out + "/blocks.parquet")
        .filter(F.col("term") == "headterm")
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert files >= 2, f"head term serialized into {files} file(s)"
