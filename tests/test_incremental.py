"""Incremental index maintenance (`index/incremental.py`): streamed
docvec slices folded + merged into a base index must search EXACTLY
like a from-scratch batch build over the union corpus; recrawl overlap
must refuse; in-window recrawls resolve latest-wins."""

import datetime

import pytest
from pyspark.sql import functions as F

from anserini_spark.index.build import IndexConfig, build_index
from anserini_spark.index.incremental import extend_index, fold_stream_slice
from anserini_spark.search.searcher import SimpleSearcher

QUERIES = ["spark merge join", "customer value", "slow query table"]


@pytest.fixture(scope="module")
def inc(spark, tmp_path_factory):
    from anserini_spark.corpus.synth import web_corpus
    from anserini_spark.streaming.ingest import start_corpus_ingest

    root = tmp_path_factory.mktemp("inc")
    full = web_corpus(spark, "/root/testdata/sf0.001")
    drop1 = full.filter(F.crc32("url") % 5 != 0)
    drop2 = full.filter(F.crc32("url") % 5 == 0)
    p2 = str(root / "drop2.parquet")
    drop2.write.parquet(p2)

    cfg = lambda d: IndexConfig(out_dir=str(root / d), doc_partitions=4,
                                block_partitions=8)
    build_index(spark, full, cfg("batch_idx"))
    build_index(spark, drop1, cfg("base_idx"))

    stream_out = str(root / "stream_docvec")
    q = start_corpus_ingest(spark, p2, stream_out,
                            str(root / "ckpt"), cfg("unused"))
    q.awaitTermination(300)
    return root, stream_out, cfg


def test_extend_index_matches_batch_build(spark, inc):
    """Base(80%) + stream-folded slice(20%) == one-shot batch build of
    100%, down to identical (docid, rank, score) lists — stats and
    dictionary are recomputed exactly by the merge, and cross-segment
    ordering is the url tie-break, so doc-id re-namespacing is
    invisible."""
    root, stream_out, cfg = inc
    man = extend_index(spark, str(root / "base_idx"), stream_out,
                       str(root / "ext_idx"), cfg("ext_idx"))
    assert man
    s_batch = SimpleSearcher(spark, str(root / "batch_idx"))
    s_ext = SimpleSearcher(spark, str(root / "ext_idx"))
    for q in QUERIES:
        assert s_ext.search(q, k=20) == s_batch.search(q, k=20), q


def test_extend_index_refuses_recrawl_overlap(spark, inc):
    """A stream window re-crawling a url already in the base index
    must refuse by default (silent duplication is worse); opting into
    superseding is test_tombstones.py's job."""
    root, stream_out, cfg = inc
    with pytest.raises(ValueError, match="supersede"):
        # the full corpus's stream ingest overlaps base_idx by design
        extend_index(spark, str(root / "batch_idx"), stream_out,
                     str(root / "ext2_idx"), cfg("ext2_idx"))


def test_fold_stream_slice_latest_crawl_wins(spark, tmp_path):
    """Two crawls of one url inside a stream window: the later warc_ts
    payload must be the one indexed (deterministic max over the
    (warc_ts, doclen, terms, tfs) struct)."""
    ts0 = datetime.datetime(2026, 1, 1)
    ts1 = datetime.datetime(2026, 6, 1)
    rows = [
        ("https://a/1", ts0, 2, ["old", "page"], [1, 1]),
        ("https://a/1", ts1, 3, ["fresh", "new", "page"], [1, 1, 1]),
        ("https://a/2", ts0, 1, ["other"], [1]),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, doclen long, "
              "terms array<string>, tfs array<int>")
    stream_dir = str(tmp_path / "win")
    df.write.parquet(stream_dir)
    out = str(tmp_path / "slice_idx")
    fold_stream_slice(spark, stream_dir,
                      IndexConfig(out_dir=out, doc_partitions=2,
                                  block_partitions=2))
    dv = {r["url"]: sorted(r["terms"])
          for r in spark.read.parquet(out + "/docvec.parquet").collect()}
    assert dv == {"https://a/1": ["fresh", "new", "page"],
                  "https://a/2": ["other"]}


def test_slice_dir_removed_after_merge(spark, inc):
    """extend_index must not leave a completed `<out>.slice` fold
    behind: a rerun against the same out_dir after the stream grew
    would resume it (all stages done -> skipped) and silently drop
    the new rows."""
    import os

    root, _stream_out, _cfg = inc
    assert os.path.isdir(str(root / "ext_idx"))
    assert not os.path.exists(str(root / "ext_idx") + ".slice")


def test_stream_fingerprint_tracks_growth(tmp_path):
    """The crash-resume guard: any new micro-batch file changes the
    fingerprint, so a stale fold is rebuilt instead of reused."""
    from anserini_spark.index.incremental import _stream_fingerprint

    d = tmp_path / "stream"
    d.mkdir()
    (d / "part-000.parquet").write_bytes(b"x" * 10)
    fp1 = _stream_fingerprint(str(d))
    assert fp1 == _stream_fingerprint(str(d))
    (d / "part-001.parquet").write_bytes(b"y" * 4)
    fp2 = _stream_fingerprint(str(d))
    assert fp1 != fp2
    # size growth of an existing file is also caught
    (d / "part-001.parquet").write_bytes(b"y" * 9)
    assert _stream_fingerprint(str(d)) != fp2
