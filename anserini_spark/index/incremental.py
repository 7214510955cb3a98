"""Incremental index maintenance — the streaming bridge.

The reference is strictly batch: new documents mean a full
``IndexCollection`` rerun (`index/IndexCollection.java`). Here the
Structured Streaming ingest (`streaming/ingest.py`) accumulates
tokenized docvec-shaped rows with exactly-once file-source semantics,
and this module folds them into searchable index increments:

* ``fold_stream_slice`` — turn the accumulated stream output into a
  complete index slice (ids, posting blocks, dictionary, stats) via
  ``build_index(pre_analyzed=True)``; within the slice, recrawls of
  the same url resolve latest-crawl-wins deterministically.
* ``extend_index`` — merge the slice into an existing base index with
  ``merge_indexes`` (segment ids densely re-namespaced, postings
  rebuilt by range-partitioned sort, dictionary/stats recomputed
  exactly), after a disjointness guard: a url present in BOTH base
  and slice would need per-segment tombstones to supersede (Lucene's
  ``updateDocument`` deletes-then-adds), which this engine does not
  implement — it refuses loudly instead of silently duplicating.

Scale shape: the fold touches ONLY the new rows (one url-hash shuffle
+ the block encode, like any slice build); the merge never re-analyzes
the base corpus — it re-sorts postings (range-partitioned, never a
full posting list in memory) and re-aggregates the dictionary. Search
results over the extended index are exactly those of a from-scratch
batch build over the union corpus (scores depend only on the global
stats the merge recomputes; cross-segment ordering is by url
tie-break) — pinned by ``tests/test_incremental.py``.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .build import IndexConfig, build_index
from .merge import merge_indexes


def _stream_fingerprint(stream_dir: str) -> str:
    """Cheap content fingerprint of a stream output dir: sha256 over
    the sorted (relative path, size) list of its data files. Any new
    micro-batch changes the file list, so a stale fold is detectable
    without reading row data."""
    entries = []
    for root, _dirs, files in os.walk(stream_dir):
        rel_root = os.path.relpath(root, stream_dir)
        for f in files:
            if f.startswith("."):
                continue
            p = os.path.join(root, f)
            try:
                entries.append((os.path.join(rel_root, f),
                                os.path.getsize(p)))
            except OSError:
                continue
    entries.sort()
    return hashlib.sha256(
        json.dumps(entries).encode("utf-8")).hexdigest()


def fold_stream_slice(spark: SparkSession, stream_dir: str,
                      cfg: IndexConfig) -> dict:
    """Build a full index slice at ``cfg.out_dir`` from the streamed
    docvec rows under ``stream_dir`` (schema: url, warc_ts, doclen,
    terms, tfs — `streaming/ingest.STREAM_DOCVEC_SCHEMA`).

    Duplicate urls inside the stream window (recrawls) resolve
    deterministically latest-wins: max over the (warc_ts, doclen,
    terms, tfs) struct — Spark orders structs field-by-field and
    arrays lexicographically, so ties beyond the timestamp are still
    total. ``cfg.analyzer`` must be the analyzer the stream was
    tokenized with (the manifest lineage is load-gated)."""
    rows = spark.read.parquet(stream_dir)
    keep = ["url", "s.doclen", "s.terms", "s.tfs"]
    if cfg.store_timestamps:
        keep.append("s.warc_ts")  # ride the stored timestamp through
    latest = (
        rows.groupBy("url")
        .agg(F.max(F.struct("warc_ts", "doclen", "terms", "tfs"))
             .alias("s"))
        .select(*keep)
    )
    return build_index(spark, latest, cfg, pre_analyzed=True)


def extend_index(spark: SparkSession, base_dir: str, stream_dir: str,
                 out_dir: str, cfg: IndexConfig,
                 supersede: bool = False) -> dict:
    """Fold ``stream_dir`` into a slice and merge it with ``base_dir``
    into ``out_dir``. Returns the merged manifest.

    Url overlap between base and slice (recrawls): with
    ``supersede=True`` the base's stale copies are TOMBSTONED
    (`index/tombstones.py`, Lucene's updateDocument = delete + add)
    and the merge purges them, so the result is latest-crawl-wins
    across base+slice. Default still refuses — superseding mutates
    the base dir (appends tombstones), so it must be opted into."""
    slice_dir = os.path.join(out_dir + ".slice")
    # The fold is resumable (build_index skips completed stages), which
    # is wanted after a crash — but if stream_dir has GROWN since the
    # fold, reusing it would silently drop the new rows. Fingerprint
    # the stream input and rebuild the fold when it no longer matches.
    fp = _stream_fingerprint(stream_dir)
    fp_path = os.path.join(slice_dir, "stream_fingerprint.json")
    if os.path.isdir(slice_dir):
        prev = None
        try:
            with open(fp_path, "r", encoding="utf-8") as fh:
                prev = json.load(fh).get("sha256")
        except (OSError, ValueError):
            prev = None
        if prev != fp:
            shutil.rmtree(slice_dir, ignore_errors=True)
    slice_cfg = IndexConfig(
        out_dir=slice_dir, analyzer=cfg.analyzer, lang=cfg.lang,
        doc_partitions=cfg.doc_partitions,
        block_partitions=cfg.block_partitions,
        store_positions=cfg.store_positions,
        store_contents=cfg.store_contents,
        store_timestamps=cfg.store_timestamps,
    )
    fold_stream_slice(spark, stream_dir, slice_cfg)
    with open(fp_path, "w", encoding="utf-8") as fh:
        json.dump({"sha256": fp, "stream_dir": stream_dir}, fh)

    base_urls = spark.read.parquet(
        os.path.join(base_dir, "docvec.parquet")).select("url")
    slice_urls = spark.read.parquet(
        os.path.join(slice_dir, "docvec.parquet")).select("url")
    # left-semi keeps the probe one-sided; isEmpty stops at first hit
    overlap = slice_urls.join(base_urls, "url", "left_semi")
    if not overlap.isEmpty():
        if supersede:
            from .tombstones import add_tombstones

            add_tombstones(spark, base_dir, overlap)
        else:
            sample = [r["url"] for r in overlap.take(3)]
            raise ValueError(
                "extend_index: stream slice re-crawls urls already in "
                f"the base index (e.g. {sample}); pass supersede=True "
                "to tombstone the base's stale copies (latest-crawl-"
                "wins; the merge purges them), or drop the recrawled "
                "urls from the stream window")

    merge_cfg = IndexConfig(
        out_dir=out_dir, analyzer=cfg.analyzer, lang=cfg.lang,
        doc_partitions=cfg.doc_partitions,
        block_partitions=cfg.block_partitions,
        store_positions=cfg.store_positions,
        store_contents=cfg.store_contents,
        store_timestamps=cfg.store_timestamps,
    )
    man = merge_indexes(spark, [base_dir, slice_dir], merge_cfg)
    # the fold was only an input to the merge; removing it keeps a
    # rerun from ever seeing a stale completed manifest (the
    # fingerprint above covers the crash-during-merge resume window)
    shutil.rmtree(slice_dir, ignore_errors=True)
    return man
