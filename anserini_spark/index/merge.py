"""Segment merge — the analogue of Lucene's background merges /
``forceMerge(1)`` (`index/IndexCollection.java:784,857-863`).

A large corpus can be built as independent **slices** (disjoint url
ranges, each a full index dir via ``build_index``) — the unit of
coarse-grained resumability: a crashed build re-runs only missing
slices. ``merge_indexes`` then consolidates N slice indexes into one
global index:

* slice docvecs are unioned with re-keyed (slice, partition) segments
  (segment ids namespaced by slice so doc ids stay disjoint),
* posting blocks are rebuilt by the same range-partitioned sort
  (blocks from different slices interleave in doc order within a
  term — a streaming sort-merge, never a full posting list in memory),
* dictionary and collection stats are recomputed exactly and asserted
  against the per-slice sums (docFreq/collectionFreq/avgdl invariants,
  `IndexUtils.java:157-176`).

Doc ids are NOT globally re-assigned: cross-slice ordering is handled
at query time by the url-string tie-break, so merge never needs a
global sort of docs — only of postings, which Spark's range
partitioner distributes.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .blocks import RANGE_SHIFT
from .build import (SEG_SHIFT, IndexConfig, _Manifest, _blocks_kernel,
                    _dir_bytes, blocks_schema)


def merge_indexes(spark: SparkSession, slice_dirs: list[str], cfg: IndexConfig) -> dict:
    """Merge N slice index dirs (each from ``build_index`` OR a prior
    merge — hierarchical merging is supported) into ``cfg.out_dir``.
    Returns the manifest.

    Segment ids are DENSELY reassigned across the inputs (slice 0's
    segments first, then slice 1's, ...) rather than bit-shifted:
    shifting breaks on two-level merges (an already-merged input's
    segment ids exceed the shift budget and collide — caught by
    `tests/test_merge.py::test_hierarchical_merge`), while dense ids
    support any slice count and keep the (segment << 40 | row) doc-id
    invariant exact."""
    os.makedirs(cfg.out_dir, exist_ok=True)
    man = _Manifest(cfg.out_dir)

    docvec_path = os.path.join(cfg.out_dir, "docvec.parquet")
    blocks_path = os.path.join(cfg.out_dir, "blocks.parquet")
    dict_path = os.path.join(cfg.out_dir, "dictionary.parquet")
    stats_path = os.path.join(cfg.out_dir, "stats.json")

    if not man.done("merge_docvec"):
        t0 = time.time()
        parts = []
        has_pos = set()
        next_seg = 0
        for si, d in enumerate(slice_dirs):
            with open(os.path.join(d, "manifest.json")) as f:
                slice_shift = json.load(f)["docvec"].get("seg_shift", 40)
            if slice_shift != SEG_SHIFT:
                raise ValueError(
                    f"slice {d} was built with SEG_SHIFT={slice_shift}, "
                    f"engine uses {SEG_SHIFT}; rebuild the slice")
            dv = spark.read.parquet(os.path.join(d, "docvec.parquet"))
            # purge tombstoned docs while we are rewriting anyway —
            # the Lucene contract: deletes are physical only after a
            # merge (blocks/dictionary/stats below re-derive from the
            # filtered docvec, so the output is a clean index)
            from .tombstones import read_tombstones

            dead = read_tombstones(spark, d)
            if dead is not None:
                dv = dv.join(F.broadcast(dead), "url", "left_anti")
            has_pos.add("positions" in dv.columns)
            with open(os.path.join(d, "stats.json")) as f:
                slice_segs = sorted(int(k) for k in
                                    json.load(f)["segments"])
            remap = {old: next_seg + j for j, old in enumerate(slice_segs)}
            next_seg += len(slice_segs)
            mapping = F.create_map(
                *[F.lit(x) for kv in remap.items() for x in kv]
            )
            seg = mapping[F.col("segment")].cast("int")
            # doc ids are re-namespaced to the merged segment id so
            # the (segment << SEG_SHIFT | row) invariant holds globally
            doc = (
                seg.cast("long") * F.lit(1 << SEG_SHIFT)
                + F.col("doc_id").bitwiseAND(F.lit((1 << SEG_SHIFT) - 1))
            )
            cols = [
                doc.alias("doc_id"),
                F.col("url"),
                seg.alias("segment"),
                F.col("doclen"),
                F.col("terms"),
                F.col("tfs"),
            ]
            # carry positional postings (store_positions=True slices)
            # so SDM keeps working on the merged index
            if "positions" in dv.columns:
                cols.append(F.col("positions"))
            if "contents" in dv.columns:  # -storeContents analogue
                cols.append(F.col("contents"))
            if "warc_ts" in dv.columns:  # store_timestamps analogue
                cols.append(F.col("warc_ts"))
            parts.append(dv.select(*cols))
        if len(has_pos) > 1:
            raise ValueError(
                "cannot merge a mix of positional and non-positional "
                "slices; rebuild with a uniform store_positions setting"
            )
        merged = parts[0]
        for p in parts[1:]:
            # stored-field columns (contents/warc_ts) may be present
            # on only some slices — missing ones fill with null;
            # positional mixing stays a hard error (checked above)
            merged = merged.unionByName(p, allowMissingColumns=True)
        merged.write.mode("overwrite").parquet(docvec_path)
        man.record(
            "merge_docvec",
            wall_s=round(time.time() - t0, 3),
            slices=len(slice_dirs),
            bytes=_dir_bytes(docvec_path),
            lineage={"stage": "merge_docvec", "slices": slice_dirs},
        )

    docvec = spark.read.parquet(docvec_path)

    if not man.done("blocks"):
        t0 = time.time()
        has_pos = "positions" in docvec.columns and cfg.store_positions
        if has_pos:
            exploded = docvec.select(
                "doc_id", "segment", "doclen",
                F.explode(F.arrays_zip("terms", "tfs", "positions"))
                .alias("e"),
            ).select(
                F.col("e.terms").alias("term"), "segment", "doc_id",
                F.col("e.tfs").alias("tf"), "doclen",
                F.col("e.positions").alias("pos"),
            )
        else:
            exploded = docvec.select(
                "doc_id", "segment", "doclen",
                F.explode(F.arrays_zip("terms", "tfs")).alias("e"),
            ).select(
                F.col("e.terms").alias("term"), "segment", "doc_id",
                F.col("e.tfs").alias("tf"), "doclen",
            )
        postings = (
            exploded
            .repartition(cfg.block_partitions, F.col("term"),
                         F.shiftright(F.col("doc_id"), RANGE_SHIFT))
            .sortWithinPartitions("term", "doc_id")
            .mapInPandas(_blocks_kernel(cfg), schema=blocks_schema(has_pos))
        )
        postings.write.mode("overwrite").parquet(blocks_path)
        wall = time.time() - t0
        agg = spark.read.parquet(blocks_path).agg(
            F.count("*").alias("blocks"), F.sum("n").alias("postings")
        ).collect()[0]
        man.record("blocks", wall_s=round(wall, 3), blocks=agg["blocks"],
                   postings=agg["postings"],
                   postings_per_sec=round((agg["postings"] or 0) / max(wall, 1e-9), 1),
                   bytes=_dir_bytes(blocks_path))

    if not man.done("dictionary"):
        t0 = time.time()
        (
            spark.read.parquet(blocks_path)
            .groupBy("term")
            .agg(F.sum("n").alias("df"), F.sum("sum_tf").alias("cf"))
            .repartitionByRange(max(1, cfg.block_partitions // 4), "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(dict_path)
        )
        man.record("dictionary", wall_s=round(time.time() - t0, 3),
                   bytes=_dir_bytes(dict_path))

    if not man.done("stats"):
        t0 = time.time()
        s = docvec.agg(
            F.count("*").alias("num_docs"),
            F.sum((F.col("doclen") > 0).cast("long")).alias("doc_count"),
            F.sum("doclen").alias("sum_tf"),
        ).collect()[0]
        uniq = spark.read.parquet(dict_path).count()
        # capacity semantics (max local id + 1), NOT row count: purging
        # tombstoned docs leaves row-id gaps inside preserved segments,
        # and the scoring kernel's dense accumulator must span the gaps
        seg_counts = {
            int(r["segment"]): int(r["cap"])
            for r in docvec.groupBy("segment").agg(
                (F.max(F.col("doc_id").bitwiseAND(
                    F.lit((1 << SEG_SHIFT) - 1))) + 1).alias("cap")
            ).collect()
        }
        stats = {
            "num_docs": int(s["num_docs"]),
            "doc_count": int(s["doc_count"] or 0),
            "sum_tf": int(s["sum_tf"] or 0),
            "avgdl": (float(s["sum_tf"]) / float(s["doc_count"]))
            if s["doc_count"] else 0.0,
            "unique_terms": int(uniq),
            "segments": seg_counts,
        }
        # invariant check vs per-slice sums (exact stats recomputation);
        # tombstoned slices legitimately shrink (the merge purges)
        from .tombstones import has_tombstones as _has_tomb

        slice_num_docs = 0
        for d in slice_dirs:
            with open(os.path.join(d, "stats.json")) as f:
                slice_num_docs += json.load(f)["num_docs"]
        if any(_has_tomb(d) for d in slice_dirs):
            assert stats["num_docs"] <= slice_num_docs, (
                f"merge GREW: {stats['num_docs']} > {slice_num_docs}")
        else:
            assert stats["num_docs"] == slice_num_docs, (
                f"merge lost docs: {stats['num_docs']} != {slice_num_docs}"
            )
        with open(stats_path, "w") as f:
            json.dump(stats, f, indent=2)
        man.record("stats", wall_s=round(time.time() - t0, 3),
                   **{k: v for k, v in stats.items() if k != "segments"})

    # docvec lineage entry so InvertedIndex can resolve the analyzer
    if "docvec" not in man.entries:
        total_docs = 0
        for d in slice_dirs:
            with open(os.path.join(d, "manifest.json")) as f:
                total_docs += json.load(f)["docvec"]["docs"]
        with open(os.path.join(slice_dirs[0], "manifest.json")) as f:
            src_man = json.load(f)
        man.record("docvec", wall_s=0.0, seg_shift=SEG_SHIFT,
                   merged_from=slice_dirs,
                   docs=total_docs, lineage=src_man["docvec"]["lineage"])
    return man.entries
