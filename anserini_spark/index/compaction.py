"""Tiered slice compaction — Lucene's ``TieredMergePolicy``,
re-expressed over index-slice dirs.

Incremental corpora accumulate slices (stream folds, sliced builds);
each slice adds small per-term parquet files to every query's scan,
so unbounded slice counts erode query latency. Lucene bounds this by
merging similarly-sized segments when a tier overflows
(``TieredMergePolicy``: smallest segments merge first, never a giant
with a grain — merging is O(inputs), so re-merging a huge segment to
absorb a tiny one wastes the cluster). Same shape here:

* ``plan_compaction(sizes, max_slices, merge_factor)`` — pure policy:
  while more than ``max_slices`` slices exist, group the
  ``merge_factor`` SMALLEST into one merge. Deterministic, no I/O —
  unit-testable and inspectable before executing.
* ``compact(spark, slice_dirs, cfg, ...)`` — execute the plan with
  `merge.merge_indexes` (range-partitioned posting re-sort; never a
  full posting list in memory) and return the new slice-dir list,
  searchable via `search/multislice.MultiSliceIndex` at every step.

Scale shape: each merge touches only its input slices (O(sum of
inputs), not O(corpus)); the policy keeps merges between peers of a
size tier, so total merge work over an index's lifetime is
O(N log N) postings — Lucene's amortized bound.
"""

from __future__ import annotations

import dataclasses
import json
import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import IndexConfig, build_index
from .merge import merge_indexes
from .tombstones import tombstones_path


def plan_compaction(sizes: list[int], max_slices: int = 8,
                    merge_factor: int = 4) -> list[list[int]]:
    """Return groups of slice INDICES to merge (into one output each)
    so the final slice count is <= ``max_slices``. Smallest-first:
    each group takes the ``merge_factor`` smallest live slices (the
    merged result re-enters the pool at its combined size, like
    Lucene's tiering). Empty list = already compact."""
    if max_slices < 1:
        raise ValueError(f"max_slices must be >= 1: {max_slices}")
    if merge_factor < 2:
        raise ValueError(f"merge_factor must be >= 2: {merge_factor}")
    # pool of (size, original-indices-it-covers); merged results carry
    # their member lists so the plan refers only to ORIGINAL indices
    pool: list[tuple[int, list[int]]] = sorted(
        ((s, [i]) for i, s in enumerate(sizes)), key=lambda t: t[0]
    )
    plan: list[list[int]] = []
    while len(pool) > max_slices:
        take = min(merge_factor, len(pool) - max_slices + 1)
        group = pool[:take]
        pool = pool[take:]
        members = [i for _, ms in group for i in ms]
        merged = (sum(s for s, _ in group), members)
        plan.append(sorted(members))
        # re-insert at size order (merged peers can merge again)
        lo = 0
        while lo < len(pool) and pool[lo][0] < merged[0]:
            lo += 1
        pool.insert(lo, merged)
    return plan


def coalescing_merge(spark: SparkSession, slice_dirs: list[str],
                     cfg: IndexConfig) -> dict:
    """Merge slices by REBUILDING from their docvecs (pre-analyzed
    rows; no re-extraction/re-analysis): ids are reassigned into
    ``cfg.doc_partitions`` fresh segments, so the output's query cost
    equals a monolithic build's. `merge.merge_indexes` preserves each
    input's segments (cheaper bookkeeping, resumable per stage) but
    the segment COUNT then grows with every generation of merging —
    measured: 16 slices compacted segment-preserving answered a
    50-query batch 1.9× slower than 4 fresh slices because the
    per-segment kernel invocations never shrank
    (`scripts/slice_latency_bench.py`). Lucene's merge coalesces
    segments for the same reason. Both merges re-encode every posting
    block, so the cost profile is the same shuffle + encode."""
    from ..analysis.analyzer import analysis_version

    from .tombstones import read_tombstones

    dvs: list[DataFrame] = []
    lineages = []
    for d in slice_dirs:
        with open(os.path.join(d, "manifest.json")) as f:
            lineages.append(json.load(f)["docvec"]["lineage"])
        dv = spark.read.parquet(os.path.join(d, "docvec.parquet"))
        dead = read_tombstones(spark, d)  # purge deletes while rebuilding
        if dead is not None:
            dv = dv.join(F.broadcast(dead), "url", "left_anti")
        dvs.append(dv)
    analyzers = {ln["analyzer"] for ln in lineages}
    if len(analyzers) > 1:
        raise ValueError(f"mixed-analyzer merge: {sorted(analyzers)}")
    analyzer = analyzers.pop()
    cur_av = analysis_version(analyzer)
    stale = [d for d, ln in zip(slice_dirs, lineages)
             if ln.get("analysis_version") != cur_av]
    if stale:
        raise ValueError(
            f"slices {stale} carry analyzer version != {cur_av}; a "
            "rebuild-merge would stamp the current version over stale "
            "token streams — rebuild those slices first")
    has_pos = {"positions" in dv.columns for dv in dvs}
    has_contents = {"contents" in dv.columns for dv in dvs}
    if len(has_pos) > 1:
        raise ValueError("cannot merge a mix of positional and "
                         "non-positional slices")
    cols = ["url", "doclen", "terms", "tfs"]
    if has_pos.pop():
        cols.append("positions")
    store_contents = len(has_contents) == 1 and has_contents.pop()
    if store_contents:
        cols.append("contents")
    union = reduce(DataFrame.unionByName, [dv.select(*cols) for dv in dvs])
    cfg = dataclasses.replace(
        cfg, analyzer=analyzer, store_positions="positions" in cols,
        store_contents=store_contents)
    return build_index(spark, union, cfg, pre_analyzed=True)


def compact(spark: SparkSession, slice_dirs: list[str], cfg: IndexConfig,
            max_slices: int = 8, merge_factor: int = 4,
            coalesce: bool = True) -> list[str]:
    """Compact ``slice_dirs`` down to <= ``max_slices`` dirs. Merged
    outputs are written under ``cfg.out_dir/compact=K``; inputs are
    left on disk (caller owns deletion — a reader may still hold
    them). Returns the new slice-dir list (merge outputs + untouched
    survivors), stable-ordered by original position so repeated
    compactions are deterministic."""
    # plan on LIVE size: stats.json num_docs still counts tombstoned
    # docs, which would make heavily-deleted slices look larger than
    # what actually survives the merge and skew the smallest-first
    # policy (policy quality only — results stay exact either way)
    sizes = []
    for d in slice_dirs:
        with open(os.path.join(d, "stats.json")) as f:
            n = int(json.load(f)["num_docs"])
        tomb = tombstones_path(d)
        if os.path.isdir(tomb):
            import pyarrow.compute as _pc
            import pyarrow.dataset as _ds

            # O(deletes) driver memory: hold only the (deduped)
            # tombstone urls and STREAM the docvec url column through
            # an is_in count — the round-6 code materialized the
            # slice's whole url column as a Python set, an O(corpus)
            # driver hazard (round-6 ADVICE). Docvec urls are unique
            # per slice, so the matching-row count IS the
            # intersection size; tombstoned urls that never existed
            # match nothing and cannot deflate the live size.
            dead_urls = _ds.dataset(tomb, format="parquet").to_table(
                columns=["url"])["url"].combine_chunks().unique()
            matched = 0
            dv_ds = _ds.dataset(os.path.join(d, "docvec.parquet"),
                                format="parquet")
            for batch in dv_ds.to_batches(columns=["url"]):
                s = _pc.sum(_pc.is_in(batch["url"],
                                      value_set=dead_urls)).as_py()
                matched += int(s or 0)
            n = max(0, n - matched)
        sizes.append(n)
    plan = plan_compaction(sizes, max_slices, merge_factor)
    if not plan:
        return list(slice_dirs)
    # current[i] = the dir currently holding original slice i's docs
    # (a later plan step can merge an earlier step's output — its
    # group then lists that output's member indices)
    current = dict(enumerate(slice_dirs))
    for k, group in enumerate(plan):
        inputs = sorted({current[i] for i in group},
                        key=lambda d: min(i for i in group
                                          if current[i] == d))
        od = os.path.join(cfg.out_dir, f"compact={k:05d}")
        merge = coalescing_merge if coalesce else merge_indexes
        merge(spark, inputs, dataclasses.replace(cfg, out_dir=od))
        for i in group:
            current[i] = od
    seen: set[str] = set()
    out: list[str] = []
    for i in range(len(slice_dirs)):
        d = current[i]
        if d not in seen:
            seen.add(d)
            out.append(d)
    return out
