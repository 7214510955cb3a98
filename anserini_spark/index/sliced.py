"""Sliced (checkpointed) index builds — partition-granular resume.

``build_index`` is already resumable per STAGE (docvec / blocks /
dictionary / stats manifests). For very large corpora the north-rule
contract is finer: a killed 100 TB build must not re-pay completed
work at stage granularity either, because one stage over the whole
corpus can be hours. ``build_sliced_index`` hash-partitions the
corpus into ``n_slices`` disjoint url slices (the same
``crc32(url) % n`` family as `index/merge.py`'s shard filters) and
builds each as an independent, individually-resumable index slice:

* a re-run SKIPS every completed slice outright (its manifest has all
  four stages) and resumes the in-flight slice at its last completed
  stage — per-partition checkpointing built from per-stage manifests;
* slice membership is a pure function of (url, n_slices), so resuming
  with a different ``n_slices`` would silently re-shard — the
  top-level ``slices.json`` lineage records it and a mismatch REFUSES;
* the result needs no merge to be searchable:
  `search/multislice.MultiSliceIndex` over the slice dirs is
  score-identical to a monolithic build (externally gated via
  ``multislice_bm25_topk``); `index/merge.merge_indexes` compacts
  when wanted.

Reference contrast: `index/IndexCollection.java` restarts from
zero on failure (Lucene writers are process-local); here the unit of
lost work is one stage of one slice.

Cost note: slicing multiplies the fixed per-stage scheduling cost by
``n_slices``, each slice's shuffle moves 1/n of the data, and the
CORPUS SCAN runs once per slice (the crc32 filter prunes rows before
the extraction kernel, but parquet bytes are read n times — that
read amplification is the price of slice-independent resume; column
pruning keeps it to the url/text columns). Pick ``n_slices`` ~
(acceptable lost work) not ~ (cluster size).
"""

from __future__ import annotations

import dataclasses
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import IndexConfig, build_index

_STAGES = ("docvec", "blocks", "dictionary", "stats")


def _slice_dir(out_dir: str, i: int) -> str:
    return os.path.join(out_dir, f"slice={i:05d}")


def _slice_complete(d: str) -> bool:
    path = os.path.join(d, "manifest.json")
    if not os.path.exists(path):
        return False
    with open(path) as f:
        man = json.load(f)
    return all(s in man for s in _STAGES)


def build_sliced_index(spark: SparkSession, corpus: DataFrame,
                       cfg: IndexConfig, n_slices: int) -> list[str]:
    """Build ``n_slices`` disjoint index slices under ``cfg.out_dir``;
    returns the slice dirs (feed to ``MultiSliceIndex`` or
    ``merge_indexes``). Resumable at slice granularity, and within
    the in-flight slice at stage granularity."""
    if n_slices < 1:
        raise ValueError(f"n_slices must be >= 1: {n_slices}")
    lineage_path = os.path.join(cfg.out_dir, "slices.json")
    lineage = {
        "n_slices": n_slices,
        "hash": "crc32(url) % n_slices",
        "analyzer": cfg.analyzer,
        "slices": [f"slice={i:05d}" for i in range(n_slices)],
    }
    if os.path.exists(lineage_path):
        with open(lineage_path) as f:
            prior = json.load(f)
        if prior["n_slices"] != n_slices or prior["hash"] != lineage["hash"]:
            raise ValueError(
                f"{cfg.out_dir} was started with n_slices="
                f"{prior['n_slices']} ({prior['hash']}); resuming with "
                f"n_slices={n_slices} would re-shard slice membership "
                "and duplicate/drop documents — finish with the "
                "original slicing or start a fresh out_dir")
    else:
        os.makedirs(cfg.out_dir, exist_ok=True)
        tmp = lineage_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(lineage, f, indent=2)
        os.replace(tmp, lineage_path)

    dirs = []
    for i in range(n_slices):
        d = _slice_dir(cfg.out_dir, i)
        dirs.append(d)
        if _slice_complete(d):
            continue
        part = corpus.filter(F.crc32(F.col("url")) % n_slices == i)
        build_index(spark, part, dataclasses.replace(cfg, out_dir=d))
    return dirs
