"""Persisted IVF index (`index/ivf.py`): build-once/search-many
contract, partition-pruned probes, and agreement with the
retrain-per-call path."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ivf_dir(spark, tmp_path_factory):
    from anserini_spark.index.ivf import build_ivf_index
    from anserini_spark.ops.similarity import _emb

    out = str(tmp_path_factory.mktemp("ivf") / "idx")
    e = _emb(spark, "/root/testdata/sf0.001").select("vec_id", "embedding")
    man = build_ivf_index(spark, e, out, nlist=8, sample_n=512)
    return out, man


def test_build_layout(spark, ivf_dir):
    out, man = ivf_dir
    assert man["nlist"] == 8 and man["num_vectors"] > 0
    assert os.path.exists(os.path.join(out, "manifest.json"))
    # cell-partitioned directory layout = directory-level pruning
    cells_dir = os.path.join(out, "cells.parquet")
    parts = [d for d in os.listdir(cells_dir) if d.startswith("cell=")]
    assert len(parts) >= 2


def test_search_no_refit(spark, ivf_dir, monkeypatch):
    """Opening + searching a built index must never re-train the
    quantizer (the round-5 gate re-fit per call)."""
    import anserini_spark.index.ivf as ivf_mod
    from anserini_spark.index.ivf import IVFIndex

    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("kmeans re-fit on the search path")

    monkeypatch.setattr(ivf_mod, "_kmeans", boom)
    out, man = ivf_dir
    idx = IVFIndex(spark, out)
    q = [1.0] + [0.0] * (man["dim"] - 1)
    r1 = idx.search(q, k=5, nprobe=2).collect()
    r2 = idx.search(q, k=5, nprobe=2).collect()
    assert r1 == r2 and len(r1) == 5


def test_full_probe_matches_brute_force(spark, ivf_dir):
    from anserini_spark.index.ivf import IVFIndex
    from anserini_spark.ops.similarity import _emb, cosine_topk

    out, man = ivf_dir
    idx = IVFIndex(spark, out)
    e = _emb(spark, "/root/testdata/sf0.001")
    from pyspark.sql import functions as F

    q = e.filter(F.col("vec_id") == 0).first()
    got = idx.search(list(q["embedding"]), k=10,
                     nprobe=man["nlist"], exclude_vec_id=0).collect()
    brute = cosine_topk(spark, "/root/testdata/sf0.001").collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == \
        [(r["vec_id"], r["cosine"]) for r in brute]


def test_probe_plan_prunes_partitions(spark, ivf_dir):
    """The probed scan must carry the cell partition filter so only
    probed directories are read."""
    from anserini_spark.index.ivf import IVFIndex

    out, man = ivf_dir
    idx = IVFIndex(spark, out)
    q = [1.0] + [0.0] * (man["dim"] - 1)
    probe = idx.probe_cells(np.asarray(q, dtype=np.float64), 2)
    df = idx.cells.filter(idx.cells.cell.isin(probe))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
