"""Index-compatibility gates (`index/versioning.py`): both the
distributed engine and the no-Spark LocalSearcher must refuse an
index whose analyzer chain drifted, with a distinct message for
pre-versioning manifests (one-time rebuild, MIGRATION.md)."""

import json
import os
import shutil

import pytest

from anserini_spark.search.local import LocalSearcher
from anserini_spark.search.searcher import InvertedIndex


def _clone_with_lineage(tiny_index, tmp_path, mutate):
    out = str(tmp_path / "clone")
    shutil.copytree(tiny_index, out)
    mp = os.path.join(out, "manifest.json")
    with open(mp) as f:
        man = json.load(f)
    mutate(man["docvec"]["lineage"])
    with open(mp, "w") as f:
        json.dump(man, f)
    return out


def test_local_searcher_refuses_drifted_analyzer(tiny_index, tmp_path):
    out = _clone_with_lineage(
        tiny_index, tmp_path,
        lambda ln: ln.update(analysis_version="bogus-av"))
    with pytest.raises(ValueError, match="analyzer version"):
        LocalSearcher(out)


def test_local_searcher_refuses_unversioned_manifest(tiny_index, tmp_path):
    out = _clone_with_lineage(
        tiny_index, tmp_path,
        lambda ln: ln.pop("analysis_version", None))
    with pytest.raises(ValueError, match="predates analyzer versioning"):
        LocalSearcher(out)


def test_inverted_index_unversioned_message(spark, tiny_index, tmp_path):
    """The distributed engine distinguishes the pre-versioning case
    too (the old message claimed the analyzer 'changed since it was
    built', which is wrong for indexes that predate the gate)."""
    out = _clone_with_lineage(
        tiny_index, tmp_path,
        lambda ln: ln.pop("analysis_version", None))
    with pytest.raises(ValueError, match="predates analyzer versioning"):
        InvertedIndex(spark, out)


def test_gates_pass_on_fresh_index(spark, tiny_index):
    assert InvertedIndex(spark, tiny_index).stats["num_docs"] > 0
    assert LocalSearcher(tiny_index).search("spark", k=1) is not None
