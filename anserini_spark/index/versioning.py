"""Index-compatibility gates shared by every reader.

Two lineage keys recorded at build time must match the running engine
before an index may serve queries (reference analogue: Lucene refuses
indexes from incompatible codec versions at `SegmentInfos` open):

* ``seg_shift`` — the doc-id bit layout. A mismatch would silently
  mis-slot every doc in the dense per-segment accumulators.
* ``analysis_version`` — a content hash of the analyzer chain + its
  lexicon data. Querying with a drifted analyzer (e.g. a grown KStem
  lexicon) would silently degrade ranking instead of failing.

Pure-python (no pyspark import) so the low-latency ``LocalSearcher``
serving path enforces the same gates as the distributed engine.
"""

from __future__ import annotations

from typing import Optional


def check_seg_shift(manifest: dict, index_dir: str,
                    engine_shift: int) -> None:
    """Refuse an index whose id layout differs from the engine's.
    Absent key = the pre-round-4 40-bit layout."""
    built_shift = manifest["docvec"].get("seg_shift", 40)
    if built_shift != engine_shift:
        raise ValueError(
            f"index {index_dir} was built with SEG_SHIFT="
            f"{built_shift}, engine uses {engine_shift}; rebuild the "
            "index (stale cached dir?)")


def check_analysis_version(manifest: dict, index_dir: str) -> None:
    """Refuse an index whose analyzer chain/lexicon no longer matches
    the running engine's. Distinguishes a genuine drift from a
    pre-versioning manifest (no ``analysis_version`` lineage key —
    those indexes predate the gate and need a one-time rebuild, see
    MIGRATION.md)."""
    from ..analysis.analyzer import analysis_version

    analyzer = manifest["docvec"]["lineage"]["analyzer"]
    cur_av = analysis_version(analyzer)
    built_av: Optional[str] = manifest["docvec"]["lineage"].get(
        "analysis_version", "ws1" if analyzer == "ws" else None)
    if built_av == cur_av:
        return
    if built_av is None:
        raise ValueError(
            f"index {index_dir} predates analyzer versioning (no "
            "analysis_version in its manifest lineage), so the engine "
            f"cannot prove its '{analyzer}' token stream matches the "
            f"current chain ({cur_av}); rebuild once to record the "
            "version (MIGRATION.md: analyzer versioning)")
    raise ValueError(
        f"index {index_dir} was built with analyzer version "
        f"{built_av}, engine's '{analyzer}' chain is now "
        f"{cur_av}; rebuild the index (analyzer/lexicon "
        "changed since it was built)")
