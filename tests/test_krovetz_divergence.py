"""Pinned krovetz-vs-porter rank-divergence gate (round-4 verdict
task 3): the measured divergence numbers on real English text
(robust04 topic statements, first 60 topics) are pinned to 4
decimals. A KStem lexicon or stemmer-rule change that moves RANKINGS
— not merely token streams — trips this; pure token-stream drift
without rank impact does not (that is the analysis_version gate's
job). Full-250-topic numbers live in COVERAGE.md
(scripts/krovetz_divergence.py)."""

import os

import pytest

from scripts.krovetz_divergence import (
    kendall_tau_a,
    load_topic_statements,
    measure,
)

PINNED_60 = {
    "mean_overlap_at10": 0.9487,
    "min_overlap_at10": 0.4,
    "mean_kendall_tau": 0.9466,
    "identical_top10_pct": 81.7,
}


def test_kendall_tau_a_unit():
    assert kendall_tau_a({"a": 1, "b": 2, "c": 3},
                         {"a": 1, "b": 2, "c": 3}) == 1.0
    assert kendall_tau_a({"a": 1, "b": 2}, {"a": 2, "b": 1}) == -1.0
    assert kendall_tau_a({"a": 1, "b": 2, "c": 3},
                         {"a": 1, "b": 3, "c": 2}) == pytest.approx(1 / 3)
    assert kendall_tau_a({"a": 1}, {"a": 5}) == 1.0  # < 2 shared docs


@pytest.mark.skipif(not os.path.exists(
    "/root/reference/src/main/resources/topics-and-qrels/"
    "topics.robust04.txt"), reason="reference checkout not present")
def test_divergence_pinned(spark, tmp_path):
    tops = load_topic_statements(limit=3)
    assert tops[0][0] == 301
    assert tops[0][1] == "International Organized Crime"
    assert "international criminal" in tops[0][2]

    report = measure(spark, topics_limit=60, k=50, tmp=str(tmp_path))
    got = {k: report[k] for k in PINNED_60}
    assert got == PINNED_60, report
