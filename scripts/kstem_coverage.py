"""Measure KStem lexicon token-mass coverage on the reference's own
English topic files (robust04 / core18 / adhoc) — the number quoted
in `analysis/krovetz.py`'s scope note and COVERAGE.md.

A content token "resolves" when the word itself, or its kstem() stem,
is a lexicon headword — i.e. the dictionary gate actually fires for
it instead of falling back to leave-unchanged. Proper-noun share of
the misses is reported separately (identity IS real KStem behavior
for out-of-dictionary proper names).

    python scripts/kstem_coverage.py [--top 40]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from anserini_spark.analysis import krovetz as kv          # noqa: E402
from anserini_spark.analysis.analyzer import tokenize      # noqa: E402
from anserini_spark.analysis.stopwords import (            # noqa: E402
    ENGLISH_STOP_WORDS,
)

TOPIC_FILES = [
    "/root/reference/src/main/resources/topics-and-qrels/"
    "topics.robust04.txt",
    "/root/reference/src/main/resources/topics-and-qrels/"
    "topics.core18.txt",
    "/root/reference/src/main/resources/topics-and-qrels/"
    "topics.adhoc.51-100.txt",
]

_TAG_RE = re.compile(r"<[^>]+>|Number:|Description:|Narrative:|Topic:")


def content_tokens():
    """Lowercased alphabetic content tokens (stopwords removed) from
    every available topic file, plus the set of words that appeared
    capitalized mid-text (proper-noun heuristic)."""
    toks: list[str] = []
    caps: set[str] = set()
    for path in TOPIC_FILES:
        if not os.path.exists(path):
            continue
        text = _TAG_RE.sub(" ", open(path, encoding="utf-8",
                                     errors="replace").read())
        for m in re.finditer(r"(?<![.!?]\s)(?<!^)\b[A-Z][a-z]+", text):
            caps.add(m.group(0).lower())
        for t in tokenize(text):
            t = t.lower()
            if t.isalpha() and t not in ENGLISH_STOP_WORDS:
                toks.append(t)
    return toks, caps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    toks, caps = content_tokens()
    counts = Counter(toks)
    total = sum(counts.values())
    resolved = 0
    miss_mass: Counter = Counter()
    for w, c in counts.items():
        # < 3 chars: kstem() passes these through BY CONTRACT
        # (KStemFilter's own guard) — the lexicon gate never runs, so
        # they are contract-resolved, not dictionary misses
        if len(w) < 3 or kv._in_dict(w) or kv._in_dict(kv.kstem(w)):
            resolved += c
        else:
            miss_mass[w] += c
    miss_total = sum(miss_mass.values())
    cap_miss = sum(c for w, c in miss_mass.items() if w in caps)
    print(f"content tokens: {total} ({len(counts)} unique)")
    print(f"token-mass resolves-to-headword: {resolved / total:.4f}")
    print(f"miss mass: {miss_total} "
          f"({cap_miss / max(1, miss_total):.1%} proper-noun-ish)")
    print("top misses (word, mass, proper-noun?):")
    for w, c in miss_mass.most_common(args.top):
        print(f"  {w:20s} {c:4d} {'P' if w in caps else ''}")


if __name__ == "__main__":
    main()
