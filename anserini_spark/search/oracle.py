"""Slow-but-obviously-correct single-process BM25 oracle (pure
numpy/pandas, no Spark). Generates golden top-k runs for the test
suite — the analogue of the reference's pinned end-to-end outputs
(`integration/TrecEndToEndTest.java:83-126`). Arithmetic matches
`search/bm25.py` (float32 contributions, float64 accumulation,
float32 narrow), tie-break (score desc, url asc), tie adjustment
per `rerank/lib/ScoreTiesAdjusterReranker.java:36-73`.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Callable, Dict, List, Tuple

import numpy as np

from .bm25 import BM25Params, idf


def oracle_topk(
    docs: Dict[str, str],
    queries: Dict[int, str],
    analyze: Callable[[str], List[str]],
    params: BM25Params,
) -> Dict[int, List[Tuple[str, int, float]]]:
    """docs: url -> text. Returns qid -> [(url, rank, adjusted_score)]."""
    # index
    tf: Dict[str, Dict[str, int]] = {}
    doclen: Dict[str, int] = {}
    dfreq: Dict[str, int] = defaultdict(int)
    for url, text in docs.items():
        toks = analyze(text)
        c = Counter(toks)
        tf[url] = dict(c)
        doclen[url] = len(toks)
        for t in c:
            dfreq[t] += 1
    doc_count = sum(1 for v in doclen.values() if v > 0)
    sum_tf = sum(doclen.values())
    avgdl = sum_tf / doc_count if doc_count else 0.0

    c1 = np.float32(params.k1) * (np.float32(1.0) - np.float32(params.b))
    c2 = np.float32(params.k1) * np.float32(params.b) / np.float32(avgdl)

    out: Dict[int, List[Tuple[str, int, float]]] = {}
    for qid, qtext in queries.items():
        qtoks = analyze(qtext)
        wmap: Dict[str, np.float32] = {}
        for t in qtoks:
            if dfreq.get(t, 0) == 0:
                continue
            w = np.float32(idf(dfreq[t], doc_count))
            wmap[t] = np.float32(wmap.get(t, np.float32(0.0)) + w)
        scores: Dict[str, float] = defaultdict(float)  # float64 accumulator
        for url in docs:
            for t, w in wmap.items():
                f = tf[url].get(t)
                if f:
                    tf32 = np.float32(f)
                    dl = doclen[url]
                    if params.lossy:
                        from .smallfloat import byte4_to_int, int_to_byte4

                        dl = byte4_to_int(int_to_byte4(dl))
                    dl32 = np.float32(dl)
                    contrib = np.float32(w * tf32 / (tf32 + c1 + c2 * dl32))
                    scores[url] += float(contrib)
        hits = [(url, np.float32(s)) for url, s in scores.items() if s > 0]
        hits.sort(key=lambda x: (-x[1], x[0]))
        hits = hits[: params.k]
        # tie adjustment (round 1e-4, perturb runs by 1e-6*dup)
        adjusted: List[Tuple[str, int, float]] = []
        prev_round = None
        dup = 0
        for rank, (url, s) in enumerate(hits, start=1):
            r = round(float(s), 4)
            if prev_round is not None and r == prev_round:
                dup += 1
            else:
                dup = 0
            prev_round = r
            adjusted.append((url, rank, r - dup * 1e-6))
        out[qid] = adjusted
    return out
