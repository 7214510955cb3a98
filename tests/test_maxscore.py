"""MaxScore/block-max pruned kernel vs brute-force dense scoring —
property-style randomized identity test, no Spark session (drives
``_segment_score_fn`` directly on encoded blocks)."""

import numpy as np
import pandas as pd

from anserini_spark.index.blocks import encode_blocks
from anserini_spark.search.searcher import _segment_score_fn


def _mk_segment(rng, n_docs, terms, zipf_df):
    rows = []
    doclens = rng.integers(10, 500, n_docs)
    for t, df_frac in zip(terms, zipf_df):
        ndocs = max(1, int(n_docs * df_frac))
        docs = np.sort(rng.choice(n_docs, ndocs, replace=False))
        tfs = rng.integers(1, 8, ndocs)
        for d, f in zip(docs, tfs):
            rows.append((t, 0, int(d), int(f), int(doclens[d])))
    rows.sort(key=lambda r: (r[0], r[2]))
    bl = encode_blocks(
        np.array([r[0] for r in rows], dtype=object),
        np.array([r[1] for r in rows]),
        np.array([r[2] for r in rows]),
        np.array([r[3] for r in rows]),
        np.array([r[4] for r in rows]),
    )
    return bl, rows


def _run(fn_prune, fn_dense, pdf, k):
    a = fn_prune(pdf.copy())
    b = fn_dense(pdf.copy())

    def norm(df):
        # kernel emits packed per-qid arrays (possibly a superset of
        # the top-k when scores tie at the kth boundary); explode,
        # apply the deterministic (score desc, doc asc) order, cut to k
        out = {}
        for _, row in df.iterrows():
            out.setdefault(int(row["qid"]), []).extend(
                (int(d), float(np.float32(s)))
                for d, s in zip(row["doc_id"], row["score"])
            )
        return {
            qid: sorted(pairs, key=lambda p: (-p[1], p[0]))[:k]
            for qid, pairs in out.items()
        }

    return norm(a), norm(b)


def test_maxscore_identical_to_dense():
    rng = np.random.default_rng(23)
    n_docs = 4000
    terms = [f"t{i}" for i in range(12)]
    zipf_df = [0.6, 0.4, 0.25, 0.15, 0.1, 0.06, 0.04, 0.02, 0.01,
               0.005, 0.002, 0.0005]
    bl, _ = _mk_segment(rng, n_docs, terms, zipf_df)
    weights = {}
    for qid in range(1, 21):
        qterms = rng.choice(len(terms), rng.integers(1, 6), replace=False)
        # idf-like weights: rare terms heavy
        weights[qid] = {
            terms[i]: np.float32(1.0 / max(zipf_df[i], 1e-3) ** 0.5)
            for i in qterms
        }
    seg_counts = {0: n_docs}
    for k in (5, 50, 1000):
        fn_p = _segment_score_fn(weights, (0.54, 0.0036), seg_counts, k, True)
        fn_d = _segment_score_fn(weights, (0.54, 0.0036), seg_counts, k, False)
        got, want = _run(fn_p, fn_d, bl, k)
        assert got.keys() == want.keys()
        for qid in want:
            assert got[qid] == want[qid], f"qid {qid} k={k}"


def test_maxscore_single_term_and_tiny_k():
    rng = np.random.default_rng(5)
    bl, _ = _mk_segment(rng, 500, ["only"], [0.5])
    weights = {1: {"only": np.float32(2.0)}}
    fn_p = _segment_score_fn(weights, (0.54, 0.004), {0: 500}, 1, True)
    fn_d = _segment_score_fn(weights, (0.54, 0.004), {0: 500}, 1, False)
    got, want = _run(fn_p, fn_d, bl, 1)
    assert got == want
