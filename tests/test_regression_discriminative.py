"""Discriminative metric-level regression gate (round-4 verdict task 4).

The 30-doc harness in test_regression_metrics.py pins near-saturated
values (MAP≈0.92, MRR=1.0) where BM25 == QLD == RM3 — it catches gross
breakage but not ranking regressions. This fixture is built so the
similarities genuinely disagree, the way real regressions differ
(reference: `src/main/resources/regression/msmarco-passage.yaml` pins
distinct map for bm25-default vs bm25-tuned vs +rm3):

* ~1K docs, 20 topics, graded qrels derived from a generative topic
  model (relevance is ground truth, NOT retrieval output);
* grade-2 docs: short + dense in all 3 topic terms (tf saturation and
  length normalization both matter);
* grade-1 "partial" docs: 1 topic term, long (k1/b/μ trade-offs
  re-rank these against hard negatives);
* grade-1 "context-only" docs: ZERO query terms but heavy topic-context
  vocabulary — only reachable through RM3 expansion, so RM3 recall/MAP
  must exceed BM25's;
* judged-0 hard negatives: one stray topic term inside long background
  text;
* 800 Zipf background docs.

Gate property (asserted, not hoped): BM25 ≠ QLD ≠ RM3 on the pinned
4-decimal metrics, and a deliberate k1 perturbation (0.9 → 1.2) trips
the BM25 pin.
"""

import numpy as np
import pytest

from tests.test_regression_metrics import pure_python_metrics

SEED = 1505
N_TOPICS = 20
N_BG_DOCS = 800
VOCAB = 2000

# pinned 4-decimal metrics — the discriminative regression gate
PINNED = {
    "bm25": {"mrr@10": 1.0, "map": 0.8043, "recall@1000": 0.8333,
             "p@30": 0.3333, "ndcg@20": 0.9228,
             "gd_ndcg@20": 0.9407, "err@20": 0.3568},
    "qld": {"mrr@10": 1.0, "map": 0.8111, "recall@1000": 0.8333,
            "p@30": 0.3333, "ndcg@20": 0.9241,
            "gd_ndcg@20": 0.9416, "err@20": 0.3569},
    "rm3": {"mrr@10": 1.0, "map": 0.968, "recall@1000": 1.0,
            "p@30": 0.4, "ndcg@20": 0.9912,
            "gd_ndcg@20": 0.9908, "err@20": 0.3596},
    # RSJ feedback reaches the context-only docs like RM3 (recall 1.0)
    # but weights them differently — a fourth distinct ranking
    "bm25prf": {"mrr@10": 1.0, "map": 0.9881, "recall@1000": 1.0,
                "p@30": 0.4, "ndcg@20": 0.983,
                "gd_ndcg@20": 0.9764, "err@20": 0.3559},
}
# k1=1.2 moves bm25 to map 0.8111 / ndcg@20 0.9279 — the perturbation
# gate test below asserts the pin trips.


def make_fixture():
    """Deterministic (seeded PCG64, driver-side) corpus + topics + qrels."""
    rng = np.random.default_rng(SEED)
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    weights = ranks ** -1.0
    cdf = np.cumsum(weights / weights.sum())

    def bg(n):
        return [f"w{i}" for i in np.searchsorted(cdf, rng.random(n))]

    def doc(words):
        return " ".join(np.array(words)[rng.permutation(len(words))])

    docs, qrels, topics = [], [], {}
    did = 0

    def add(words, qid=None, grade=None):
        nonlocal did
        docid = f"d{did:05d}"
        docs.append((docid, doc(words)))
        if qid is not None:
            qrels.append((qid, docid, grade))
        did += 1

    for q in range(1, N_TOPICS + 1):
        terms = [f"alpha{q}", f"beta{q}", f"gamma{q}"]
        ctx = [f"ctx{q}x{j}" for j in range(6)]
        topics[q] = " ".join(terms)
        # 4 × grade-2: dense, short
        for i in range(4):
            add(terms * (3 + i % 2) + ctx[:3] * 2 + bg(15 + 5 * i), q, 2)
        # 4 × grade-1 partial: one topic term (1-2×), long
        for i in range(4):
            add([terms[i % 3]] * (1 + i % 2) + ctx[2:5] + bg(120 + 40 * i),
                q, 1)
        # crossover pair: grade-2 short high-tf single-term vs grade-1
        # long two-term. BM25's tf-saturation/length trade-off puts the
        # score crossover at k1≈1.05 (solved for avgdl≈117, idf from the
        # per-topic dfs), so the k1=0.9→1.2 perturbation flips their
        # order and moves ndcg@20 — the gate-tripping property below.
        add([terms[0]] * 4 + bg(49), q, 2)
        add([terms[0], terms[1]] + bg(232), q, 1)
        # 2 × grade-1 context-only: reachable only via feedback expansion
        for i in range(2):
            add(ctx * 3 + bg(60 + 10 * i), q, 1)
        # 3 × judged-0 hard negatives
        for i in range(3):
            add([terms[(i + 1) % 3]] + bg(150 + 10 * i), q, 0)
    for i in range(N_BG_DOCS):
        add(bg(30 + int(rng.integers(0, 170))))
    return docs, topics, qrels


@pytest.fixture(scope="module")
def disc(spark, tmp_path_factory):
    from anserini_spark.index.build import IndexConfig, build_index
    from anserini_spark.search.searcher import InvertedIndex

    docs, topics, qrels = make_fixture()
    rows = [(f"https://disc/{d}", t, "en") for d, t in docs]
    corpus = spark.createDataFrame(rows, "url string, text string, lang string")
    out = str(tmp_path_factory.mktemp("discidx") / "idx")
    build_index(spark, corpus, IndexConfig(out_dir=out, analyzer="porter",
                                           doc_partitions=4,
                                           block_partitions=4))
    qrels_rows = [(q, f"https://disc/{d}", g) for q, d, g in qrels]
    qrels_df = spark.createDataFrame(qrels_rows,
                                     "qid int, docid string, grade int")
    return InvertedIndex(spark, out), topics, qrels_df, qrels_rows


def _run_for(sim, index, topics, k1=0.9, b=0.4):
    from anserini_spark.search.bm25 import BM25Params
    from anserini_spark.search.qld import search_qld
    from anserini_spark.search.rm3 import search_rm3
    from anserini_spark.search.searcher import search_kernel

    params = BM25Params(k1=k1, b=b, k=1000)
    if sim == "bm25":
        return search_kernel(index, topics, params)
    if sim == "qld":
        return search_qld(index, topics, mu=1000.0, k=1000)
    if sim == "bm25prf":
        from anserini_spark.search.bm25prf import search_bm25prf

        hits, _ = search_bm25prf(index, topics, params)
        return hits
    hits, _ = search_rm3(index, topics, params)
    return hits


@pytest.mark.parametrize("sim", ["bm25", "qld", "rm3", "bm25prf"])
def test_discriminative_pinned_metrics(spark, disc, sim):
    from anserini_spark.eval.metrics import evaluate

    index, topics, qrels_df, qrels_rows = disc
    run = _run_for(sim, index, topics)
    got = evaluate(run, qrels_df)
    rows = run.select("qid", "docid", "rank", "score").collect()
    # engine metrics == independent pure-Python recompute
    assert got == pure_python_metrics(rows, qrels_rows), sim
    assert got == PINNED[sim], (sim, got)


def test_similarities_disagree():
    """The fixture is discriminative: each pair of similarities differs
    on at least one pinned metric (the thing regressions catch)."""
    names = list(PINNED)
    for i, a in enumerate(names):
        for bname in names[i + 1:]:
            assert PINNED[a] != PINNED[bname], (a, bname)
    # and feedback expansion reaches docs BM25 cannot (context-only)
    assert PINNED["rm3"]["recall@1000"] > PINNED["bm25"]["recall@1000"]
    assert PINNED["bm25prf"]["recall@1000"] > PINNED["bm25"]["recall@1000"]


def test_axiom_digit_vocab_identity_fallback(spark, disc):
    """The axiomatic reranker's pool-term noise filter keeps only
    ^[a-z]{2,}$ (`AxiomReranker.extractTerms:353-398`); this fixture's
    topic terms carry digits (alpha1...), so every query term is
    filtered from the pool lists, no term scores survive, and the
    engine must fall back to the ORIGINAL query — rank-identical to
    plain BM25, not empty and not reweighted."""
    from anserini_spark.search.axiom import search_axiom
    from anserini_spark.search.bm25 import BM25Params
    from anserini_spark.search.searcher import search_kernel

    index, topics, qrels_df, _ = disc
    sub = {q: topics[q] for q in list(topics)[:3]}
    p = BM25Params(k1=0.9, b=0.4, k=50)
    hits, boosts = search_axiom(index, sub, p)
    assert boosts == {}
    base = [(r["qid"], r["docid"], r["rank"])
            for r in search_kernel(index, sub, p).collect()]
    got = [(r["qid"], r["docid"], r["rank"]) for r in hits.collect()]
    assert sorted(got) == sorted(base)


def test_k1_perturbation_trips_gate(spark, disc):
    """A deliberate parameter drift (k1 0.9→1.2, the reference's
    default-vs-tuned spread) must change the pinned metrics — proof the
    gate can actually catch a scoring regression."""
    from anserini_spark.eval.metrics import evaluate

    index, topics, qrels_df, _ = disc
    run = _run_for("bm25", index, topics, k1=1.2)
    got = evaluate(run, qrels_df)
    assert got != PINNED["bm25"], "gate is not discriminative for k1"
