"""Axiomatic reranker (deterministic mode) — brute-force-verified like
BM25PRF: the expansion weights are recomputed from scratch in the test
(pool docvecs -> inverted lists -> four-cell MI -> idf scaling ->
aggregation) and must match `axiom_boosts` exactly; determinism,
cascade wiring, and expansion-improves-the-expected-doc behavior are
pinned on a handmade corpus.
"""

import math
from collections import defaultdict

import pytest

DOCS = [
    # a tight "solar" cluster where "panel"/"sunlight" co-occur with
    # the query term -> they must surface as expansion terms
    ("https://ax/1", "solar panel arrays capture sunlight for power"),
    ("https://ax/2", "solar panel farms turn sunlight into power"),
    ("https://ax/3", "solar cells and panel inverters supply power"),
    ("https://ax/4", "rooftop solar panel kits store sunlight energy"),
    # docs about panels WITHOUT the word solar: expansion should let
    # the expanded query reach them
    ("https://ax/5", "panel efficiency improves with sunlight tracking"),
    ("https://ax/6", "cheap panel mounts and sunlight sensors shipped"),
    # noise
    ("https://ax/7", "river fishing tips for early spring mornings"),
    ("https://ax/8", "baking sourdough needs patience and good flour"),
    ("https://ax/9", "city council debates new bicycle lane budgets"),
    ("https://ax/10", "opera season opens with a classic production"),
    ("https://ax/11", "mountain weather changes fast above the ridge"),
    ("https://ax/12", "antique clocks require careful spring repairs"),
]


@pytest.fixture(scope="module")
def ax_index(spark, tmp_path_factory):
    from anserini_spark.index.build import IndexConfig, build_index
    from anserini_spark.search.searcher import InvertedIndex

    corpus = spark.createDataFrame(
        [(u, t, "en") for u, t in DOCS], "url string, text string, lang string")
    out = str(tmp_path_factory.mktemp("axidx") / "idx")
    build_index(spark, corpus, IndexConfig(out_dir=out, analyzer="none",
                                           doc_partitions=1,
                                           block_partitions=1))
    return InvertedIndex(spark, out)


def _brute_boosts(index, qtext, pools, beta, m, doc_count):
    """From-scratch recompute of AxiomReranker.computeTermScore over a
    known pool (analyzer='none' -> tokens are plain lowercased words)."""
    from anserini_spark.analysis.analyzer import analyze

    text_of = dict(DOCS)
    inv = defaultdict(set)
    for url in pools:
        # same analysis chain the index used (stem='none' still strips
        # stopwords); the MI/idf/aggregation math below stays a
        # from-scratch recompute
        for t in set(analyze(text_of[url], stem="none")):
            if len(t) >= 2 and t.isalpha() and t == t.lower():
                inv[t].add(url)
    total = len({u for s in inv.values() for u in s})

    def mi(x, y):
        x1, y1 = len(x), len(y)
        x0, y0 = total - x1, total - y1
        if 0 in (x1, x0, y1, y0):
            return 0.0
        n11 = len(x & y)
        cells = ((total - x1 - y1 + n11, x0, y0), (y1 - n11, x0, y1),
                 (x1 - n11, x1, y0), (n11, x1, y1))
        out = 0.0
        for cnt, nx, ny in cells:
            p = cnt / total
            if p != 0:
                out += p * math.log(p * total * total / (nx * ny))
        return out

    qtoks = index.analyze_query(qtext)
    dfs = index.term_dfs(set(qtoks))
    qcounts = defaultdict(int)
    for t in qtoks:
        qcounts[t] += 1
    agg = defaultdict(float)
    for qt, qtf in qcounts.items():
        if dfs.get(qt, 0) == 0 or qt not in inv:
            continue
        idf = math.log((1 + doc_count) // dfs[qt])
        self_mi = mi(inv[qt], inv[qt])
        scored = []
        for t, s in inv.items():
            score = (idf * qtf if t == qt
                     else idf * beta * qtf * mi(inv[qt], s) / self_mi)
            scored.append((t, score))
        scored.sort(key=lambda kv: (-kv[1], kv[0].lower()))
        for t, score in scored[:1000]:
            if score > 1e-8:
                agg[t] += score
    ranked = sorted(((t, s / len(qtoks)) for t, s in agg.items()),
                    key=lambda kv: (-kv[1], kv[0].lower()))
    return dict(ranked[:m])


def test_axiom_boosts_match_bruteforce(spark, ax_index):
    from anserini_spark.search.axiom import axiom_boosts, _select_pool
    from anserini_spark.search.bm25 import BM25Params
    from anserini_spark.search.searcher import search_kernel

    queries = {1: "solar power"}
    params = BM25Params(k1=0.9, b=0.4, k=1000)
    first = search_kernel(ax_index, queries, params)
    got = axiom_boosts(ax_index, queries, first, r=4, n=2, beta=0.4,
                       m=10, seed=42)
    pools = _select_pool(ax_index, first, [1], 4, 2, 42)
    want = _brute_boosts(ax_index, "solar power", pools[1], 0.4, 10,
                         len(DOCS))
    assert set(got[1]) == set(want)
    for t, w in want.items():
        assert got[1][t] == pytest.approx(w, abs=1e-12), t


def test_axiom_pool_is_deterministic_and_padded(spark, ax_index):
    from anserini_spark.search.axiom import _select_pool
    from anserini_spark.search.bm25 import BM25Params
    from anserini_spark.search.searcher import search_kernel

    first = search_kernel(ax_index, {1: "solar power"},
                          BM25Params(k=1000))
    p1 = _select_pool(ax_index, first, [1], 3, 3, 42)
    p2 = _select_pool(ax_index, first, [1], 3, 3, 42)
    assert p1 == p2                      # same seed -> same pool
    assert len(p1[1]) == 9               # padded to r*n
    assert len(set(p1[1])) == 9          # no duplicates
    p3 = _select_pool(ax_index, first, [1], 3, 3, 7)
    assert len(p3[1]) == 9               # different seed still padded


def test_axiom_expansion_reaches_unqueried_docs(spark, ax_index):
    """'solar' never occurs in docs 5/6, but the MI expansion pulls in
    co-occurring terms (panel/sunlight), so the expanded query ranks
    them above the noise docs."""
    from anserini_spark.search.axiom import search_axiom
    from anserini_spark.search.bm25 import BM25Params

    hits, boosts = search_axiom(ax_index, {1: "solar"},
                                BM25Params(k1=0.9, b=0.4, k=12),
                                r=4, n=2, beta=0.4, m=8, seed=42)
    assert "solar" in boosts[1]
    assert "panel" in boosts[1] or "sunlight" in boosts[1]
    got = {r["docid"]: r["rank"] for r in hits.collect()}
    assert "https://ax/5" in got and "https://ax/6" in got
    assert got["https://ax/5"] < got.get("https://ax/7", 99)


def test_axiom_via_simple_searcher_cascade(spark, ax_index, tmp_path):
    from anserini_spark.search.searcher import SimpleSearcher

    s = SimpleSearcher(spark, ax_index.dir)
    s.set_axiom(r=4, n=2, beta=0.4, m=8, seed=42)
    with_ax = s.search("solar", k=12)
    s.unset_axiom()
    plain = s.search("solar", k=12)
    ax_docs = {d for d, _, _ in with_ax}
    plain_docs = {d for d, _, _ in plain}
    # expansion retrieves the panel-only docs plain BM25 cannot see
    assert "https://ax/5" in ax_docs and "https://ax/5" not in plain_docs
