"""Sequential Dependence Model retrieval — the reference's
`search/query/SdmQueryGenerator.java:36-88`: a weighted combination of

* bag-of-words term queries              (weight 0.85)
* ordered pair windows,   SpanNear(slop=1, ordered)   (weight 0.1)
* unordered pair windows, SpanNear(slop=8, unordered) (weight 0.05)

over consecutive query-term pairs. Needs a positional index
(``IndexConfig(store_positions=True)`` — the ``-storePositions``
analogue; positions preserve stopword gaps like Lucene's StopFilter).

Window semantics implemented here (documented precisely since Lucene's
sloppy-span scoring is not bit-replicable without its span machinery):

* ordered count  o(a,b) = #{(p,q) in pos(a) x pos(b): 1 <= q-p <= 2}
  (gap <= slop 1, order preserved)
* unordered count u(a,b) = #{(p,q): p != q, |q-p| <= 8}

Each pair behaves as a pseudo-term scored with the same BM25
(k1, b, avgdl) using its EXACT pair document frequency (number of docs
with a match — computed in the same plan, where Lucene only estimates
span doc frequencies). Final score (float64):

    0.85 * sum_t idf_t * tfpart(tf_t)  +
    0.10 * sum_p idf_o(p) * tfpart(o_p) +
    0.05 * sum_p idf_u(p) * tfpart(u_p)

Two engines (rank- and score-identity pinned by tests):

* ``engine="kernel"`` (default, the scale path): positional posting
  blocks (``pos_bin``, `index/blocks.py`) are term-pruned at the
  parquet scan and decoded per segment in one Arrow kernel that emits
  per-doc bag contributions and per-pair ordered/unordered window
  counts; pair document frequencies and final scoring stay
  declarative (global exact dfs need a cross-segment aggregation
  anyway). No full-corpus scan.
* ``engine="dataframe"`` (the oracle path): fully declarative — the
  position window "join" is an inner join on (qid, pair, doc) with a
  positional range predicate over the exploded positional docvec.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bm25 import BM25Params
from .searcher import InvertedIndex
from .tieadjust import adjust_score_ties

W_TERM = 0.85
W_ORDERED = 0.1
W_UNORDERED = 0.05
ORDERED_MAX_DIST = 2    # slop 1, ordered
UNORDERED_MAX_DIST = 8  # slop 8, unordered


def _idf(df_col, n: float):
    return F.log(F.lit(1.0) + (F.lit(n) - df_col + 0.5) / (df_col + 0.5))


def search_sdm(index: InvertedIndex, queries: Dict[int, str],
               params: BM25Params, engine: str = "kernel") -> DataFrame:
    if engine == "kernel":
        return _search_sdm_kernel(index, queries, params)
    spark = index.spark
    docvec = index.docvec_with_positions
    if index.has_tombstones:
        # liveDocs for the declarative engine: unigram idf stays stale
        # (dictionary df), candidates/pair windows come from live docs
        # only — matching the kernel's decode-time mask exactly
        docvec = index.live_docvec
        assert "positions" in docvec.columns
    n = float(index.stats["doc_count"])
    avgdl = float(index.stats["avgdl"])
    k1, b = params.k1, params.b

    per_q = {qid: index.analyze_query(t) for qid, t in queries.items()}
    term_rows = [
        (qid, t) for qid, toks in per_q.items() for t in toks
    ]
    pair_rows = [
        (qid, i, toks[i], toks[i + 1])
        for qid, toks in per_q.items()
        for i in range(len(toks) - 1)
    ]
    if not term_rows:
        return spark.createDataFrame(
            [], "qid int, docid string, rank int, score double"
        )
    all_terms = sorted({t for _, t in term_rows} |
                       {t for r in pair_rows for t in (r[2], r[3])})
    qterms = spark.createDataFrame(term_rows, "qid int, term string")

    posvec = (
        docvec.select(
            "doc_id", "doclen",
            F.explode(F.arrays_zip("terms", "tfs", "positions")).alias("e"),
        )
        .select(
            F.col("e.terms").alias("term"), "doc_id",
            F.col("e.tfs").alias("tf"), "doclen",
            F.col("e.positions").alias("pos"),
        )
        .filter(F.col("term").isin(all_terms))
        .persist()
    )

    def tfpart(tf_col, dl_col):
        return tf_col / (
            tf_col + F.lit(k1 * (1 - b)) + F.lit(k1 * b / avgdl) * dl_col
        )

    # ---- bag-of-words part (term df from the global dictionary) ----
    dfs = index.term_dfs(all_terms)
    tdf = spark.createDataFrame(
        [(t, float(d)) for t, d in dfs.items()], "term string, tdf double"
    )
    bag = (
        posvec.join(F.broadcast(qterms), "term")
        .join(F.broadcast(tdf), "term")
        .groupBy("qid", "doc_id")
        .agg(
            F.sum(
                _idf(F.col("tdf"), n)
                * tfpart(F.col("tf").cast("double"),
                         F.col("doclen").cast("double"))
            ).alias("bag"),
            F.first("doclen").alias("doclen"),
        )
    )

    score_df = bag.withColumn("score",
                              F.lit(W_TERM) * F.col("bag")).select(
        "qid", "doc_id", "doclen", "score")

    if pair_rows:
        qpairs = spark.createDataFrame(
            pair_rows, "qid int, pid int, term_a string, term_b string"
        )
        pa = (
            posvec.join(F.broadcast(qpairs),
                        posvec.term == qpairs.term_a)
            .select("qid", "pid", "doc_id", "doclen",
                    F.explode("pos").alias("pos_a"))
        )
        pb = (
            posvec.join(F.broadcast(qpairs.select("qid", "pid", "term_b")),
                        posvec.term == F.col("term_b"))
            .select(F.col("qid").alias("qid_b"), F.col("pid").alias("pid_b"),
                    F.col("doc_id").alias("doc_id_b"),
                    F.explode("pos").alias("pos_b"))
        )
        joined = pa.join(
            pb,
            (pa.qid == pb.qid_b) & (pa.pid == pb.pid_b)
            & (pa.doc_id == pb.doc_id_b),
        )
        d = F.col("pos_b") - F.col("pos_a")
        counts = joined.groupBy("qid", "pid", "doc_id", "doclen").agg(
            F.sum(d.between(1, ORDERED_MAX_DIST).cast("long")).alias("o"),
            F.sum(((d != 0) & (F.abs(d) <= UNORDERED_MAX_DIST)).cast("long")
                  ).alias("u"),
        ).persist()
        pair_dfs = counts.groupBy("qid", "pid").agg(
            F.sum((F.col("o") > 0).cast("long")).cast("double").alias("df_o"),
            F.sum((F.col("u") > 0).cast("long")).cast("double").alias("df_u"),
        )
        pair_scores = (
            counts.join(F.broadcast(pair_dfs), ["qid", "pid"])
            .withColumn(
                "pscore",
                F.when(
                    F.col("o") > 0,
                    F.lit(W_ORDERED) * _idf(F.col("df_o"), n)
                    * tfpart(F.col("o").cast("double"),
                             F.col("doclen").cast("double")),
                ).otherwise(0.0)
                + F.when(
                    F.col("u") > 0,
                    F.lit(W_UNORDERED) * _idf(F.col("df_u"), n)
                    * tfpart(F.col("u").cast("double"),
                             F.col("doclen").cast("double")),
                ).otherwise(0.0),
            )
            .groupBy("qid", "doc_id")
            .agg(F.sum("pscore").alias("pairs"))
        )
        score_df = (
            score_df.join(pair_scores, ["qid", "doc_id"], "left")
            .withColumn(
                "score",
                F.col("score") + F.coalesce(F.col("pairs"), F.lit(0.0)),
            )
            .select("qid", "doc_id", "doclen", "score")
        )

    docmap = index.docmap.select("doc_id", "url")
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("url"))
    ranked = (
        score_df.join(docmap, "doc_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= params.k)
        .select("qid", F.col("url").alias("docid"), "rank", "score")
    )
    return adjust_score_ties(ranked).orderBy("qid", "rank")


# ---------------------------------------------------------------------------
# kernel engine: positional blocks, term-pruned scan, per-segment counts
# ---------------------------------------------------------------------------

SDM_ROWS_SCHEMA = ("qid int, pid int, doc_id long, doclen long, "
                   "o long, u long, bag double")


def _sdm_segment_fn(bag_weights, pairs, consts, dead_global=None):
    """Per-segment kernel: decode positional block runs once per term;
    emit bag contribution rows (pid = -1) and per-pair window-count
    rows. ``bag_weights``: qid -> {term: weight (= occurrences * idf)};
    ``pairs``: [(qid, pid, term_a, term_b)]. ``dead_global``: sorted
    absolute doc ids of tombstoned docs — masked at decode (this
    kernel never prunes, so the mask is exact; unigram idf stays
    stale per the Lucene delete contract, pair window dfs are counted
    over live postings in BOTH engines)."""
    import numpy as np
    import pandas as pd

    from ..index.blocks import decode_block_run, decode_positions_run

    c1, c2 = consts  # k1*(1-b), k1*b/avgdl (float64)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["term", "first_doc"], kind="mergesort")
        groups = {t: g for t, g in pdf.groupby("term", sort=False)}
        decoded = {}

        def get(t):
            if t not in decoded:
                g = groups[t]
                docs, tfs, dls = decode_block_run(
                    list(g["docs_bin"]), list(g["tfs_bin"]),
                    list(g["dls_bin"]), g["n"].to_numpy(),
                    g["first_doc"].to_numpy(), g["last_doc"].to_numpy(),
                )
                flat, starts = decode_positions_run(
                    list(g["pos_bin"]), tfs)
                if dead_global is not None and len(docs):
                    from ..index.tombstones import drop_dead

                    keep = drop_dead(docs.astype(np.int64), dead_global)
                    if keep is not None and not keep.all():
                        # drop dead postings AND their position slices
                        # (one vectorized repeat over the flat array)
                        flat = flat[np.repeat(keep, tfs)]
                        docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
                        starts = np.zeros(len(tfs), dtype=np.int64)
                        if len(tfs) > 1:
                            starts[1:] = np.cumsum(tfs[:-1])
                decoded[t] = (docs, tfs, dls, flat, starts)
            return decoded[t]

        out = {k: [] for k in ("qid", "pid", "doc_id", "doclen",
                               "o", "u", "bag")}

        def emit(qid, pid, doc_ids, dls, o, u, bag):
            m = len(doc_ids)
            out["qid"].append(np.full(m, qid, dtype=np.int64))
            out["pid"].append(np.full(m, pid, dtype=np.int64))
            out["doc_id"].append(doc_ids)
            out["doclen"].append(dls)
            out["o"].append(o)
            out["u"].append(u)
            out["bag"].append(bag)

        zl = np.zeros(0, dtype=np.int64)
        for qid, wmap in bag_weights.items():
            for t, w in wmap.items():
                if t not in groups:
                    continue
                docs, tfs, dls, _, _ = get(t)
                tf = tfs.astype(np.float64)
                dl = dls.astype(np.float64)
                contrib = w * tf / (tf + c1 + c2 * dl)
                z = np.zeros(len(docs), dtype=np.int64)
                emit(qid, -1, docs, dls, z, z, contrib)

        for qid, pid, a, b in pairs:
            if a not in groups or b not in groups:
                continue
            docs_a, tfs_a, dls_a, flat_a, st_a = get(a)
            docs_b, tfs_b, _, flat_b, st_b = get(b)
            common, ia, ib = np.intersect1d(
                docs_a, docs_b, assume_unique=True, return_indices=True)
            if common.size == 0:
                continue
            o = np.zeros(common.size, dtype=np.int64)
            u = np.zeros(common.size, dtype=np.int64)
            for j in range(common.size):
                pa = flat_a[st_a[ia[j]]:st_a[ia[j]] + tfs_a[ia[j]]]
                pb = flat_b[st_b[ib[j]]:st_b[ib[j]] + tfs_b[ib[j]]]
                d = pb[None, :] - pa[:, None]
                o[j] = int(((d >= 1) & (d <= ORDERED_MAX_DIST)).sum())
                u[j] = int(((d != 0) & (np.abs(d) <= UNORDERED_MAX_DIST))
                           .sum())
            keep = (o > 0) | (u > 0)
            emit(qid, pid, common[keep], dls_a[ia][keep],
                 o[keep], u[keep],
                 np.zeros(int(keep.sum()), dtype=np.float64))

        if not out["qid"]:
            return pd.DataFrame({
                "qid": np.empty(0, np.int64), "pid": np.empty(0, np.int64),
                "doc_id": np.empty(0, np.int64),
                "doclen": np.empty(0, np.int64), "o": zl, "u": zl,
                "bag": np.empty(0, np.float64),
            })
        return pd.DataFrame({k: np.concatenate(v) for k, v in out.items()})

    return fn


def _search_sdm_kernel(index: InvertedIndex, queries: Dict[int, str],
                       params: BM25Params) -> DataFrame:
    spark = index.spark
    n = float(index.stats["doc_count"])
    avgdl = float(index.stats["avgdl"])
    k1, b = params.k1, params.b

    blocks = index.blocks
    if "pos_bin" not in blocks.columns:
        raise ValueError(
            "index was built without store_positions=True; the SDM "
            "kernel engine needs positional posting blocks"
        )

    per_q = {qid: index.analyze_query(t) for qid, t in queries.items()}
    all_terms = sorted({t for toks in per_q.values() for t in toks})
    if not all_terms:
        return spark.createDataFrame(
            [], "qid int, docid string, rank int, score double")
    dfs = index.term_dfs(all_terms)
    import math

    # bag weights: occurrences * idf (matches the dataframe path's
    # one-row-per-occurrence join)
    bag_weights: Dict[int, Dict[str, float]] = {}
    pairs = []
    pid = 0
    for qid, toks in per_q.items():
        wmap: Dict[str, float] = {}
        for t in toks:
            if t in dfs:
                idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
                wmap[t] = wmap.get(t, 0.0) + idf
        bag_weights[qid] = wmap
        for i in range(len(toks) - 1):
            pairs.append((qid, pid, toks[i], toks[i + 1]))
            pid += 1

    dead = index.dead_global
    fn = _sdm_segment_fn(
        bag_weights, pairs, (k1 * (1 - b), k1 * b / avgdl),
        dead_global=dead if len(dead) else None)
    # three consumers (bag agg, pair dfs, pair scores): persist the
    # kernel output or the positional decode + O(positions^2) window
    # counting re-runs once per consumer (round 7, guide §1.2)
    rows = (
        blocks.filter(F.col("term").isin(all_terms))
        .groupBy("segment")
        .applyInPandas(fn, schema=SDM_ROWS_SCHEMA)
        .persist()
    )

    def tfpart(tf_col, dl_col):
        return tf_col / (
            tf_col + F.lit(k1 * (1 - b)) + F.lit(k1 * b / avgdl) * dl_col
        )

    bag = (
        rows.filter(F.col("pid") == -1)
        .groupBy("qid", "doc_id")
        .agg((F.lit(W_TERM) * F.sum("bag")).alias("score"),
             F.first("doclen").alias("doclen"))
    )
    counts = rows.filter(F.col("pid") >= 0)
    pair_dfs = counts.groupBy("qid", "pid").agg(
        F.sum((F.col("o") > 0).cast("long")).cast("double").alias("df_o"),
        F.sum((F.col("u") > 0).cast("long")).cast("double").alias("df_u"),
    )
    pair_scores = (
        counts.join(F.broadcast(pair_dfs), ["qid", "pid"])
        .withColumn(
            "pscore",
            F.when(
                F.col("o") > 0,
                F.lit(W_ORDERED) * _idf(F.col("df_o"), n)
                * tfpart(F.col("o").cast("double"),
                         F.col("doclen").cast("double")),
            ).otherwise(0.0)
            + F.when(
                F.col("u") > 0,
                F.lit(W_UNORDERED) * _idf(F.col("df_u"), n)
                * tfpart(F.col("u").cast("double"),
                         F.col("doclen").cast("double")),
            ).otherwise(0.0),
        )
        .groupBy("qid", "doc_id")
        .agg(F.sum("pscore").alias("pairs"))
    )
    score_df = (
        bag.join(pair_scores, ["qid", "doc_id"], "left")
        .withColumn("score",
                    F.col("score") + F.coalesce(F.col("pairs"), F.lit(0.0)))
        .select("qid", "doc_id", "score")
    )
    # two-phase merge (searcher._finalize): rank-prune on the narrow
    # (qid, doc_id, score) rows first — rank() keeps kth-score ties so
    # the url tie-break stays exact — then broadcast the bounded
    # survivors into a streamed docmap scan; the round-6 tail joined
    # the FULL matching-doc stream with docmap before any pruning
    from .searcher import _finalize

    return _finalize(index, score_df, params.k)
