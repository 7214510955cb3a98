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

The whole computation is declarative DataFrame ops — the position
window "join" is an inner join on (qid, pair, doc) with a positional
range predicate, i.e. a per-document interval join; no Python UDFs.
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
               params: BM25Params) -> DataFrame:
    spark = index.spark
    docvec = index.docvec_with_positions
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
