"""Learning-to-rank feature extraction as first-class pipeline ops.

The reference extracts per-(query, document) feature vectors for LTR
training (`ltr/WebFeatureExtractor.java:63-82` wires the feature set;
`ltr/feature/base/*.java` defines the kernels: MatchingTermCount,
QueryLength, SumMatchingTf, DocSize, BM25/TFIDF feature, AvgICTF,
AvgIDF, SimplifiedClarityScore (SCS), SCQ aggregates). These are pure
aggregations over (tf, df, cf, doclen, collection stats) — exactly
the tables the engine's docvec/dictionary already materialize — so
the Spark form is a handful of joins + groupBys with every formula
JVM-side, no Python in the plan.

Feature definitions (t ranges over query terms present in the
collection; qtf = occurrences of t in the query; |q| = total query
tokens; N = doc count; C = total collection token count):

* ``f_query_len`` = |q|; ``f_query_uniq`` = #distinct query terms
* ``f_matching_terms`` = #distinct query terms present in the doc
* ``f_doc_len`` = doclen; ``f_sum_matching_tf`` = sum tf of matches
* ``f_bm25``  = sum qtf * idf_robertson * tf-part (k1=0.9, b=0.4)
* ``f_tfidf`` = sum qtf * tf * ln(N / df)
* ``f_avg_idf``  = mean ln(N / df)
* ``f_avg_ictf`` = mean log2(C / cf)   (inverse collection term freq)
* ``f_scs`` = sum (qtf/|q|) * log2((qtf/|q|) / (cf/C))
  (simplified clarity score — query/collection KL)
* ``f_scq_avg`` / ``f_scq_max`` over SCQ_t = (1+ln(cf)) * ln(1+N/df)
  (collection-query similarity)

Query-level features are constant per qid, repeated per row — the
flat (qid, doc_id, features...) shape LTR trainers consume. Query
terms missing from the collection contribute nothing (the reference
skips unseen terms the same way).

Scale: one tokenize pass persisted for tf/dl, stats and per-query
term stats are tiny broadcasts, and the only shuffle is the
(qid, doc_id) groupBy — at 100 TB this is the same shape as batch
BM25 scoring, with the candidate set bounded by the (query, doc)
pairs being featurized.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..util.scans import read_parquet_fanout

from .corpus_queries import (
    FIXED_QUERIES,
    K1,
    B,
    _TOK_CTE,
    _values_clause,
)

_LOG2 = "ln(2.0)"


def ltr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(qid, doc_id) LTR feature vectors for the fixed query set
    over every matching document, 4-decimal rounded."""
    # one tokenize pass, one wide shuffle (round 7, guide §2.3/§2.4):
    # doclen rides the tf aggregation as a grouping key (functionally
    # dependent on doc_id), so the per-(query, doc) features need no
    # doc-length join and collection stats come from one aggregate —
    # the round-6 plan tokenized the corpus twice (tf + dl scans) and
    # joined dl back into the feature stream
    d = (
        read_parquet_fanout(spark, f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        .select(
            "doc_id",
            F.filter(F.split(F.col("text"), " "),
                     lambda t: t != "").alias("toks"),
        )
    )
    tf = (
        d.select("doc_id", F.size("toks").alias("doclen"),
                 F.explode("toks").alias("term"))
        .groupBy("doc_id", "doclen", "term")
        .agg(F.count("*").alias("tf"))
        .persist()
    )
    q = spark.createDataFrame(FIXED_QUERIES, "qid int, term string")

    # n docs = distinct doc_id; total collection tokens = sum(tf):
    # the same integers the old dl-side aggregate produced
    stats = tf.agg(
        F.countDistinct("doc_id").cast("double").alias("n"),
        F.sum("tf").cast("double").alias("coll_c"),
    )
    # per-query bag: qtf per term, |q|, #uniq
    qterm = q.groupBy("qid", "term").agg(
        F.count("*").cast("double").alias("qtf"))
    qsize = qterm.groupBy("qid").agg(
        F.sum("qtf").alias("qlen"),
        F.count("*").cast("double").alias("quniq"))
    # collection stats for the query terms only (tiny)
    tstats = (
        tf.join(F.broadcast(qterm.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count("*").cast("double").alias("dfreq"),
             F.sum("tf").cast("double").alias("cf"))
    )

    # query-level features (driver-size frame: |q| x terms)
    qt = (qterm.join(F.broadcast(tstats), "term")
          .join(F.broadcast(qsize), "qid")
          .crossJoin(F.broadcast(stats)))
    ln2 = F.log(F.lit(2.0))
    p_q = F.col("qtf") / F.col("qlen")
    p_c = F.col("cf") / F.col("coll_c")
    scq = (F.lit(1.0) + F.log("cf")) * F.log(F.lit(1.0) + F.col("n") / F.col("dfreq"))
    qfeat = qt.groupBy("qid").agg(
        F.first("qlen").alias("f_query_len"),
        F.first("quniq").alias("f_query_uniq"),
        F.avg(F.log(F.col("n") / F.col("dfreq"))).alias("f_avg_idf"),
        F.avg(F.log(F.col("coll_c") / F.col("cf")) / ln2).alias("f_avg_ictf"),
        F.sum(p_q * F.log(p_q / p_c) / ln2).alias("f_scs"),
        F.avg(scq).alias("f_scq_avg"),
        F.max(scq).alias("f_scq_max"),
    )

    # per-(query, doc) features over matching docs
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("dfreq") + F.lit(0.5)) / (F.col("dfreq") + F.lit(0.5))
    )
    tfd = F.col("tf").cast("double")
    dld = F.col("doclen").cast("double")
    avgdl = F.col("coll_c") / F.col("n")
    bm25 = F.col("qtf") * idf * tfd / (
        tfd + F.lit(K1 * (1 - B)) + F.lit(K1 * B) / avgdl * dld
    )
    tfidf = F.col("qtf") * tfd * F.log(F.col("n") / F.col("dfreq"))
    pair = (
        tf.join(F.broadcast(qterm), "term")
        .join(F.broadcast(tstats), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc_id")
        .agg(
            F.count("*").cast("double").alias("f_matching_terms"),
            F.first("doclen").cast("double").alias("f_doc_len"),
            F.sum("tf").cast("double").alias("f_sum_matching_tf"),
            F.sum(bm25).alias("f_bm25"),
            F.sum(tfidf).alias("f_tfidf"),
        )
    )
    # ordered/unordered window counts over consecutive query-term
    # pairs (`ltr/feature/*OrderedSequentialPairs*` territory; window
    # 8, the SDM unordered width): ordered = 1 <= Δpos <= 8,
    # unordered = Δ != 0 and |Δ| <= 8, summed over a query's pairs.
    # Docs matching no pair get 0 (LEFT JOIN + coalesce).
    pair_rows = []
    qmap: Dict[int, list] = {}
    for qid, term in FIXED_QUERIES:
        qmap.setdefault(qid, []).append(term)
    for qid, toks in qmap.items():
        for i in range(len(toks) - 1):
            pair_rows.append((qid, i, toks[i], toks[i + 1]))
    win = None
    if pair_rows:
        qp = spark.createDataFrame(
            pair_rows, "qid int, pid int, term_a string, term_b string")
        # positions are doc-local: posexplode of the FILTERED token
        # array yields exactly the 0-based position among non-empty
        # tokens — the round-6 plan instead renumbered with a
        # row_number window (full shuffle + sort over every token,
        # computed once per join side)
        tokp = d.select(
            "doc_id", F.posexplode("toks").alias("pos", "term"))
        a = tokp.alias("a")
        # pre-filter the right side to pair-second terms before the
        # doc_id join (scan-level IN pushdown; guide §2.3 "shuffle
        # fewer bytes")
        b = tokp.filter(
            F.col("term").isin(sorted({r[3] for r in pair_rows}))
        ).alias("b")
        delta = F.col("b.pos") - F.col("a.pos")
        win = (
            a.join(F.broadcast(qp), F.col("a.term") == F.col("term_a"))
            .join(b, (F.col("b.doc_id") == F.col("a.doc_id"))
                  & (F.col("b.term") == F.col("term_b")))
            .groupBy("qid", F.col("a.doc_id").alias("doc_id"))
            .agg(
                F.sum(F.when(delta.between(1, 8), 1).otherwise(0))
                .cast("double").alias("f_ordered_w8"),
                F.sum(F.when((delta != 0) & (F.abs(delta) <= 8), 1)
                      .otherwise(0))
                .cast("double").alias("f_unordered_w8"),
            )
        )
    out = pair.join(F.broadcast(qfeat), "qid")
    if win is not None:
        out = out.join(win, ["qid", "doc_id"], "left")
    else:
        out = out.withColumn("f_ordered_w8", F.lit(None)) \
                 .withColumn("f_unordered_w8", F.lit(None))
    out = out.withColumn("f_ordered_w8",
                         F.coalesce("f_ordered_w8", F.lit(0.0))) \
             .withColumn("f_unordered_w8",
                         F.coalesce("f_unordered_w8", F.lit(0.0)))
    r4 = [F.round(c, 4).alias(c) for c in (
        "f_matching_terms", "f_doc_len", "f_sum_matching_tf",
        "f_bm25", "f_tfidf", "f_query_len", "f_query_uniq",
        "f_avg_idf", "f_avg_ictf", "f_scs", "f_scq_avg", "f_scq_max",
        "f_ordered_w8", "f_unordered_w8")]
    return out.select("qid", "doc_id", *r4).orderBy("qid", "doc_id")


def _pair_values() -> str:
    qmap: Dict[int, list] = {}
    for qid, term in FIXED_QUERIES:
        qmap.setdefault(qid, []).append(term)
    rows = []
    for qid, toks in qmap.items():
        for i in range(len(toks) - 1):
            rows.append(f"({qid}, {i}, '{toks[i]}', '{toks[i + 1]}')")
    return ", ".join(rows)


def oracle_sqls() -> dict[str, str]:
    return {
        "ltr_features": f"""
WITH {_TOK_CTE},
tokp AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY rawpos) - 1 AS pos
  FROM (
    SELECT doc_id, unnest(str_split(text, ' ')) AS term,
           generate_subscripts(str_split(text, ' '), 1) AS rawpos
    FROM docs
  )
  WHERE term <> ''
),
qp(qid, pid, term_a, term_b) AS (VALUES {_pair_values()}),
win AS (
  SELECT qp.qid, a.doc_id,
         CAST(sum(CASE WHEN b.pos - a.pos BETWEEN 1 AND 8
                       THEN 1 ELSE 0 END) AS DOUBLE) AS f_ordered_w8,
         CAST(sum(CASE WHEN b.pos <> a.pos AND abs(b.pos - a.pos) <= 8
                       THEN 1 ELSE 0 END) AS DOUBLE) AS f_unordered_w8
  FROM qp
  JOIN tokp a ON a.term = qp.term_a
  JOIN tokp b ON b.term = qp.term_b AND b.doc_id = a.doc_id
  GROUP BY qp.qid, a.doc_id
),
q(qid, term) AS (VALUES {_values_clause()}),
qterm AS (
  SELECT qid, term, CAST(count(*) AS DOUBLE) AS qtf
  FROM q GROUP BY qid, term
),
qsize AS (
  SELECT qid, sum(qtf) AS qlen, CAST(count(*) AS DOUBLE) AS quniq
  FROM qterm GROUP BY qid
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(doclen) AS DOUBLE) AS coll_c
  FROM dl
),
tstats AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS dfreq,
         CAST(sum(tf) AS DOUBLE) AS cf
  FROM tf
  WHERE term IN (SELECT DISTINCT term FROM qterm)
  GROUP BY term
),
qfeat AS (
  SELECT qt.qid,
         any_value(qs.qlen) AS f_query_len,
         any_value(qs.quniq) AS f_query_uniq,
         avg(ln(s.n / t.dfreq)) AS f_avg_idf,
         avg(ln(s.coll_c / t.cf) / {_LOG2}) AS f_avg_ictf,
         sum((qt.qtf / qs.qlen)
             * ln((qt.qtf / qs.qlen) / (t.cf / s.coll_c)) / {_LOG2})
           AS f_scs,
         avg((1.0 + ln(t.cf)) * ln(1.0 + s.n / t.dfreq)) AS f_scq_avg,
         max((1.0 + ln(t.cf)) * ln(1.0 + s.n / t.dfreq)) AS f_scq_max
  FROM qterm qt
  JOIN tstats t ON qt.term = t.term
  JOIN qsize qs ON qs.qid = qt.qid
  CROSS JOIN stats s
  GROUP BY qt.qid
),
pair AS (
  SELECT qt.qid, tf.doc_id,
         CAST(count(*) AS DOUBLE) AS f_matching_terms,
         CAST(any_value(dl.doclen) AS DOUBLE) AS f_doc_len,
         CAST(sum(tf.tf) AS DOUBLE) AS f_sum_matching_tf,
         sum(qt.qtf
             * ln(1.0 + (s.n - t.dfreq + 0.5) / (t.dfreq + 0.5))
             * CAST(tf.tf AS DOUBLE)
             / (CAST(tf.tf AS DOUBLE) + {K1 * (1 - B)!r}
                + {K1 * B!r} / (s.coll_c / s.n)
                  * CAST(dl.doclen AS DOUBLE))) AS f_bm25,
         sum(qt.qtf * CAST(tf.tf AS DOUBLE) * ln(s.n / t.dfreq))
           AS f_tfidf
  FROM qterm qt
  JOIN tstats t ON qt.term = t.term
  JOIN tf ON tf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.qid, tf.doc_id
)
SELECT p.qid, p.doc_id,
       round(p.f_matching_terms, 4) AS f_matching_terms,
       round(p.f_doc_len, 4) AS f_doc_len,
       round(p.f_sum_matching_tf, 4) AS f_sum_matching_tf,
       round(p.f_bm25, 4) AS f_bm25,
       round(p.f_tfidf, 4) AS f_tfidf,
       round(f.f_query_len, 4) AS f_query_len,
       round(f.f_query_uniq, 4) AS f_query_uniq,
       round(f.f_avg_idf, 4) AS f_avg_idf,
       round(f.f_avg_ictf, 4) AS f_avg_ictf,
       round(f.f_scs, 4) AS f_scs,
       round(f.f_scq_avg, 4) AS f_scq_avg,
       round(f.f_scq_max, 4) AS f_scq_max,
       round(coalesce(w.f_ordered_w8, 0.0), 4) AS f_ordered_w8,
       round(coalesce(w.f_unordered_w8, 0.0), 4) AS f_unordered_w8
FROM pair p
JOIN qfeat f ON f.qid = p.qid
LEFT JOIN win w ON w.qid = p.qid AND w.doc_id = p.doc_id
""",
    }
