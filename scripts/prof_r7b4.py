"""Hypothesis tests on the warm bm25_topk final-job floor."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from anserini_spark.session import get_spark  # noqa: E402
from anserini_spark.ops import corpus_queries as cq  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_out(spark, tf):
    q = spark.createDataFrame(cq.FIXED_QUERIES, "qid int, term string")
    stats = tf.agg(
        F.countDistinct("doc_id").cast("double").alias("n"),
        (F.sum("tf").cast("double")
         / F.countDistinct("doc_id").cast("double")).alias("avgdl"))
    dfreq = (tf.join(F.broadcast(q.select("term").distinct()), "term")
             .groupBy("term").agg(F.count("*").cast("double").alias("dfreq")))
    idf = F.log(F.lit(1.0) + (F.col("n") - F.col("dfreq") + F.lit(0.5))
                / (F.col("dfreq") + F.lit(0.5)))
    tfd = F.col("tf").cast("double")
    dld = F.col("doclen").cast("double")
    contrib = idf * tfd / (
        tfd + F.lit(cq.K1 * (1 - cq.B))
        + F.lit(cq.K1 * cq.B) / F.col("avgdl") * dld)
    scored = (tf.join(F.broadcast(q), "term")
              .join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats))
              .groupBy("qid", "doc_id").agg(F.sum(contrib).alias("score")))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= cq.TOPK)
            .select("qid", "doc_id", "rank",
                    F.round("score", 4).alias("score")))


def main():
    spark = get_spark(app="prof4", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    cq.bm25_topk(spark, SF).count()  # warm + fill plan-matched cache

    d = cq._docs(spark, SF).select(
        "doc_id",
        F.filter(F.split(F.col("text"), " "), lambda t: t != "").alias("toks"))
    tf = (
        d.select("doc_id", F.size("toks").alias("doclen"),
                 F.explode("toks").alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "doclen", "term")
        .agg(F.count("*").alias("tf"))
        .persist()
    )
    tf.count()

    for label, conf in [
        ("baseline sp=32 aqe=on", {}),
        ("sp=8", {"spark.sql.shuffle.partitions": "8"}),
        ("aqe=off", {"spark.sql.adaptive.enabled": "false"}),
        ("sp=8 aqe=off", {"spark.sql.shuffle.partitions": "8",
                          "spark.sql.adaptive.enabled": "false"}),
    ]:
        saved = {}
        for k, v in conf.items():
            saved[k] = spark.conf.get(k)
            spark.conf.set(k, v)
        out = build_out(spark, tf)
        walls = []
        for _ in range(4):
            t0 = time.time(); out.count(); walls.append(round(time.time()-t0, 3))
        print(f"{label:24s} min={min(walls):.3f} walls={walls}", flush=True)
        for k, v in saved.items():
            spark.conf.set(k, v)
    spark.stop()


if __name__ == "__main__":
    main()


def build_out2(spark, tf):
    """Single-exchange variant: repartition by qid; hash(qid) satisfies
    both the (qid,doc_id) aggregation and the qid window."""
    q = spark.createDataFrame(cq.FIXED_QUERIES, "qid int, term string")
    stats = tf.agg(
        F.countDistinct("doc_id").cast("double").alias("n"),
        (F.sum("tf").cast("double")
         / F.countDistinct("doc_id").cast("double")).alias("avgdl"))
    dfreq = (tf.join(F.broadcast(q.select("term").distinct()), "term")
             .groupBy("term").agg(F.count("*").cast("double").alias("dfreq")))
    idf = F.log(F.lit(1.0) + (F.col("n") - F.col("dfreq") + F.lit(0.5))
                / (F.col("dfreq") + F.lit(0.5)))
    tfd = F.col("tf").cast("double")
    dld = F.col("doclen").cast("double")
    contrib = idf * tfd / (
        tfd + F.lit(cq.K1 * (1 - cq.B))
        + F.lit(cq.K1 * cq.B) / F.col("avgdl") * dld)
    scored = (tf.join(F.broadcast(q), "term")
              .join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats))
              .repartition("qid")
              .groupBy("qid", "doc_id").agg(F.sum(contrib).alias("score")))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= cq.TOPK)
            .select("qid", "doc_id", "rank",
                    F.round("score", 4).alias("score")))


def main2():
    spark = get_spark(app="prof4b", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    cq.bm25_topk(spark, SF).count()
    d = cq._docs(spark, SF).select(
        "doc_id",
        F.filter(F.split(F.col("text"), " "), lambda t: t != "").alias("toks"))
    tf = (
        d.select("doc_id", F.size("toks").alias("doclen"),
                 F.explode("toks").alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "doclen", "term")
        .agg(F.count("*").alias("tf"))
        .persist()
    )
    tf.count()
    for label, bld in [("2-exchange", build_out), ("1-exchange qid", build_out2)]:
        out = bld(spark, tf)
        walls = []
        for _ in range(5):
            t0 = time.time(); out.count(); walls.append(round(time.time()-t0, 3))
        print(f"{label:24s} min={min(walls):.3f} walls={walls}", flush=True)
    a = sorted(map(tuple, build_out(spark, tf).collect()))
    b = sorted(map(tuple, build_out2(spark, tf).collect()))
    print("IDENTICAL" if a == b else "MISMATCH", len(a), len(b))
    spark.stop()
