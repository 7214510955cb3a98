"""Decompose bm25_topk warm cost: cache fill vs stats vs dfreq vs final."""
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


def main():
    spark = get_spark(app="prof3", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    cq.bm25_topk(spark, SF).count()  # warm + fill cache

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
    t0 = time.time(); n_tf = tf.count(); t_fill = time.time() - t0
    print(f"tf rows={n_tf} (cache-hit fill job {t_fill:.3f}s)")

    q = spark.createDataFrame(cq.FIXED_QUERIES, "qid int, term string")
    stats = tf.agg(
        F.countDistinct("doc_id").cast("double").alias("n"),
        (F.sum("tf").cast("double")
         / F.countDistinct("doc_id").cast("double")).alias("avgdl"))
    dfreq = (tf.join(F.broadcast(q.select("term").distinct()), "term")
             .groupBy("term").agg(F.count("*").cast("double").alias("dfreq")))
    for rep in range(3):
        t0 = time.time(); stats.collect(); t_stats = time.time() - t0
        t0 = time.time(); dfreq.collect(); t_dfreq = time.time() - t0
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
        out = (scored.withColumn("rank", F.row_number().over(w))
               .filter(F.col("rank") <= cq.TOPK)
               .select("qid", "doc_id", "rank",
                       F.round("score", 4).alias("score")))
        t0 = time.time(); out.count(); t_final = time.time() - t0
        print(f"rep{rep}: stats={t_stats:.3f} dfreq={t_dfreq:.3f} "
              f"final={t_final:.3f}")
    # how expensive is the window vs a plain agg?
    scored2 = (tf.join(F.broadcast(q), "term")
               .groupBy("qid", "doc_id").agg(F.sum("tf").alias("s")))
    t0 = time.time(); scored2.count(); print(f"scored-no-window: {time.time()-t0:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
