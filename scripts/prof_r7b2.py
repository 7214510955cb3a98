"""Break down bm25_topk cost at sf0.1."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from anserini_spark.session import get_spark  # noqa: E402
from anserini_spark.ops import corpus_queries as cq  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def timeit(label, fn, reps=4):
    walls = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 3))
    print(f"{label:34s} min={min(walls):.3f} walls={walls}", flush=True)


def bm25_variant(spark, sf_dir, fanout=True, collect_stats=False):
    from anserini_spark.util.scans import read_parquet_fanout
    if fanout:
        base = read_parquet_fanout(spark, f"{sf_dir}/documents.parquet")
    else:
        base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = (base.filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
         .select("doc_id",
                 F.filter(F.split(F.col("text"), " "),
                          lambda t: t != "").alias("toks")))
    tf = (
        d.select("doc_id", F.size("toks").alias("doclen"),
                 F.explode("toks").alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "doclen", "term")
        .agg(F.count("*").alias("tf"))
        .persist()
    )
    q = spark.createDataFrame(cq.FIXED_QUERIES, "qid int, term string")
    k1, b = cq.K1, cq.B
    if collect_stats:
        row = tf.agg(
            F.countDistinct("doc_id").cast("double").alias("n"),
            (F.sum("tf").cast("double")
             / F.countDistinct("doc_id").cast("double")).alias("avgdl"),
        ).collect()[0]
        n_docs, avgdl = row["n"], row["avgdl"]
        dfreq_rows = (
            tf.join(F.broadcast(q.select("term").distinct()), "term")
            .groupBy("term").agg(F.count("*").cast("double").alias("dfreq"))
            .collect())
        df_map = {r["term"]: r["dfreq"] for r in dfreq_rows}
        qd = spark.createDataFrame(
            [(qid, t, df_map.get(t, 0.0)) for qid, t in cq.FIXED_QUERIES
             if t in df_map],
            "qid int, term string, dfreq double")
        idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("dfreq") + F.lit(0.5))
                    / (F.col("dfreq") + F.lit(0.5)))
        tfd = F.col("tf").cast("double")
        dld = F.col("doclen").cast("double")
        contrib = idf * tfd / (
            tfd + F.lit(k1 * (1 - b)) + F.lit(k1 * b) / F.lit(avgdl) * dld)
        scored = (tf.join(F.broadcast(qd), "term")
                  .groupBy("qid", "doc_id").agg(F.sum(contrib).alias("score")))
    else:
        stats = tf.agg(
            F.countDistinct("doc_id").cast("double").alias("n"),
            (F.sum("tf").cast("double")
             / F.countDistinct("doc_id").cast("double")).alias("avgdl"))
        dfreq = (tf.join(F.broadcast(q.select("term").distinct()), "term")
                 .groupBy("term")
                 .agg(F.count("*").cast("double").alias("dfreq")))
        idf = F.log(F.lit(1.0) + (F.col("n") - F.col("dfreq") + F.lit(0.5))
                    / (F.col("dfreq") + F.lit(0.5)))
        tfd = F.col("tf").cast("double")
        dld = F.col("doclen").cast("double")
        contrib = idf * tfd / (
            tfd + F.lit(k1 * (1 - b)) + F.lit(k1 * b) / F.col("avgdl") * dld)
        scored = (tf.join(F.broadcast(q), "term")
                  .join(F.broadcast(dfreq), "term")
                  .crossJoin(F.broadcast(stats))
                  .groupBy("qid", "doc_id").agg(F.sum(contrib).alias("score")))
    from pyspark.sql import Window
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    out = (scored.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= cq.TOPK)
           .select("qid", "doc_id", "rank", F.round("score", 4).alias("score")))
    n = out.count()
    tf.unpersist()
    return n


def main():
    spark = get_spark(app="prof2", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    cq.bm25_topk(spark, SF).count()  # warmup
    timeit("bm25 current (fanout,bcast)",
           lambda: bm25_variant(spark, SF, True, False))
    timeit("bm25 no-fanout",
           lambda: bm25_variant(spark, SF, False, False))
    timeit("bm25 no-fanout collect-stats",
           lambda: bm25_variant(spark, SF, False, True))
    timeit("bm25 fanout collect-stats",
           lambda: bm25_variant(spark, SF, True, True))
    spark.stop()


if __name__ == "__main__":
    main()
