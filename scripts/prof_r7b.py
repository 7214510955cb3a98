"""Warm-JVM A/B profiler for the session-2 round-7 follow-ups."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

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
    print(f"{label:32s} min={min(walls):.3f} walls={walls}", flush=True)


def main():
    spark = get_spark(app="prof", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    print(f"documents rows = {n}")
    # warmup
    cq.bm25_topk(spark, SF).count()
    timeit("bm25_topk", lambda: cq.bm25_topk(spark, SF).count())
    timeit("term_dictionary", lambda: cq.term_dictionary(spark, SF).count())

    # term_dictionary without fanout
    from pyspark.sql import functions as F

    def td_plain():
        d = (spark.read.parquet(f"{SF}/documents.parquet")
             .filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
             .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
             .filter(F.col("term") != "")
             .groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
             .groupBy("term")
             .agg(F.count("*").alias("df"), F.sum("tf").alias("cf")))
        return d.count()
    td_plain()
    timeit("term_dictionary no-fanout", td_plain)
    spark.stop()


if __name__ == "__main__":
    main()
