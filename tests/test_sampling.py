"""Deterministic stratified sampling contract (ops/sampling.py)."""

from pyspark.sql import functions as F

from anserini_spark.ops.sampling import hash_fraction, stratified_sample


def _corpus(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "en").otherwise("xx").alias("lang"),
    )


def test_sampling_is_deterministic(spark):
    d = _corpus(spark)
    a = sorted(r["doc_id"] for r in
               stratified_sample(d, "lang", {"en": 0.5, "xx": 0.2},
                                 "doc_id", salt="s1").collect())
    b = sorted(r["doc_id"] for r in
               stratified_sample(d, "lang", {"en": 0.5, "xx": 0.2},
                                 "doc_id", salt="s1").collect())
    assert a == b and len(a) > 0


def test_sampling_rates_and_salt(spark):
    d = _corpus(spark)
    out = stratified_sample(d, "lang", {"en": 0.5, "xx": 0.2},
                            "doc_id", salt="s1")
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # 500 en docs at rate .5, 1500 xx at .2 — md5 is uniform, so the
    # realized rates sit within a generous binomial band
    assert 0.38 <= counts["en"] / 500 <= 0.62
    assert 0.13 <= counts["xx"] / 1500 <= 0.27
    other = sorted(r["doc_id"] for r in
                   stratified_sample(d, "lang", {"en": 0.5, "xx": 0.2},
                                     "doc_id", salt="s2").collect())
    assert other != sorted(r["doc_id"] for r in out.collect())


def test_hash_fraction_range(spark):
    d = spark.range(500)
    mm = d.select(hash_fraction(F.col("id")).alias("u")).agg(
        F.min("u"), F.max("u")).collect()[0]
    assert 0.0 <= mm[0] and mm[1] < 1.0
