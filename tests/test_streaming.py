"""Structured Streaming extensions: incremental corpus ingest must
produce the same docvec rows as the batch kernel; watermarked windowed
events must equal the batch aggregation once the stream drains."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus_parquet(spark, tmp_path_factory):
    from anserini_spark.corpus.synth import web_corpus

    p = str(tmp_path_factory.mktemp("stream") / "corpus.parquet")
    web_corpus(spark, "/root/testdata/sf0.001").write.mode("overwrite").parquet(p)
    return p


def test_stream_ingest_matches_batch_tokenize(spark, corpus_parquet, tmp_path):
    from anserini_spark.index.build import IndexConfig
    from anserini_spark.streaming.ingest import start_corpus_ingest

    out = str(tmp_path / "docvec_stream")
    ckpt = str(tmp_path / "ckpt")
    cfg = IndexConfig(out_dir="unused")
    q = start_corpus_ingest(spark, corpus_parquet, out, ckpt, cfg)
    q.awaitTermination(300)
    got = spark.read.parquet(out)

    from anserini_spark.analysis.analyzer import analyze
    from collections import Counter

    src = spark.read.parquet(corpus_parquet).filter(
        (F.col("lang") == "en") & (F.length(F.trim("text")) > 0)
    ).collect()
    want = {}
    for r in src:  # duplicates collapse to the same payload
        c = Counter(analyze(r["text"]))
        want[r["url"]] = (sum(c.values()), sorted(c.items()))
    got_rows = {}
    for r in got.collect():
        got_rows[r["url"]] = (
            r["doclen"], sorted(zip(r["terms"], r["tfs"]))
        )
    assert set(got_rows) == set(want)
    for url in want:
        assert got_rows[url] == want[url], url

    # exactly-once resume: restarting with the same checkpoint and no
    # new files appends nothing
    n_before = got.count()
    q2 = start_corpus_ingest(spark, corpus_parquet, out, ckpt, cfg)
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == n_before


def test_stream_events_hourly_matches_batch(spark, tmp_path):
    from anserini_spark.streaming.ingest import stream_events_hourly

    import shutil

    src = "/root/testdata/sf0.001/events.parquet"
    events_dir = str(tmp_path / "events_in")
    import os

    os.makedirs(events_dir)
    shutil.copy(src, os.path.join(events_dir, "events.parquet"))
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = str(tmp_path / "win")
    ckpt = str(tmp_path / "winckpt")
    q = (
        stream_events_hourly(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    batch = (
        spark.read.parquet(src)
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("s"))
        .collect()
    )
    want = {(r["hour"], r["event_type"]): (r["n"], r["s"]) for r in batch}
    # append mode emits only windows closed by the final watermark; all
    # emitted windows must match the batch result exactly
    assert got
    for key, val in got.items():
        assert want[key] == val
