"""Structured Streaming extensions.

The reference is strictly batch (SURVEY.md §2.9) — these are the
training-pipeline extensions for incremental corpora:

* ``stream_tokenize`` — incremental corpus ingest: a parquet file
  stream of web pages is filtered/analyzed with the SAME kernel as the
  batch build and appended as docvec-shaped rows (url-keyed, no global
  ids); a periodic batch job (`index/merge.py`) folds accumulated
  slices into the global index — the Spark-native version of "new WARC
  files landed, extend the index", with exactly-once file-source
  semantics from the checkpoint.
* ``stream_events_hourly`` — watermarked tumbling-window aggregation
  over an event stream (late data bounded by the watermark), the
  streaming form of ``ops/events.events_hourly``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corpus.synth import CORPUS_SCHEMA
from ..index.build import IndexConfig, _analyze_for

STREAM_DOCVEC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("doclen", T.LongType(), False),
        T.StructField("terms", T.ArrayType(T.StringType()), False),
        T.StructField("tfs", T.ArrayType(T.IntegerType()), False),
    ]
)


def read_corpus_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    reader = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def stream_tokenize(corpus_stream: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Filter + analyze a corpus stream into docvec-shaped rows (the
    stage-1 kernel applied incrementally)."""
    an = _analyze_for(cfg)
    df = corpus_stream
    if cfg.lang is not None:
        df = df.filter(F.col("lang") == cfg.lang)
    df = df.filter(F.length(F.trim(F.col("text"))) > 0)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        for b in batches:
            out = {"url": [], "warc_ts": [], "doclen": [], "terms": [],
                   "tfs": []}
            for url, ts, text in zip(b["url"], b["warc_ts"], b["text"]):
                counts = Counter(an(text))
                terms = sorted(counts)
                tfs = [counts[t] for t in terms]
                out["url"].append(url)
                out["warc_ts"].append(ts)
                out["doclen"].append(sum(tfs))
                out["terms"].append(terms)
                out["tfs"].append(tfs)
            if out["url"]:
                yield pd.DataFrame(out)

    return df.select("url", "warc_ts", "text").mapInPandas(
        fn, schema=STREAM_DOCVEC_SCHEMA
    )


def start_corpus_ingest(spark: SparkSession, in_dir: str, out_dir: str,
                        checkpoint: str, cfg: IndexConfig,
                        available_now: bool = True):
    """Run the incremental ingest; with ``available_now`` processes all
    pending files then stops (batch-style test mode)."""
    stream = stream_tokenize(read_corpus_stream(spark, in_dir), cfg)
    writer = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_events_hourly(events_stream: DataFrame,
                         watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window per-type counts/sums (late rows
    beyond the watermark are dropped; window closes when the watermark
    passes its end)."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
