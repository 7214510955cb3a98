"""Stateful streaming sessionization == batch sessionization for
in-data-closed sessions."""

import os
import shutil


def test_stream_sessionize_matches_batch(spark, tmp_path):
    from anserini_spark.streaming.sessionize import (
        batch_sessionize,
        stream_sessionize,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    in_dir = str(tmp_path / "ev_in")
    os.makedirs(in_dir)
    shutil.copy(src, os.path.join(in_dir, "events.parquet"))
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(in_dir)
    out = str(tmp_path / "sessions")
    q = (
        stream_sessionize(stream, gap_minutes=30)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]):
        (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"]):
        (r["n_events"], r["sum_value"])
        for r in batch_sessionize(spark.read.parquet(src),
                                  gap_minutes=30).collect()
    }
    assert got
    assert got == want
