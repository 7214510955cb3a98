"""Windowed event aggregation over the ``events`` table — the batch
form of the Structured Streaming pipeline in
`anserini_spark/streaming/` (same transform applied to a stream).
Exact DuckDB oracle via date_trunc."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deliberately NOT fanned out (util/scans.py): the hourly rollup's
    # partial aggregate collapses rows inside the scan task, so a
    # pre-aggregation repartition would shuffle raw events only to
    # parallelize work the map-side combine already makes cheap —
    # measured 0.5 s -> 1.2 s when fanned out at sf1.0
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def oracle_sqls() -> dict[str, str]:
    return {
        "events_hourly": """
SELECT date_trunc('hour', ts) AS hour,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2
""",
    }
