"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` — the arbitrary-stateful-processing surface
(beyond watermarked window aggs) for event streams.

A session = consecutive events of one user with gaps < ``gap``.
State per user: (session_start, last_ts, n_events, sum_value). A
session is emitted when a later event closes it (gap exceeded); the
final open session of each user emits only on state timeout in a live
stream — in availableNow test mode the in-data-closed sessions are the
deterministic, batch-comparable output.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.IntegerType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def _sessionize_fn(gap_us: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        ts_us = rows["ts"].astype("int64")  # epoch micros (pandas ns -> see below)
        ts_us = (ts_us // 1000).astype("int64")  # ns -> us
        vals = rows["value"].astype(float)
        if state.exists:
            start, last, n, s = state.get
        else:
            start = last = None
            n, s = 0, 0.0
        out = {"user_id": [], "session_start": [], "session_end": [],
               "n_events": [], "sum_value": []}
        for t, v in zip(ts_us, vals):
            t = int(t)
            if start is None:
                start, last, n, s = t, t, 1, float(v)
                continue
            if t - last >= gap_us:
                out["user_id"].append(user_id)
                out["session_start"].append(pd.Timestamp(start, unit="us"))
                out["session_end"].append(pd.Timestamp(last, unit="us"))
                out["n_events"].append(n)
                out["sum_value"].append(round(s, 4))
                start, last, n, s = t, t, 1, float(v)
            else:
                last, n, s = t, n + 1, s + float(v)
        state.update((start, last, n, s))
        if out["user_id"]:
            yield pd.DataFrame(out)

    return fn


def stream_sessionize(events_stream: DataFrame,
                      gap_minutes: int = 30) -> DataFrame:
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_us),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def batch_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch equivalent (lag/window), restricted to CLOSED sessions
    (each user's last session is open-ended and excluded) — the
    stream-vs-batch comparison target."""
    from pyspark.sql import Window

    gap_s = gap_minutes * 60
    w = Window.partitionBy("user_id").orderBy("ts")
    e = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .select("user_id", "ts", "value")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (F.col("prev_ts").isNull())
            | (F.col("ts").cast("long") - F.col("prev_ts").cast("long")
               >= gap_s),
        )
        .withColumn("sess_id", F.sum(F.col("new_sess").cast("long")).over(w))
    )
    sessions = e.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("int").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    last_sess = sessions.groupBy("user_id").agg(
        F.max("sess_id").alias("last_id")
    )
    return (
        sessions.join(last_sess, "user_id")
        .filter(F.col("sess_id") != F.col("last_id"))
        .select("user_id", "session_start", "session_end", "n_events",
                "sum_value")
    )
