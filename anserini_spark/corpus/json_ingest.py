"""JSON/JSONL collection ingest — the reference's ``JsonCollection``
(`collection/JsonCollection.java:68-183`): files of JSON objects (one
per line, an array, or a single object) with required ``id`` and
``contents`` fields; every other field becomes a multifield entry
(`MultifieldSourceDocument`). This is the MS MARCO corpus path.

Spark mapping: ``spark.read.json`` (built-in, schema-inferred or
given) projected into the engine's corpus shape — ``id -> url``,
``contents -> text`` — so the same ``build_index`` consumes it; extra
fields are carried as a ``map<string,string>`` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_json_collection(spark: SparkSession, path: str,
                         id_field: str = "id",
                         contents_field: str = "contents",
                         lang: str = "en") -> DataFrame:
    """Read a JSONL collection into the engine corpus shape
    ``(url, warc_ts, html, text, lang, fields)``."""
    raw = spark.read.json(path)
    cols = set(raw.columns)
    if id_field not in cols or contents_field not in cols:
        raise ValueError(
            f"JsonCollection needs '{id_field}' and '{contents_field}' "
            f"fields; found {sorted(cols)}"
        )
    extra = sorted(cols - {id_field, contents_field})
    fields = (
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in extra]),
            F.array(*[F.col(c).cast("string") for c in extra]),
        )
        if extra
        else F.map_from_arrays(F.array(), F.array())
    )
    return raw.select(
        F.col(id_field).cast("string").alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col(contents_field).cast("string").alias("text"),
        F.lit(lang).alias("lang"),
        fields.alias("fields"),
    )
