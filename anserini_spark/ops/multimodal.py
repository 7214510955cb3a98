"""Multimodal-column plumbing: treat image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` kernels.

The decode step is STUBBED (image/audio libraries are not available in
this container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (payload
bytes -> pseudo dimensions/features) exercises the real Spark-side
plumbing — schema, batching, partitioning, UDF signatures — which is
what the tests pin.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),     # image|audio|video
        T.StructField("payload", T.BinaryType(), False),  # opaque bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            out = {
                "media_id": ids,
                "kind": [["image", "audio", "video"][int(i) % 3] for i in ids],
                "payload": [
                    hashlib.sha256(f"media-{int(i)}".encode()).digest() * 4
                    for i in ids
                ],
                "mime": ["application/octet-stream"] * len(ids),
                "n_bytes": [128] * len(ids),
            }
            yield pd.DataFrame(out)

    return spark.range(n).toDF("id").mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Real decoder stub — container has no image libs."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library not present in "
            "this container; pass fake=True for the deterministic stub"
        )
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0],
        "height": 64 + h[1],
        "feature": (np.frombuffer(h, dtype=np.uint8)[:16] / 255.0).astype(
            np.float32
        ),
    }


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over image rows: the real
    Arrow-batch plumbing around the (stubbed) decoder."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"media_id": [], "width": [], "height": [], "feature": []}
            for mid, payload in zip(b["media_id"], b["payload"]):
                d = decode_image(bytes(payload), fake=fake)
                rows["media_id"].append(int(mid))
                rows["width"].append(d["width"])
                rows["height"].append(d["height"])
                rows["feature"].append(d["feature"])
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").mapInPandas(
        fn, schema=FEATURES_SCHEMA
    )
