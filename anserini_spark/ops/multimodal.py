"""Multimodal-column plumbing: treat image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` kernels.

Decoding: PPM (P6) images decode FOR REAL (pure numpy header+raster
parse — no imaging library needed), with a 4x4 mean-pooled grayscale
grid as the 16-dim feature. Compressed formats (JPEG/PNG/...) raise
NotImplementedError — those codecs are not available in this
container — and ``fake=True`` substitutes a deterministic pseudo
decoder so the Spark-side plumbing (schema, batching, partitioning,
UDF signatures) is exercised end-to-end either way.
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


def _synth_ppm(i: int) -> bytes:
    """Deterministic small P6 image (seeded pixels)."""
    rng = np.random.default_rng(i)
    w, h = int(rng.integers(8, 33)), int(rng.integers(8, 33))
    raster = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + raster.tobytes()


def synth_media(spark: SparkSession, n: int = 64,
                real_images: bool = False) -> DataFrame:
    """Deterministic media table; ``real_images=True`` gives image
    rows actual PPM payloads (decodable), else opaque seeded bytes."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            kinds = [["image", "audio", "video"][int(i) % 3] for i in ids]
            payloads = []
            mimes = []
            for i, kind in zip(ids, kinds):
                if real_images and kind == "image":
                    payloads.append(_synth_ppm(int(i)))
                    mimes.append("image/x-portable-pixmap")
                else:
                    payloads.append(
                        hashlib.sha256(f"media-{int(i)}".encode()).digest() * 4
                    )
                    mimes.append("application/octet-stream")
            out = {
                "media_id": ids,
                "kind": kinds,
                "payload": payloads,
                "mime": mimes,
                "n_bytes": [len(p) for p in payloads],
            }
            yield pd.DataFrame(out)

    return spark.range(n).toDF("id").mapInPandas(gen, schema=MEDIA_SCHEMA)


def _parse_ppm_header(payload: bytes) -> tuple:
    """(width, height, maxval, raster_offset) of a binary PPM:
    header tokens after "P6" (# comments allowed), then one
    whitespace byte, then the raw RGB raster."""
    pos = 2  # past "P6"
    vals = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    return vals[0], vals[1], vals[2], pos + 1


def _decode_ppm(payload: bytes) -> dict:
    """Pure-numpy binary-PPM (P6) decode."""
    w, h, maxval, pos = _parse_ppm_header(payload)
    raster = np.frombuffer(payload, dtype=np.uint8,
                           count=w * h * 3, offset=pos)
    img = raster.reshape(h, w, 3).astype(np.float32)
    gray = img.mean(axis=2) / float(maxval)
    # 4x4 mean-pooled grid -> 16-dim feature
    ys = np.linspace(0, h, 5).astype(int)
    xs = np.linspace(0, w, 5).astype(int)
    feat = np.array(
        [gray[ys[r]:max(ys[r + 1], ys[r] + 1),
              xs[c]:max(xs[c + 1], xs[c] + 1)].mean()
         for r in range(4) for c in range(4)],
        dtype=np.float32,
    )
    return {"width": w, "height": h, "feature": feat}


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Decode an image payload: PPM (P6) decodes for real; compressed
    formats raise (no codec libraries in this container) unless
    ``fake=True``."""
    if not fake:
        if payload[:2] == b"P6":
            return _decode_ppm(payload)
        raise NotImplementedError(
            "only binary PPM (P6) is decodable without an imaging "
            "library; pass fake=True for the deterministic stub"
        )
    if payload[:2] == b"P6":
        # decodable payloads always decode for real, even in fake mode —
        # the stub exists only for opaque (compressed) bytes
        return _decode_ppm(payload)
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


def resize_image(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a binary PPM, returning a new PPM —
    real pixel work in numpy (the resize stage of a training-data
    image pipeline)."""
    w, h, _maxval, pos = _parse_ppm_header(payload)
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                           offset=pos).reshape(h, w, 3)
    ys = (np.arange(out_h) * h // out_h)
    xs = (np.arange(out_w) * w // out_w)
    out = raster[ys][:, xs]
    return f"P6\n{out_w} {out_h}\n255\n".encode() + out.tobytes()


def resize_images(media: DataFrame, out_w: int = 16,
                  out_h: int = 16) -> DataFrame:
    """mapInPandas resize over image rows -> (media_id, payload) of
    uniformly-sized PPMs."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"media_id": [], "payload": []}
            for mid, payload in zip(b["media_id"], b["payload"]):
                p = bytes(payload)
                if p[:2] != b"P6":
                    continue
                rows["media_id"].append(int(mid))
                rows["payload"].append(resize_image(p, out_w, out_h))
            if rows["media_id"]:
                yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").mapInPandas(fn, schema)


def synth_video(spark: SparkSession, n: int = 8,
                frames: int = 12) -> DataFrame:
    """Deterministic 'video' rows: payload = frame count (4 bytes BE)
    + concatenated PPM frames — the opaque-binary-column contract with
    a real, parseable container format."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            payloads = [
                frames.to_bytes(4, "big")
                + b"".join(_synth_ppm(int(i) * 1000 + f)
                           for f in range(frames))
                for i in ids
            ]
            yield pd.DataFrame({
                "media_id": ids,
                "kind": ["video"] * len(ids),
                "payload": payloads,
                "mime": ["video/x-ppm-frames"] * len(ids),
                "n_bytes": [len(p) for p in payloads],
            })

    return spark.range(n).toDF("id").mapInPandas(gen, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every: int = 4) -> DataFrame:
    """mapInPandas frame sampler over video rows: emit every
    ``every``-th frame as its own (media_id, frame_idx, payload) row —
    the frame-sampling stage of a video training pipeline. Real
    container parsing (frame count + per-frame PPM headers)."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ])

    def _split_frames(payload: bytes):
        count = int.from_bytes(payload[:4], "big")
        pos = 4
        for idx in range(count):
            frame = payload[pos:]
            assert frame[:2] == b"P6"
            w, h, _mx, off = _parse_ppm_header(frame)
            end = pos + off + w * h * 3
            yield idx, payload[pos:end]
            pos = end

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"media_id": [], "frame_idx": [], "payload": []}
            for mid, payload in zip(b["media_id"], b["payload"]):
                for idx, frame in _split_frames(bytes(payload)):
                    if idx % every == 0:
                        rows["media_id"].append(int(mid))
                        rows["frame_idx"].append(idx)
                        rows["payload"].append(frame)
            if rows["media_id"]:
                yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").mapInPandas(fn, schema)
