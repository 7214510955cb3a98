"""Baseline-JPEG codec tests (pure numpy/stdlib — no Spark session).

The decoder reads DQT/DHT from the stream, so these round-trips also
certify it against any baseline encoder's output shape: quality-100
Annex-K tables reduce quantization to identity and leave only DCT
float rounding, bounding the loss we assert on.
"""

import struct

import numpy as np
import pytest

from anserini_spark.ops.jpeg import (
    _ZZ,
    _scaled_qt,
    _QT_LUMA,
    decode_jpeg,
    encode_jpeg,
)


def test_zigzag_is_the_standard_order():
    # spot-check the generated jpeg natural order against the spec's
    # first/last entries and involution properties
    assert list(_ZZ[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(_ZZ[-4:]) == [47, 55, 62, 63]
    assert sorted(_ZZ) == list(range(64))


def test_quality_scaling():
    assert np.array_equal(_scaled_qt(_QT_LUMA, 50), _QT_LUMA)
    assert _scaled_qt(_QT_LUMA, 100).max() == 1  # near-lossless
    assert (_scaled_qt(_QT_LUMA, 10) >= _QT_LUMA).all()  # coarser


@pytest.mark.parametrize("shape", [(8, 8), (21, 17), (16, 40)])
def test_grey_roundtrip(shape):
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=100))
    assert out.shape == shape
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 2


@pytest.mark.parametrize("shape", [(24, 24, 3), (19, 23, 3), (8, 64, 3)])
def test_rgb_444_roundtrip(shape):
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=100))
    assert out.shape == shape
    # quality 100 + 4:4:4: only DCT + YCbCr rounding remains
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_flat_image_exact():
    px = np.full((16, 16, 3), 128, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=100))
    assert np.array_equal(out, px)


def test_420_subsampled_smooth_gradient():
    """4:2:0 halves chroma resolution; a smooth gradient must still
    come back close (hard pixel noise would not — that's the point of
    subsampling)."""
    xx, yy = np.meshgrid(np.arange(32), np.arange(32))
    px = np.stack([xx * 4, yy * 4, (xx + yy) * 2], axis=2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=95, subsample=True))
    assert out.shape == px.shape
    assert np.abs(out.astype(int) - px.astype(int)).mean() < 3.0


def test_420_odd_dimensions():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (19, 23, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=90, subsample=True))
    assert out.shape == px.shape  # padding cropped back off


@pytest.mark.parametrize("interval", [1, 2, 5])
def test_restart_intervals(interval):
    """DRI/RSTn path: encoder resets DC predictors and emits markers
    every `interval` MCUs; decoder resynchronizes at each one. With
    many MCUs the RSTn index wraps mod 8, covering that too."""
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (24, 80, 3), dtype=np.uint8)  # 30 MCUs
    payload = encode_jpeg(px, quality=100, restart_interval=interval)
    assert b"\xff\xdd" in payload  # DRI segment present
    out = decode_jpeg(payload)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_lossy_quality_monotone():
    """Lower quality must not beat higher quality on reconstruction
    error, and must produce a smaller payload on natural content."""
    xx, yy = np.meshgrid(np.arange(48), np.arange(48))
    base = (np.sin(xx / 5) * 60 + np.cos(yy / 7) * 60 + 128)
    px = np.clip(np.stack([base, base * 0.8, base * 1.1], axis=2),
                 0, 255).astype(np.uint8)
    errs, sizes = [], []
    for q in (95, 50, 10):
        payload = encode_jpeg(px, quality=q)
        out = decode_jpeg(payload)
        errs.append(np.abs(out.astype(int) - px.astype(int)).mean())
        sizes.append(len(payload))
    assert errs[0] <= errs[1] <= errs[2]
    assert sizes[0] >= sizes[1] >= sizes[2]


def test_progressive_raises():
    """A SOF2 (progressive) frame header must raise NotImplementedError
    loudly, not mis-decode."""
    px = np.zeros((8, 8), dtype=np.uint8)
    payload = bytearray(encode_jpeg(px))
    i = payload.find(b"\xff\xc0")
    assert i > 0
    payload[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(bytes(payload))


def test_16bit_dqt_raises():
    px = np.zeros((8, 8), dtype=np.uint8)
    payload = bytearray(encode_jpeg(px))
    i = payload.find(b"\xff\xdb")
    payload[i + 4] |= 0x10  # precision nibble -> 16-bit
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_jpeg(bytes(payload))


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"P6\n1 1\n255\nabc")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0JFIF-like")  # truncated garbage


def test_decoder_ignores_appn_and_comments():
    """APPn/COM segments between SOI and SOF must be skipped (real
    files carry EXIF/comments)."""
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    payload = bytearray(encode_jpeg(px, quality=100))
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    out = decode_jpeg(bytes(payload[:2]) + com + bytes(payload[2:]))
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 2
