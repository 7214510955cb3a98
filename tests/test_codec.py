"""Posting codec roundtrips (delta+varint + block metadata)."""

import numpy as np

from anserini_spark.index.blocks import decode_block_run, encode_blocks
from anserini_spark.index.codec import (
    decode_doc_deltas,
    encode_doc_deltas,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_random():
    rng = np.random.default_rng(3)
    for _ in range(10):
        vals = rng.integers(0, 1 << 50, int(rng.integers(1, 500))).astype(np.uint64)
        assert (varint_decode(varint_encode(vals), len(vals)) == vals).all()


def test_varint_boundaries():
    vals = np.array(
        [0, 1, 127, 128, 16383, 16384, (1 << 21) - 1, 1 << 21, (1 << 35),
         (1 << 49) + 17], dtype=np.uint64)
    assert (varint_decode(varint_encode(vals)) == vals).all()


def test_varint_empty():
    assert varint_decode(varint_encode(np.array([], dtype=np.uint64))).size == 0


def test_delta_roundtrip():
    docs = np.array([5, 6, 100, 101, 10**9], dtype=np.int64)
    enc = encode_doc_deltas(docs, int(docs[0]))
    assert (decode_doc_deltas(enc, int(docs[0]), len(docs)) == docs).all()


def test_block_encode_decode_roundtrip():
    rng = np.random.default_rng(17)
    rows = []
    for term in ["aa", "bb", "cc", "zz"]:
        for seg in [0, 2]:
            ndocs = int(rng.integers(1, 700))
            docs = np.sort(
                rng.choice(np.arange(seg << 40, (seg << 40) + 9000), ndocs,
                           replace=False))
            for d in docs:
                rows.append((term, seg, int(d), int(rng.integers(1, 40)),
                             int(rng.integers(1, 3000))))
    rows.sort(key=lambda r: (r[0], r[2]))
    terms = np.array([r[0] for r in rows], dtype=object)
    segs = np.array([r[1] for r in rows])
    docs = np.array([r[2] for r in rows])
    tfs = np.array([r[3] for r in rows])
    dls = np.array([r[4] for r in rows])
    bl = encode_blocks(terms, segs, docs, tfs, dls)
    assert int(bl["n"].sum()) == len(rows)
    assert (bl["n"] <= 128).all()
    for (t, s), g in bl.groupby(["term", "segment"], sort=False):
        dd, tt, ll = decode_block_run(
            list(g["docs_bin"]), list(g["tfs_bin"]), list(g["dls_bin"]),
            g["n"].values, g["first_doc"].values, g["last_doc"].values)
        mask = (terms == t) & (segs == s)
        assert (dd == docs[mask]).all()
        assert (tt == tfs[mask]).all()
        assert (ll == dls[mask]).all()
        assert g["max_tf"].max() == tfs[mask].max()
        assert g["min_dl"].min() == dls[mask].min()
        assert g["sum_tf"].sum() == tfs[mask].sum()


def test_blocks_never_span_segments():
    terms = np.array(["t"] * 10, dtype=object)
    segs = np.array([0] * 5 + [1] * 5)
    docs = np.array(list(range(5)) + [(1 << 40) + i for i in range(5)])
    tfs = np.ones(10, dtype=np.int64)
    dls = np.ones(10, dtype=np.int64)
    bl = encode_blocks(terms, segs, docs, tfs, dls)
    assert len(bl) == 2
    assert set(bl["segment"]) == {0, 1}
