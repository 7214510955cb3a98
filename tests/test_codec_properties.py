"""Property-based codec tests (hypothesis): varint, posting blocks
(with and without positions), and SmallFloat byte4 — roundtrip
identity over adversarial inputs, not just fixtures. No Spark."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from anserini_spark.index.blocks import (
    decode_block_run,
    decode_positions_run,
    encode_blocks,
)
from anserini_spark.index.codec import varint_decode, varint_encode
from anserini_spark.search.smallfloat import (
    byte4_to_int,
    int_to_byte4,
    quantize_length,
)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = varint_decode(varint_encode(arr), len(vals))
    assert out.tolist() == vals


@st.composite
def posting_runs(draw):
    n = draw(st.integers(min_value=1, max_value=300))
    # sorted unique doc ids with adversarial gaps (incl. crossing the
    # RANGE_SHIFT bucket boundary at 2**14)
    gaps = draw(st.lists(
        st.integers(min_value=1, max_value=2**20), min_size=n, max_size=n))
    docs = np.cumsum(np.array(gaps, dtype=np.int64))
    tfs = np.array(draw(st.lists(
        st.integers(min_value=1, max_value=9), min_size=n, max_size=n)),
        dtype=np.int64)
    dls = np.array(draw(st.lists(
        st.integers(min_value=1, max_value=10**6), min_size=n, max_size=n)),
        dtype=np.int64)
    return docs, tfs, dls


@given(posting_runs(), st.integers(min_value=2, max_value=64),
       st.booleans())
@settings(max_examples=60, deadline=None)
def test_block_roundtrip(run, block_size, with_positions):
    docs, tfs, dls = run
    n = len(docs)
    terms = np.array(["t"] * n, dtype=object)
    segs = np.zeros(n, dtype=np.int64)
    positions = None
    if with_positions:
        rng = np.random.default_rng(int(docs[0]) % 2**31)
        positions = np.array(
            [np.sort(rng.choice(10**6, int(t), replace=False)).tolist()
             for t in tfs],
            dtype=object,
        )
    df = encode_blocks(terms, segs, docs, tfs, dls, block_size,
                       positions=positions)
    d2, t2, l2 = decode_block_run(
        list(df["docs_bin"]), list(df["tfs_bin"]), list(df["dls_bin"]),
        df["n"].to_numpy(), df["first_doc"].to_numpy(),
        df["last_doc"].to_numpy(),
    )
    assert d2.tolist() == docs.tolist()
    assert t2.tolist() == tfs.tolist()
    assert l2.tolist() == dls.tolist()
    # block-max metadata invariants
    assert int(df["n"].sum()) == n
    assert int(df["sum_tf"].sum()) == int(tfs.sum())
    assert int(df["max_tf"].max()) == int(tfs.max())
    assert int(df["min_dl"].min()) == int(dls.min())
    if with_positions:
        flat, starts = decode_positions_run(list(df["pos_bin"]), t2)
        got = [flat[starts[i]:starts[i] + t2[i]].tolist()
               for i in range(n)]
        assert got == [list(p) for p in positions]


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=300, deadline=None)
def test_smallfloat_properties(i):
    code = int_to_byte4(i)
    q = byte4_to_int(code)
    assert 0 <= code < 256
    assert q <= i
    sh = max(0, i.bit_length() - 4)
    assert q == (i >> sh) << sh
    assert int(quantize_length(np.array([i]))[0]) == q


@st.composite
def multi_term_runs(draw):
    """(code, seg, doc)-sorted postings over several terms/segments
    with adversarial gaps, as the map-side flush sees them."""
    nterm = draw(st.integers(min_value=1, max_value=6))
    rows = []
    for code in range(nterm):
        for seg in draw(st.lists(st.integers(0, 3), min_size=1,
                                 max_size=2, unique=True)):
            n = draw(st.integers(min_value=1, max_value=60))
            gaps = draw(st.lists(st.integers(1, 2**20),
                                 min_size=n, max_size=n))
            docs = (np.int64(seg) << np.int64(33)) + np.cumsum(
                np.array(gaps, dtype=np.int64))
            tfs = draw(st.lists(st.integers(1, 300),
                                min_size=n, max_size=n))
            dls = draw(st.lists(st.integers(1, 10**6),
                                min_size=n, max_size=n))
            for i in range(n):
                rows.append((code, seg, int(docs[i]), tfs[i], dls[i]))
    rows.sort()
    return rows


@given(multi_term_runs(), st.integers(min_value=2, max_value=64),
       st.booleans())
@settings(max_examples=40, deadline=None)
def test_encode_blocks_arrow_property_parity(rows, block_size, with_pos):
    """The Arrow-native flush encoder (hot path since round 6) is
    bit-identical to the pandas oracle over adversarial multi-term
    multi-segment runs, positions included."""
    import pyarrow as pa

    from anserini_spark.index.blocks import encode_blocks_arrow

    codes = np.array([r[0] for r in rows], dtype=np.int64)
    segs = np.array([r[1] for r in rows], dtype=np.int64)
    docs = np.array([r[2] for r in rows], dtype=np.int64)
    tfs = np.array([r[3] for r in rows], dtype=np.int64)
    dls = np.array([r[4] for r in rows], dtype=np.int64)
    vocab = pa.array([f"term{c}" for c in range(int(codes.max()) + 1)])
    terms = np.array([f"term{c}" for c in codes], dtype=object)
    positions = None
    pos_arr = None
    if with_pos:
        rng = np.random.default_rng(len(rows))
        plists = [np.sort(rng.choice(10**6, int(t),
                                     replace=False)).tolist()
                  for t in tfs]
        positions = np.empty(len(rows), dtype=object)
        positions[:] = plists
        pos_arr = pa.array(plists, type=pa.list_(pa.int32()))
    fields = [
        pa.field("term", pa.string()), pa.field("segment", pa.int32()),
        pa.field("first_doc", pa.int64()), pa.field("last_doc", pa.int64()),
        pa.field("n", pa.int32()), pa.field("max_tf", pa.int32()),
        pa.field("min_dl", pa.int64()), pa.field("sum_tf", pa.int64()),
        pa.field("docs_bin", pa.binary()), pa.field("tfs_bin", pa.binary()),
        pa.field("dls_bin", pa.binary()),
    ]
    if with_pos:
        fields.append(pa.field("pos_bin", pa.binary()))
    expected = encode_blocks(terms, segs, docs, tfs, dls, block_size,
                             positions=positions)
    got = encode_blocks_arrow(codes, vocab, segs, docs, tfs, dls,
                              pa.schema(fields), block_size,
                              positions=pos_arr).to_pandas()
    assert list(got.columns) == list(expected.columns)
    for c in expected.columns:
        assert (got[c].to_numpy(dtype=object)
                == expected[c].to_numpy(dtype=object)).all(), c
