"""Similarity search over the ``embeddings`` table
(vec_id bigint, embedding array<float>, label int).

* ``cosine_topk`` — brute-force cosine top-k against a fixed query
  vector (vec_id = 0), computed with built-in higher-order functions
  (``aggregate``/``zip_with`` — JVM-side, no Python). DuckDB oracle via
  ``list_cosine_similarity``.
* ``ann_lsh_topk`` — the scale path: random-hyperplane LSH bucketing;
  candidates = vectors sharing a band bucket with the query, re-ranked
  by exact cosine. Rows-only driver check (plane-dependent); pytest
  asserts recall vs the brute-force path, incl. at dim=256.

Scale notes (the two round-1 scale-killers, both fixed):

* top-k is ``orderBy(...).limit(k)`` — Spark's TakeOrderedAndProject
  physical operator (per-partition heap top-k, tiny driver merge) —
  NOT a global single-partition window. Ranks are assigned afterwards
  on the k-row result.
* LSH signatures come from ONE matmul per Arrow batch against a
  deterministic ±1 hyperplane matrix held in the UDF closure
  (16 x dim floats — broadcast with the task), not from dim x planes
  literal Catalyst expressions; plan size is O(1) in the embedding
  dimension.

The reference inventories this space as `ann/` (fake-words / lexlsh
encodings, `ann/IndexVectors.java:51-95`) — out of its own core, but
first-class here for training-data pipelines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

TOPK = 10
N_PLANES = 16          # LSH: 16 hyperplane bits -> 4 bands x 4 bits
N_BANDS = 4
PLANE_SEED = 0x1505    # fixed seed -> deterministic planes, no RNG state shipped


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def _ranked_topk(scored: DataFrame, k: int = TOPK) -> DataFrame:
    """Distributed top-k: TakeOrderedAndProject via orderBy().limit(k),
    then rank assignment over the k surviving rows (trivial window)."""
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "vec_id", "rank", "cosine"
    )


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most-cosine-similar vectors to vec_id=0 (excluded),
    tie-broken by vec_id."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding")
    )
    scored = (
        e.filter(F.col("vec_id") > 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("q_embedding"))
                / (_norm(F.col("embedding")) * _norm(F.col("q_embedding"))),
                4,
            ).alias("cosine"),
        )
    )
    return _ranked_topk(scored)


def _plane_matrix(dim: int) -> np.ndarray:
    """Deterministic ±1 hyperplane matrix (N_PLANES x dim). PCG64 with
    a fixed seed is platform-stable, so signatures are reproducible."""
    rng = np.random.default_rng(PLANE_SEED)
    return rng.choice(np.array([-1.0, 1.0]), size=(N_PLANES, dim))


def _band_buckets_udf(dim: int):
    """array<float> embedding -> array<int> of N_BANDS band-bucket
    values. One (batch x dim) @ (dim x N_PLANES) matmul per Arrow
    batch; the plane matrix rides in the closure (tiny)."""
    planes = _plane_matrix(dim)
    per_band = N_PLANES // N_BANDS
    weights = (1 << np.arange(per_band)).astype(np.int64)

    @pandas_udf("array<int>")
    def band_buckets(emb: pd.Series) -> pd.Series:
        m = np.vstack(emb.to_numpy()).astype(np.float64)
        bits = (m @ planes.T) >= 0                       # (batch, N_PLANES)
        vals = (
            bits.reshape(len(m), N_BANDS, per_band) * weights
        ).sum(axis=2).astype(np.int32)                   # (batch, N_BANDS)
        return pd.Series(list(vals))

    return band_buckets


def ann_lsh_topk(spark: SparkSession, sf_dir: str,
                 emb: DataFrame | None = None) -> DataFrame:
    """LSH-bucketed approximate top-10 vs vec_id=0: candidates share
    >=1 of 4 LSH band values with the query; exact cosine re-rank."""
    e = emb if emb is not None else _emb(spark, sf_dir)
    dim = len(e.select("embedding").first()["embedding"])
    buckets = _band_buckets_udf(dim)
    sig = e.select("vec_id", "embedding",
                   buckets(F.col("embedding")).alias("buckets"))
    bands = sig.select(
        "vec_id", "embedding",
        F.posexplode("buckets").alias("band", "bucket"),
    )
    qb = bands.filter(F.col("vec_id") == 0).select(
        "band", "bucket", F.col("embedding").alias("q_embedding")
    )
    cand = (
        bands.filter(F.col("vec_id") > 0)
        .join(F.broadcast(qb), ["band", "bucket"])
        .select("vec_id", "embedding", "q_embedding")
        .dropDuplicates(["vec_id"])
    )
    scored = cand.select(
        "vec_id",
        F.round(
            _dot(F.col("embedding"), F.col("q_embedding"))
            / (_norm(F.col("embedding")) * _norm(F.col("q_embedding"))),
            4,
        ).alias("cosine"),
    )
    return _ranked_topk(scored)


NEARDUP_THRESHOLD = 0.4
NEARDUP_MAX_VEC = 500


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str,
                            threshold: float = NEARDUP_THRESHOLD,
                            max_vec: int = NEARDUP_MAX_VEC) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, EXACT all-pairs over
    vec_id < max_vec — like ``ngram_jaccard_pairs``, this is the
    deliberately bounded brute baseline the LSH path approximates
    (oracled against DuckDB). (doc_a, doc_b, cosine) with a < b."""
    e = _emb(spark, sf_dir).filter(F.col("vec_id") < max_vec).select(
        "vec_id", "embedding"
    )
    a = e.select(F.col("vec_id").alias("doc_a"),
                 F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("doc_b"),
                 F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            F.round(_dot(F.col("ea"), F.col("eb"))
                    / (_norm(F.col("ea")) * _norm(F.col("eb"))), 4)
            .alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_neardup_lsh(spark: SparkSession, sf_dir: str,
                          threshold: float = NEARDUP_THRESHOLD,
                          emb: DataFrame | None = None) -> DataFrame:
    """The scale path: candidate pairs share >=1 LSH band bucket
    (same banded-signature join as ``ann_lsh_topk`` — no all-pairs
    crossJoin), then exact-cosine verify on candidates only. Recall
    vs the exact baseline is pinned by pytest on a clustered fixture;
    the driver records a rows-only check (plane-dependent)."""
    e = emb if emb is not None else _emb(spark, sf_dir)
    e = e.select("vec_id", "embedding")
    dim = len(e.select("embedding").first()["embedding"])
    buckets = _band_buckets_udf(dim)
    bands = e.select(
        "vec_id", "embedding",
        buckets(F.col("embedding")).alias("buckets"),
    ).select(
        "vec_id", "embedding",
        F.posexplode("buckets").alias("band", "bucket"),
    )
    a = bands.select(F.col("band"), F.col("bucket"),
                     F.col("vec_id").alias("doc_a"),
                     F.col("embedding").alias("ea"))
    b = bands.select(F.col("band"), F.col("bucket"),
                     F.col("vec_id").alias("doc_b"),
                     F.col("embedding").alias("eb"))
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.select(
            "doc_a", "doc_b",
            F.round(_dot(F.col("ea"), F.col("eb"))
                    / (_norm(F.col("ea")) * _norm(F.col("eb"))), 4)
            .alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def oracle_sqls() -> dict[str, str]:
    return {
        "cosine_topk": f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         round(list_cosine_similarity(e.embedding, q.qe), 4) AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id > 0
)
SELECT vec_id, rank, cosine FROM (
  SELECT vec_id, cosine,
         row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {TOPK}
""",
        "embedding_neardup_pairs": f"""
WITH e AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {NEARDUP_MAX_VEC}
)
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
       round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding, b.embedding), 4)
      >= {NEARDUP_THRESHOLD}
""",
    }


IVF_NLIST = 16
IVF_NPROBE = 4


def _kmeans(sample: "np.ndarray", nlist: int, iters: int = 12,
            seed: int = PLANE_SEED) -> "np.ndarray":
    """Deterministic Lloyd k-means on a driver-side sample (the coarse
    quantizer training step of an IVF index). O(sample x nlist) —
    the sample is bounded, never the corpus."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    centroids = sample[rng.choice(n, size=min(nlist, n), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            m = assign == c
            if m.any():
                centroids[c] = sample[m].mean(axis=0)
    return centroids


def _cell_udf(centroids: "np.ndarray"):
    """array<float> -> nearest-centroid id; one matmul per Arrow batch
    (||x-c||^2 = ||x||^2 - 2x.c + ||c||^2; ||x||^2 constant per row)."""
    c = centroids.astype(np.float64)
    c_norm = (c ** 2).sum(axis=1)

    @pandas_udf("int")
    def cell(emb: pd.Series) -> pd.Series:
        m = np.vstack(emb.to_numpy()).astype(np.float64)
        scores = m @ c.T - 0.5 * c_norm  # argmin of -2x.c + ||c||^2
        return pd.Series(scores.argmax(axis=1).astype(np.int32))

    return cell


def ann_ivf_topk(spark: SparkSession, sf_dir: str,
                 emb: DataFrame | None = None,
                 nlist: int = IVF_NLIST, nprobe: int = IVF_NPROBE,
                 sample_n: int = 4096) -> DataFrame:
    """IVF approximate top-10 vs vec_id=0: a coarse k-means quantizer
    (trained on a bounded deterministic sample) partitions vectors
    into cells; the query probes its ``nprobe`` nearest cells and
    exact cosine re-ranks only those candidates. The second scale
    path beside ``ann_lsh_topk``: candidate volume ~ nprobe/nlist of
    the corpus, and the cell assignment is one matmul per Arrow
    batch."""
    e = emb if emb is not None else _emb(spark, sf_dir)
    e = e.select("vec_id", "embedding")
    sample = np.array(
        [r["embedding"] for r in
         e.orderBy("vec_id").limit(sample_n).collect()],
        dtype=np.float64,
    )
    centroids = _kmeans(sample, nlist)
    cell = _cell_udf(centroids)
    cells = e.withColumn("cell", cell(F.col("embedding")))

    q = e.filter(F.col("vec_id") == 0).first()
    qv = np.array(q["embedding"], dtype=np.float64)
    d = ((centroids - qv[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in d.argsort()[:nprobe]]

    qdf = spark.createDataFrame(
        [([float(x) for x in qv],)], "q_embedding array<float>"
    )
    scored = (
        cells.filter(F.col("vec_id") > 0)
        .filter(F.col("cell").isin(probe))
        .crossJoin(F.broadcast(qdf))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("q_embedding"))
                / (_norm(F.col("embedding")) * _norm(F.col("q_embedding"))),
                4,
            ).alias("cosine"),
        )
    )
    return _ranked_topk(scored)
