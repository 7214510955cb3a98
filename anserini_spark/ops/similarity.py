"""Similarity search over the ``embeddings`` table
(vec_id bigint, embedding array<float>, label int).

* ``cosine_topk`` — brute-force cosine top-k against a fixed query
  vector (vec_id = 0), computed with built-in higher-order functions
  (``aggregate``/``zip_with`` — JVM-side, no Python). DuckDB oracle via
  ``list_cosine_similarity``.
* ``ann_lsh_topk`` — the scale path: random-hyperplane LSH bucketing
  (deterministic pseudo-hyperplanes derived from xxhash64, so no RNG
  state is shipped); candidates = vectors sharing a band bucket with
  the query, re-ranked by exact cosine. Rows-only driver check
  (hash-dependent); pytest asserts recall vs the brute-force path.

The reference inventories this space as `ann/` (fake-words / lexlsh
encodings, `ann/IndexVectors.java:51-95`) — out of its own core, but
first-class here for training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOPK = 10
N_PLANES = 16          # LSH: 16 hyperplane bits -> 4 bands x 4 bits
N_BANDS = 4


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
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("vec_id", "rank", "cosine")
    )


def _lsh_bits(vec_col, dim: int):
    """Deterministic random-hyperplane signature: plane p's component d
    is +1/-1 from the parity of xxhash64(p * 1000003 + d). Returns an
    array<int> of N_PLANES sign bits."""
    bits = []
    for p in range(N_PLANES):
        comps = F.array(
            *[
                F.when(
                    F.xxhash64(F.lit(p * 1000003 + d)).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
                for d in range(dim)
            ]
        )
        proj = F.aggregate(
            F.zip_with(vec_col, comps, lambda x, c: x * c),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)))
    return F.array(*bits)


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-10 vs vec_id=0: candidates share
    >=1 of 4 LSH band values with the query; exact cosine re-rank."""
    e = _emb(spark, sf_dir)
    dim = len(e.select("embedding").first()["embedding"])
    sig = e.withColumn("bits", _lsh_bits(F.col("embedding"), dim))
    per_band = N_PLANES // N_BANDS
    bands = sig.select(
        "vec_id",
        "embedding",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            "",
                            *[
                                F.col("bits")[bi * per_band + r].cast("string")
                                for r in range(per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for bi in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "embedding", "bb.band", "bb.bucket")
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
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("vec_id", "rank", "cosine")
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
    }
