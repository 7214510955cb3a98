"""Deduplication operators for training-data pipelines, over the
``documents`` table. Exact + n-gram Jaccard have DuckDB oracles
(portable md5 / pure relational); MinHash-LSH and SimHash use
Spark's xxhash64 (no DuckDB equivalent -> rows-only driver check,
plus pytest assertions against brute-force Jaccard).

Scale notes:
* exact_dedup — hash-groupBy; one shuffle on a 128-bit digest, no skew
  (hash keys uniform).
* minhash_lsh — shingle -> P minhashes -> band buckets -> self-join on
  (band, bucket). The candidate join is the only shuffle; banding keeps
  it sparse. Candidate pairs are then verified with exact Jaccard, so
  output quality does not depend on LSH luck.
* simhash — 64-bit signature per doc via weighted term-hash bit votes;
  near-dup = popcount(sig_a XOR sig_b) <= radius over LSH-banded
  candidates (here: exact 16-bit chunk match as the band key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_HASHES = 32
N_BANDS = 8          # 8 bands x 4 rows
SHINGLE = 3
JACCARD_THRESHOLD = 0.5


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        .select("doc_id", "text")
    )


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per doc: canonical = min doc_id sharing the same md5(text);
    is_dup marks rows that an exact-dedup pass would drop
    (`IndexCollection.java:213-215` docid-upsert analogue, applied to
    content hashes)."""
    d = _docs(spark, sf_dir).withColumn("h", F.md5(F.col("text")))
    w = Window.partitionBy("h")
    return (
        d.withColumn("canonical", F.min("doc_id").over(w))
        .withColumn("is_dup", (F.col("doc_id") != F.col("canonical")))
        .select("doc_id", "canonical", "is_dup")
    )


def _shingles(spark: SparkSession, sf_dir: str, max_doc: int | None = None) -> DataFrame:
    d = _docs(spark, sf_dir)
    if max_doc is not None:
        d = d.filter(F.col("doc_id") < max_doc)
    toks = d.withColumn(
        "toks", F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    ).filter(F.size("toks") >= SHINGLE)
    sh = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(toks) - {SHINGLE}),"
                f" i -> concat_ws(' ', slice(toks, i + 1, {SHINGLE})))"
            )
        ).alias("shingle"),
    ).filter(F.col("shingle") != "")
    return sh.distinct()


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str,
                        max_doc: int = 200) -> DataFrame:
    """Exact token-3-gram Jaccard >= 0.5 pairs among doc_id < max_doc
    (the brute-force baseline the LSH path approximates)."""
    sh = _shingles(spark, sf_dir, max_doc)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def _signatures_from_shingles(sh: DataFrame) -> DataFrame:
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[f"h{i}" for i in range(N_HASHES)]).alias("minhash")
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, array<long> minhash) with N_HASHES permutations
    h_i(x) = xxhash64(shingle, seed=i)."""
    return _signatures_from_shingles(_shingles(spark, sf_dir))


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates (band-bucket join) verified by exact Jaccard on
    the candidate set only — the scalable near-dup path. The shingle
    table feeds the signature build AND the verify join, so it is
    persisted for the run (one tokenize pass, three consumers)."""
    sh_cached = _shingles(spark, sf_dir).persist()
    sig = _signatures_from_shingles(sh_cached)
    rows_per_band = N_HASHES // N_BANDS
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[
                                F.col("minhash")[bi * rows_per_band + r]
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for bi in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # verify candidates with exact Jaccard over shingle sets
    sh = sh_cached
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle"))
    inter = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per doc: sign(sum over terms of tf * (+/-1 per
    bit of xxhash64(term)))."""
    d = _docs(spark, sf_dir)
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", F.xxhash64("term"))
    )
    bit_votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                   F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"b{i}")
        for i in range(64)
    ]
    votes = tf.groupBy("doc_id").agg(*bit_votes)
    sig = votes.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(0)
                * F.lit(1 << i).cast("long")
                for i in range(63)  # bit 63 left clear: keep sign positive
            ]
        ).alias("simhash"),
    )
    return sig


def simhash_pairs(spark: SparkSession, sf_dir: str, radius: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming distance <= radius, candidate-joined
    on exact match of one of four 16-bit chunks (pigeonhole: any pair
    within radius 3 shares at least one exact chunk)."""
    sig = simhash_signatures(spark, sf_dir)
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cv"),
    ).select("doc_id", "simhash", "cv.chunk", "cv.val")
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= radius)
        .select("doc_a", "doc_b", "hamming")
    )
