"""Deduplication operators for training-data pipelines, over the
``documents`` table. ALL of them are externally verifiable now:
exact + n-gram Jaccard are pure relational/md5; MinHash-LSH emits
exact-Jaccard-verified pairs at a gate banding whose recall is ~1 by
construction (so brute-force Jaccard is its oracle); SimHash hashes
terms with md5 (identical in Spark and DuckDB), so its signatures —
and therefore its pairs — are recomputable in SQL.

Scale notes:
* exact_dedup — hash-groupBy; one shuffle on a 128-bit digest, no skew
  (hash keys uniform).
* minhash_lsh — shingle -> P minhashes -> band buckets -> self-join on
  (band, bucket). The candidate join is the only shuffle; banding keeps
  it sparse. Candidate pairs are then verified with exact Jaccard, so
  output quality does not depend on LSH luck.
* simhash — 60-bit signature per doc via weighted term-hash bit votes,
  computed in ONE doc-local Arrow pass (per-doc term counts + md5
  hashes + votes inside the kernel, zero shuffle — round 7); near-dup
  = popcount(sig_a XOR sig_b) <= radius over banded candidates (exact
  15-bit chunk match as the band key — pigeonhole-complete at
  radius 3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

N_HASHES = 32
N_BANDS = 8          # scale default: 8 bands x 4 rows
SHINGLE = 3
JACCARD_THRESHOLD = 0.5

# gate banding: 16 bands x 2 rows over the same 32-hash signature.
# P(pair at Jaccard j misses every band) = (1 - j^2)^16 — 3.4e-12 at
# j = 0.9 and still 2e-5 at j = 0.7 — so the exact-verified output
# equals brute-force Jaccard >= 0.5 with near-certainty, making the
# all-pairs SQL recompute a legitimate oracle. The selective 8x4
# banding stays the scale default (sparser candidate join); its
# recall is pinned by pytest against the brute baseline.
GATE_BANDS = 16


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..util.scans import read_parquet_fanout

    return (
        read_parquet_fanout(spark, f"{sf_dir}/documents.parquet")
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


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str,
                      n_bands: int = N_BANDS) -> DataFrame:
    """LSH candidates (band-bucket join) verified by exact Jaccard on
    the candidate set only — the scalable near-dup path. The shingle
    table feeds the signature build AND the verify join, so it is
    persisted for the run (one tokenize pass, three consumers).

    Round-7 verify shape (guide §2.3/§2.4): the exact-Jaccard verify
    first restricts the shingle table to CANDIDATE docs with a
    broadcast semi-join (candidates are bounded by the banding's
    selectivity, not the corpus), collects each candidate doc's
    shingle set into one array (tiny groupBy), and attaches the two
    arrays to the pair list with broadcast joins — the round-6 plan
    instead ran two SortMergeJoins + two aggregations over the FULL
    2.6M-row shingle table. Output is identical: same candidates,
    same exact-Jaccard float math over the same distinct shingle
    sets."""
    sh_cached = _shingles(spark, sf_dir).persist()
    sig = _signatures_from_shingles(sh_cached)
    rows_per_band = N_HASHES // n_bands
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
                    for bi in range(n_bands)
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
        # three consumers (two union arms + the pair broadcast): persist
        # the tiny pair list or the band self-join subtree runs 3x
        .persist()
    )
    # verify candidates with exact Jaccard over shingle sets, touching
    # only candidate docs' shingles: semi-join filter (streamed against
    # the cached shingle table, no shuffle) -> per-doc set arrays
    # (groupBy over candidate docs only) -> broadcast-attach to pairs
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sharr = (
        sh_cached.join(F.broadcast(cand_docs), "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_list("shingle").alias("sh"))
        # two consumers (sh_a attach + sh_b attach): persist the
        # candidate-doc arrays (O(candidates), tiny) once
        .persist()
    )
    with_a = sharr.join(
        F.broadcast(cand), sharr["doc_id"] == cand["doc_a"]
    ).select("doc_a", "doc_b", F.col("sh").alias("sh_a"))
    pairs = sharr.join(
        F.broadcast(with_a), sharr["doc_id"] == with_a["doc_b"]
    ).select(
        "doc_a", "doc_b",
        F.size(F.array_intersect("sh_a", "sh")).alias("inter"),
        F.size("sh_a").alias("na"), F.size("sh").alias("nb"),
    )
    return (
        pairs.withColumn(
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


SIMHASH_BITS = 60     # 15 hex chars of md5: portable Spark <-> DuckDB
SIMHASH_CHUNKS = 4    # 4 x 15-bit bands; pigeonhole-complete at radius 3
SIMHASH_RADIUS = 3


def _simhash_doc_kernel():
    """(doc_id, text) batches -> (doc_id, simhash), one Arrow pass.

    Per-doc term counts (whitespace tokens), md5-derived 60-bit term
    hashes and the tf-weighted bit votes are all computed doc-locally
    inside the kernel — the round-6 plan shuffled every (doc, term)
    pair twice (tf groupBy + collect_list groupBy) just to feed the
    same packed bit-vote reduce (guide §2.4: remove shuffles
    outright). Python's hashlib.md5 produces the identical digest the
    JVM/DuckDB md5 does, and the Zipf vocabulary makes the per-task
    term-hash cache hit rate ~1."""

    def fn(batches):
        import hashlib
        from collections import Counter

        shifts = np.arange(SIMHASH_BITS, dtype=np.int64)
        hcache: dict = {}

        def term_hash(t: str) -> int:
            h = hcache.get(t)
            if h is None:
                h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                if len(hcache) < 1_000_000:
                    hcache[t] = h
            return h

        for b in batches:
            ids = b["doc_id"].to_numpy()
            sigs = np.empty(len(ids), dtype=np.int64)
            for i, text in enumerate(b["text"]):
                counts = Counter(t for t in text.split(" ") if t)
                hs = np.fromiter((term_hash(t) for t in counts),
                                 dtype=np.int64, count=len(counts))
                tfs = np.fromiter(counts.values(), dtype=np.int64,
                                  count=len(counts))
                bits = (hs[:, None] >> shifts[None, :]) & 1
                votes = ((2 * bits - 1) * tfs[:, None]).sum(axis=0)
                sigs[i] = int(((votes > 0).astype(np.int64)
                               << shifts).sum())
            yield pd.DataFrame({"doc_id": ids, "simhash": sigs})

    return fn


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per doc: bit i = [ sum over terms of
    tf * (+1 if bit i of h(term) else -1) > 0 ], with h(term) = the
    first 15 hex chars of md5(term) — the SAME value DuckDB computes
    with ('0x' || substr(md5(term), 1, 15))::BIGINT, which is what
    makes the whole operator externally recomputable. Computed in one
    doc-local Arrow pass (zero shuffle; see ``_simhash_doc_kernel``)."""
    d = _docs(spark, sf_dir)
    return d.mapInPandas(_simhash_doc_kernel(),
                         schema="doc_id long, simhash long")


def simhash_pairs(spark: SparkSession, sf_dir: str,
                  radius: int = SIMHASH_RADIUS) -> DataFrame:
    """Near-dup pairs with Hamming distance <= radius, candidate-joined
    on exact match of one of four 15-bit chunks (pigeonhole: any pair
    within radius 3 shares at least one exact chunk, so recall is
    EXACTLY 1 — the banded join is a pure optimization and the output
    equals all-pairs Hamming <= radius)."""
    sig = simhash_signatures(spark, sf_dir)
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * 15)
                        .bitwiseAND(F.lit(0x7FFF))
                        .alias("val"),
                    )
                    for c in range(SIMHASH_CHUNKS)
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
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
            .cast("int"),
        )
        .filter(F.col("hamming") <= radius)
        .select("doc_a", "doc_b", "hamming")
    )


def minhash_lsh_pairs_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``minhash_lsh_pairs`` at the recall~1 gate banding (16 bands x
    2 rows); oracle = brute-force all-pairs 3-gram Jaccard >= 0.5."""
    return minhash_lsh_pairs(spark, sf_dir, n_bands=GATE_BANDS)


def oracle_sqls() -> dict[str, str]:
    """DuckDB recomputes for the hash-family dedup ops.

    * minhash gate — the banding misses a qualifying pair with
      probability <= (1 - 0.5^2)^16 ~= 1e-2 at the 0.5 threshold and
      <= 3.4e-12 at j = 0.9 (every observed pair in the gate data sits
      at j >= 0.9), and every emitted pair carries its EXACT Jaccard,
      so the brute-force recompute is the oracle.
    * simhash — md5 term hashing is engine-portable, so the oracle
      rebuilds the signatures themselves and takes all-pairs Hamming
      <= radius (the banded join is recall-1 by pigeonhole).
    """
    return {
        "minhash_lsh_pairs": f"""
WITH docs AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
),
tokpos AS (
  SELECT doc_id,
         unnest(str_split(text, ' ')) AS term,
         generate_subscripts(str_split(text, ' '), 1) AS pos
  FROM docs
),
tok AS (SELECT * FROM tokpos WHERE term <> ''),
tri AS (
  SELECT doc_id,
         term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w
           AS shingle
  FROM tok
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh AS (SELECT DISTINCT doc_id, shingle FROM tri WHERE shingle IS NOT NULL),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i) >= {JACCARD_THRESHOLD}
""",
        "simhash_pairs": f"""
WITH docs AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
),
tok AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM docs
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY doc_id, term
),
h AS (
  SELECT doc_id, ('0x' || substr(md5(term), 1, 15))::BIGINT AS hv, tf
  FROM tf
),
bits AS (SELECT b FROM generate_series(0, {SIMHASH_BITS - 1}) AS t(b)),
votes AS (
  SELECT doc_id, b,
         sum(CASE WHEN (hv >> b) & 1 = 1 THEN tf ELSE -tf END) AS v
  FROM h CROSS JOIN bits GROUP BY doc_id, b
),
sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_RADIUS}
""",
    }
