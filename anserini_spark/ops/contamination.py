"""Benchmark-contamination detection — find corpus documents that
contain an n-gram from a (small) benchmark/eval set, the standard
decontamination step before training on web text.

No counterpart in the reference (built per the
training-data-pipeline mandate, like ``ops/urlnorm.py`` /
``ops/sampling.py``). Shape chosen for 100 TB: the benchmark side is
tiny by definition, so its distinct n-grams BROADCAST and the corpus
side is one explode + hash-join inside the scan stage — no corpus
shuffle until the final (doc, bench) aggregation, whose cardinality is
the (small) number of contaminated pairs. Token n-grams are exact
(whitespace tokens, like the dedup family), not fuzzy: decontamination
wants no false negatives on verbatim leakage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _ngrams(df: DataFrame, id_col: str, n: int) -> DataFrame:
    """One row per token n-gram of ``text`` (whitespace tokens,
    empties dropped)."""
    toks = df.select(
        F.col(id_col),
        F.filter(F.split(F.col("text"), " "), lambda t: t != "").alias("toks"),
    ).filter(F.size("toks") >= n)
    # n-grams via arrays_zip of n shifted slices — codegen'd
    # expressions (the round-6 transform(sequence(...)) lambda ran
    # interpreted per position, re-slicing the array each time;
    # guide §4.1 "prefer built-ins")
    zipped = F.arrays_zip(
        *[F.slice("toks", i + 1, F.size("toks") - (n - 1))
          for i in range(n)]
    )
    return toks.select(
        F.col(id_col), F.explode(zipped).alias("e")
    ).select(
        F.col(id_col),
        F.concat_ws(" ", *[F.col(f"e.{i}") for i in range(n)]).alias("gram"),
    )


def ngram_contamination(docs: DataFrame, bench: DataFrame,
                        n: int = 8) -> DataFrame:
    """(doc_id, bench_id, n_hits) for every corpus doc containing at
    least one of the benchmark's token ``n``-grams. ``docs`` needs
    (doc_id, text); ``bench`` needs (bench_id, gram) with one
    representative n-gram per benchmark item (use :func:`_ngrams` to
    shred full benchmark texts first if needed)."""
    grams = _ngrams(docs, "doc_id", n)
    return (
        grams.join(F.broadcast(bench), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


_N = 8


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: every 50th document's leading 8-gram acts as the
    benchmark set (deterministic; guarantees self-hits and catches
    real cross-document leakage through the corpus's near-dups)."""
    from ..util.scans import read_parquet_fanout

    d = read_parquet_fanout(spark, f"{sf_dir}/documents.parquet")
    bench = (
        d.filter(F.col("doc_id") % 50 == 0)
        .select(
            F.col("doc_id").alias("bench_id"),
            F.filter(F.split(F.col("text"), " "),
                     lambda t: t != "").alias("toks"),
        )
        .filter(F.size("toks") >= _N)
        .select("bench_id",
                F.expr(f"array_join(slice(toks, 1, {_N}), ' ')").alias("gram"))
    )
    return ngram_contamination(
        d.filter(F.col("text").isNotNull() & (F.trim("text") != ""))
         .select("doc_id", "text"),
        bench, n=_N)


def oracle_sqls() -> dict[str, str]:
    return {
        "contamination_check": f"""
WITH docs AS (
  SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
),
grams AS (
  SELECT d.doc_id,
         array_to_string(list_slice(d.toks, t.i, t.i + {_N - 1}), ' ') AS gram
  FROM docs d,
       LATERAL (SELECT unnest(generate_series(1, len(d.toks) - {_N - 1}))
                AS i) t
),
bench AS (
  SELECT doc_id AS bench_id,
         array_to_string(list_slice(toks, 1, {_N}), ' ') AS gram
  FROM docs WHERE doc_id % 50 = 0 AND len(toks) >= {_N}
)
SELECT g.doc_id, b.bench_id, CAST(count(*) AS BIGINT) AS n_hits
FROM grams g JOIN bench b USING (gram)
GROUP BY 1, 2
""",
    }
