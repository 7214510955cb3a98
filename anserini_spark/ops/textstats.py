"""Text-analysis operators for training-data pipelines over
``documents``: token counting, quality scoring, language-ID heuristic,
document fingerprinting. All pure built-in-function plans (JVM-side,
whole-stage codegen) with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..util.scans import read_parquet_fanout

# small English function-word list for the heuristics (public knowledge)
_EN_STOP = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
_EN_RATIO = 0.05


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_parquet_fanout(spark, f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        .select("doc_id", "text")
    )


def _with_tokens(d: DataFrame) -> DataFrame:
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    return d.withColumn("toks", toks).withColumn(
        "n_tokens", F.size("toks").cast("long")
    )


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _with_tokens(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", F.length("text").cast("long").alias("n_chars")
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / mean-token-length / stopword-ratio quality features,
    plus a keep/drop decision (the C4-style heuristic filter shape)."""
    d = _with_tokens(_docs(spark, sf_dir))
    stop_arr = F.array(*[F.lit(s) for s in _EN_STOP])
    n_stop = F.size(F.filter(F.col("toks"), lambda t: F.array_contains(stop_arr, t)))
    d = (
        d.withColumn(
            "mean_tok_len",
            F.round(
                (F.length(F.concat_ws("", F.col("toks"))).cast("double"))
                / F.col("n_tokens").cast("double"),
                4,
            ),
        )
        .withColumn(
            "stop_ratio",
            F.round(n_stop.cast("double") / F.col("n_tokens").cast("double"), 4),
        )
        .withColumn(
            "keep",
            (F.col("n_tokens") >= 10)
            & (F.col("mean_tok_len") >= 2.0)
            & (F.col("mean_tok_len") <= 12.0),
        )
    )
    return d.select("doc_id", "n_tokens", "mean_tok_len", "stop_ratio", "keep")


def langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-word-ratio language ID: predict 'en' when >= 5% of
    tokens are English function words, else 'other'."""
    d = _with_tokens(_docs(spark, sf_dir))
    stop_arr = F.array(*[F.lit(s) for s in _EN_STOP])
    n_stop = F.size(F.filter(F.col("toks"), lambda t: F.array_contains(stop_arr, t)))
    ratio = n_stop.cast("double") / F.col("n_tokens").cast("double")
    return d.select(
        "doc_id",
        F.when(ratio >= _EN_RATIO, F.lit("en")).otherwise(F.lit("other")).alias(
            "pred_lang"
        ),
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 of the whitespace-normalized,
    lowercased text (stable across engines)."""
    d = _docs(spark, sf_dir)
    norm = F.lower(F.concat_ws(" ", F.filter(F.split("text", " "), lambda t: t != "")))
    return d.select("doc_id", F.md5(norm).alias("fingerprint"))


_STOP_SQL = ", ".join(f"'{s}'" for s in _EN_STOP)

_DOCS_CTE = """
docs AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
),
tok AS (
  SELECT doc_id, t.term
  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM docs) t
  WHERE t.term <> ''
),
cnt AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(length(term)) AS BIGINT) AS sum_len,
         CAST(sum(CASE WHEN term IN ({stops}) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
  FROM tok GROUP BY doc_id
)
""".replace("{stops}", _STOP_SQL)


def oracle_sqls() -> dict[str, str]:
    return {
        "token_counts": f"""
WITH {_DOCS_CTE}
SELECT c.doc_id, c.n_tokens, CAST(length(d.text) AS BIGINT) AS n_chars
FROM cnt c JOIN docs d ON c.doc_id = d.doc_id
""",
        "text_quality": f"""
WITH {_DOCS_CTE}
SELECT doc_id, n_tokens,
       round(CAST(sum_len AS DOUBLE) / n_tokens, 4) AS mean_tok_len,
       round(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stop_ratio,
       (n_tokens >= 10
        AND round(CAST(sum_len AS DOUBLE) / n_tokens, 4) >= 2.0
        AND round(CAST(sum_len AS DOUBLE) / n_tokens, 4) <= 12.0) AS keep
FROM cnt
""",
        "langid_heuristic": f"""
WITH {_DOCS_CTE}
SELECT doc_id,
       CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens >= {_EN_RATIO}
            THEN 'en' ELSE 'other' END AS pred_lang
FROM cnt
""",
        "doc_fingerprint": """
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
norm AS (
  SELECT doc_id, lower(string_agg(term, ' ' ORDER BY pos)) AS norm_text
  FROM tokpos WHERE term <> ''
  GROUP BY doc_id
)
SELECT doc_id, md5(norm_text) AS fingerprint FROM norm
""",
        "exact_dedup": """
WITH d AS (
  SELECT doc_id, md5(text) AS h FROM documents
  WHERE text IS NOT NULL AND trim(text) <> ''
)
SELECT doc_id,
       min(doc_id) OVER (PARTITION BY h) AS canonical,
       doc_id <> min(doc_id) OVER (PARTITION BY h) AS is_dup
FROM d
""",
        "ngram_jaccard_pairs": """
WITH docs AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND trim(text) <> '' AND doc_id < 200
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
WHERE CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i) >= 0.5
""",
    }
