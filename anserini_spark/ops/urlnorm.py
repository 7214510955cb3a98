"""URL canonicalization + variant dedup — the web-corpus pipeline
primitive that precedes content dedup (a crawl sees the same page as
http/https, with/without ``www.``, default ports, trailing slashes,
fragments, and tracking query parameters).

No counterpart in the reference (Anserini ingests pre-deduped
collections); built per the training-data-pipeline mandate alongside
``ops/dedup.py``. Everything is built-in column expressions
(regexp_extract/regexp_replace) — JVM-side, no Python row work, one
groupBy shuffle for the variant grouping. The patterns avoid
lookaround so the DuckDB (RE2) oracle runs the identical regexes.

Canonical form (documented contract, choices a dedup pipeline makes,
not a URL-equivalence proof):

- scheme normalized to ``https`` (variant dedup treats the two as one
  resource), host lowercased, leading ``www.`` dropped
- default ports ``:80``/``:443`` dropped
- fragment dropped
- trailing slashes on the path dropped (including the bare root)
- tracking query parameters dropped (``utm_*``, ``gclid``,
  ``fbclid``, ``ref``); other parameters kept in original order;
  a query left empty loses its ``?``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# one alternation shared by the Spark and DuckDB sides
_TRACKING = r"(utm_[a-z]+|gclid|fbclid|ref)"
_HOST_RE = r"^[a-z]+://([^/?#]+)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` (see module docstring)."""
    u = F.regexp_replace(url, r"#.*$", "")            # fragment
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")  # default ports
    rest = F.regexp_replace(u, _HOST_RE, "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_replace(rest, r"^[^?]*\??", "")
    query = F.regexp_replace(query, rf"(^|&){_TRACKING}=[^&]*", "")
    query = F.regexp_replace(query, r"^&", "")
    return F.concat(
        F.lit("https://"), host, path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )


def url_variant_groups(df: DataFrame, url_col: str = "url",
                       id_col: str = "doc_id") -> DataFrame:
    """Group crawl variants of one resource: one row per canonical
    url with the variant count and the smallest member id (the
    deterministic representative a dedup pass keeps). One hash
    shuffle on the canonical string — uniform keys, 100 TB-safe."""
    return (
        df.select(F.col(id_col),
                  canonicalize_url(F.col(url_col)).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count(F.lit(1)).alias("n_variants"),
             F.min(id_col).alias("first_doc"))
    )


def _messy_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic messy crawl urls over the documents table (the
    testdata carries no raw urls): two docs share each logical page,
    decorated with scheme/www/case/port/slash/query/fragment variants
    keyed on doc_id residues. The oracle rebuilds the SAME urls in
    SQL, so the gate exercises the canonicalizer end-to-end."""
    from ..util.scans import read_parquet_fanout

    d = read_parquet_fanout(spark, f"{sf_dir}/documents.parquet")
    doc = F.col("doc_id")
    page = F.floor(doc / 2).cast("long")
    scheme = F.when(doc % 3 == 0, F.lit("http")).otherwise(F.lit("https"))
    www = F.when(doc % 2 == 0, F.lit("www.")).otherwise(F.lit(""))
    hostbase = F.concat(F.lit("h"), (page % 97).cast("string"),
                        F.lit(".example.org"))
    host = F.when(doc % 8 == 0, F.upper(hostbase)).otherwise(hostbase)
    port = F.when((doc % 5 == 0) & (doc % 3 == 0), F.lit(":80")) \
        .when(doc % 5 == 0, F.lit(":443")).otherwise(F.lit(""))
    trail = F.when(doc % 4 == 0, F.lit("/")).otherwise(F.lit(""))
    query = (
        F.when(doc % 6 == 0, F.lit("?utm_source=feed&utm_medium=x"))
        .when(doc % 6 == 1,
              F.concat(F.lit("?q="), (page % 7).cast("string")))
        .when(doc % 6 == 3,
              F.concat(F.lit("?fbclid=abc&q="), (page % 7).cast("string")))
        .otherwise(F.lit(""))
    )
    frag = F.when(doc % 9 == 0, F.lit("#sec2")).otherwise(F.lit(""))
    url = F.concat(scheme, F.lit("://"), www, host, port,
                   F.lit("/page/"), page.cast("string"), trail, query, frag)
    return d.select("doc_id", url.alias("url"))


def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: canonicalize the synthesized messy urls and group
    crawl variants."""
    return url_variant_groups(_messy_urls(spark, sf_dir))


def oracle_sqls() -> dict[str, str]:
    # identical url synthesis + identical regex chain; DuckDB's
    # regexp_replace needs the explicit 'g' flag where the pattern
    # can match more than once
    return {
        "url_canonical_dedup": r"""
WITH messy AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 3 = 0 THEN 'http' ELSE 'https' END)
         || '://'
         || (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END)
         || (CASE WHEN doc_id % 8 = 0
                  THEN upper('h' || ((doc_id // 2) % 97)::VARCHAR
                             || '.example.org')
                  ELSE 'h' || ((doc_id // 2) % 97)::VARCHAR
                       || '.example.org' END)
         || (CASE WHEN doc_id % 5 = 0 AND doc_id % 3 = 0 THEN ':80'
                  WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
         || '/page/' || (doc_id // 2)::VARCHAR
         || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
         || (CASE WHEN doc_id % 6 = 0 THEN '?utm_source=feed&utm_medium=x'
                  WHEN doc_id % 6 = 1
                    THEN '?q=' || (((doc_id // 2)) % 7)::VARCHAR
                  WHEN doc_id % 6 = 3
                    THEN '?fbclid=abc&q=' || (((doc_id // 2)) % 7)::VARCHAR
                  ELSE '' END)
         || (CASE WHEN doc_id % 9 = 0 THEN '#sec2' ELSE '' END) AS url
  FROM documents
),
parts AS (
  SELECT doc_id,
         regexp_replace(url, '#.*$', '') AS u
  FROM messy
),
canon AS (
  SELECT doc_id,
         'https://'
         || regexp_replace(regexp_replace(
              lower(regexp_extract(u, '^[a-z]+://([^/?#]+)', 1)),
              '^www\.', ''), ':(80|443)$', '')
         || regexp_replace(
              regexp_extract(regexp_replace(u, '^[a-z]+://[^/?#]+', ''),
                             '^([^?]*)', 1),
              '/+$', '')
         || (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS canonical_url
  FROM (
    SELECT doc_id, u,
           regexp_replace(
             regexp_replace(
               regexp_replace(regexp_replace(u, '^[a-z]+://[^/?#]+', ''),
                              '^[^?]*\??', ''),
               '(^|&)(utm_[a-z]+|gclid|fbclid|ref)=[^&]*', '', 'g'),
             '^&', '') AS q
    FROM parts
  )
)
SELECT canonical_url,
       CAST(count(*) AS BIGINT) AS n_variants,
       min(doc_id) AS first_doc
FROM canon GROUP BY canonical_url
""",
    }
