"""PII detection + redaction — the scrubbing pass of a web-corpus
training pipeline (emails, phone numbers, IPv4 addresses).

No counterpart in the reference (built per the
training-data-pipeline mandate, with ``ops/urlnorm.py`` /
``ops/sampling.py`` / ``ops/contamination.py``). Pure built-in
``regexp_count`` / ``regexp_replace`` expressions — JVM-side,
codegen'd into the scan, zero shuffle — with RE2-compatible,
lookaround-free patterns so the DuckDB oracle runs the identical
regexes. Redaction order is fixed (email, then IPv4, then phone) so
the composed output is deterministic: emails hold ``@``, IPv4 holds
dots, and the phone class holds neither, so earlier passes never eat
a later pass's match.

The patterns are the standard recall-leaning pipeline kind (scrub
aggressively, accept some false positives), not validators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"[+(]?[0-9][0-9() -]{7,}[0-9]"

# (pattern, replacement) in redaction order
_PASSES = [(EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>")]


def pii_counts(text: Column) -> list[Column]:
    """Per-kind match counts: [n_emails, n_ips, n_phones]. The phone
    count is taken AFTER the email/IP redactions, matching what
    :func:`redact_pii` actually replaces."""
    pre_phone = F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>")
    return [
        F.regexp_count(text, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(text, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(pre_phone, F.lit(PHONE_RE)).alias("n_phones"),
    ]


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its typed token."""
    out = text
    for pat, tag in _PASSES:
        out = F.regexp_replace(out, pat, tag)
    return out


def scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add per-kind counts and a ``redacted`` column."""
    c = F.col(text_col)
    return df.select("*", *pii_counts(c), redact_pii(c).alias("redacted"))


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry. The testdata carries no PII, so deterministic PII
    strings are appended per doc_id residue (same expressions in the
    oracle); output is the counts plus a fingerprint of the redacted
    text, which pins the replacement behavior byte-for-byte."""
    from ..util.scans import read_parquet_fanout

    d = read_parquet_fanout(spark, f"{sf_dir}/documents.parquet")
    doc = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(doc % 7 == 0,
               F.concat(F.lit(" reach user"), doc.cast("string"),
                        F.lit("@mail"), (doc % 5).cast("string"),
                        F.lit(".example.com"))).otherwise(F.lit("")),
        F.when(doc % 11 == 0,
               F.concat(F.lit(" call +1 415 555 "),
                        (1000 + doc % 9000).cast("string")))
        .otherwise(F.lit("")),
        F.when(doc % 13 == 0,
               F.concat(F.lit(" host 10."), (doc % 256).cast("string"),
                        F.lit("."), ((doc * 7) % 256).cast("string"),
                        F.lit("."), (doc % 200).cast("string")))
        .otherwise(F.lit("")),
    )
    c = aug
    return d.select(
        "doc_id", *pii_counts(c),
        F.md5(redact_pii(c)).alias("redacted_md5"),
    )


def oracle_sqls() -> dict[str, str]:
    email, ipv4, phone = EMAIL_RE, IPV4_RE, PHONE_RE
    return {
        "pii_scrub": f"""
WITH aug AS (
  SELECT doc_id,
         text
         || (CASE WHEN doc_id % 7 = 0
                  THEN ' reach user' || doc_id::VARCHAR || '@mail'
                       || (doc_id % 5)::VARCHAR || '.example.com'
                  ELSE '' END)
         || (CASE WHEN doc_id % 11 = 0
                  THEN ' call +1 415 555 ' || (1000 + doc_id % 9000)::VARCHAR
                  ELSE '' END)
         || (CASE WHEN doc_id % 13 = 0
                  THEN ' host 10.' || (doc_id % 256)::VARCHAR || '.'
                       || ((doc_id * 7) % 256)::VARCHAR || '.'
                       || (doc_id % 200)::VARCHAR
                  ELSE '' END) AS t
  FROM documents
),
steps AS (
  SELECT doc_id, t,
         regexp_replace(regexp_replace(t, '{email}', '<EMAIL>', 'g'),
                        '{ipv4}', '<IP>', 'g') AS pre_phone
  FROM aug
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{email}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{ipv4}')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(pre_phone, '{phone}')) AS INT) AS n_phones,
       md5(regexp_replace(pre_phone, '{phone}', '<PHONE>', 'g'))
         AS redacted_md5
FROM steps
""",
    }
