"""Deterministic stratified corpus sampling — the data-mixing
primitive of a training-data pipeline (per-language / per-source keep
rates, reproducible across runs and engines).

No counterpart in the reference (built per the
training-data-pipeline mandate, like ``ops/urlnorm.py``). The sampler
is a pure scan-level FILTER: no shuffle, no state, no sampling pass —
the decision for a row is a hash of its stable key, so the same
(key, salt, rate) always keeps the same rows on any cluster size, and
Catalyst pushes the whole predicate into the scan. That is the
100 TB-correct shape: resampling a corpus never costs more than
reading it.

The hash must be engine-portable for the oracle: the first 15 hex
chars of md5(salt || key) read as an integer, divided by 16^15 —
bit-identical in Spark (``conv``) and DuckDB (``::BIGINT`` on a 0x
literal), both IEEE-754.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_DENOM = float(16 ** 15)  # 2^60


def hash_fraction(key: Column, salt: str = "") -> Column:
    """Uniform [0, 1) double derived from md5(salt || key) — stable
    across runs, partitions, and engines."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt),
                                          key.cast("string"))), 1, 15),
               16, 10).cast("long")
    return h / F.lit(_DENOM)


def stratified_sample(df: DataFrame, stratum_col: str,
                      rates: dict[str, float], key_col: str,
                      default_rate: float = 1.0,
                      salt: str = "") -> DataFrame:
    """Keep each row iff hash_fraction(key) < rate(stratum). Rates
    are per-stratum keep probabilities (e.g. upsample low-resource
    languages, downsample boilerplate-heavy domains)."""
    rate = F.lit(default_rate)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(r)).otherwise(rate)
    return df.filter(hash_fraction(F.col(key_col), salt) < rate)


# gate configuration: upsample the low-resource strata, downsample the
# head — the canonical language-mixing move
_GATE_RATES = {"en": 0.5, "zh": 0.9, "es": 0.3, "de": 0.3, "fr": 0.9}
_GATE_SALT = "mix1:"


def stratified_sample_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        stratified_sample(d, "lang", _GATE_RATES, "doc_id",
                          salt=_GATE_SALT)
        .select("doc_id", "lang")
    )


def oracle_sqls() -> dict[str, str]:
    case = " ".join(
        f"WHEN lang = '{v}' THEN {r}" for v, r in sorted(_GATE_RATES.items())
    )
    return {
        "stratified_sample": f"""
SELECT doc_id, lang FROM documents
WHERE ('0x' || substring(md5('{_GATE_SALT}' || doc_id::VARCHAR), 1, 15))::BIGINT
      / {_DENOM!r} < (CASE {case} ELSE 1.0 END)
""",
    }
