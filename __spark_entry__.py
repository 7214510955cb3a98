"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 (+ the training-data-pipeline ops); ``oracle_sql()``
holds the DuckDB-equivalent ANSI SQL for EVERY entry. The former
rows-only hash-family ops are now externally verified too: SimHash
uses engine-portable md5 term hashing (the oracle rebuilds the
signatures in SQL), and the MinHash-LSH / embedding-LSH / ANN gate
entries run the same machinery at recall~1 configurations (high-band
LSH, nprobe = nlist) with exact re-scoring, so brute-force SQL is
their legitimate oracle; the approximate-at-scale configs stay the
library defaults with pytest-pinned recall.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from anserini_spark.ops import corpus_queries as cq
from anserini_spark.ops import dedup as dd
from anserini_spark.ops import events as ev
from anserini_spark.ops import index_queries as iq
from anserini_spark.ops import ltr
from anserini_spark.ops import similarity as sim
from anserini_spark.ops import textstats as ts
from anserini_spark.ops import contamination as cn
from anserini_spark.ops import pii
from anserini_spark.ops import sampling as sp
from anserini_spark.ops import urlnorm as un

SF001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k over the sf0.001 documents table."""
    return cq.bm25_topk(spark, SF001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # IR core (SURVEY.md §2.4, §2.5, §2.7)
        "term_dictionary": cq.term_dictionary,
        "doc_lengths": cq.doc_lengths,
        "collection_stats": cq.collection_stats,
        "top_terms": cq.top_terms,
        "bm25_topk": cq.bm25_topk,
        "bm25_tuned_topk": cq.bm25_tuned_topk,
        # REAL block index + MaxScore kernel, oracled (SURVEY.md §2.3/§2.7)
        "bm25_index_topk": iq.bm25_index_topk,
        "multislice_bm25_topk": iq.multislice_bm25_topk,
        "tombstone_bm25_topk": iq.tombstone_bm25_topk,
        "purged_bm25_topk": iq.purged_bm25_topk,
        "boolean_topk": iq.boolean_topk,
        "impact_topk": iq.impact_topk,
        "qld_index_topk": iq.qld_index_topk,
        "qljm_index_topk": iq.qljm_index_topk,
        "inl2_index_topk": iq.inl2_index_topk,
        "spl_index_topk": iq.spl_index_topk,
        "zh_bm25_topk": iq.zh_bm25_topk,
        "fr_bm25_topk": iq.fr_bm25_topk,
        "bgl_query_terms": iq.bgl_query_terms,
        "sdm_topk": iq.sdm_topk,
        "rm3_topk": iq.rm3_topk,
        "bm25prf_topk": iq.bm25prf_topk,
        "axiom_topk": iq.axiom_topk,
        "eval_metrics": iq.eval_metrics,
        "ltr_features": ltr.ltr_features,
        "doclen_histogram": cq.doclen_histogram,
        "top_bigrams": cq.top_bigrams,
        # dedup family
        "exact_dedup": dd.exact_dedup,
        "ngram_jaccard_pairs": dd.ngram_jaccard_pairs,
        "minhash_lsh_pairs": dd.minhash_lsh_pairs_gate,
        "simhash_pairs": dd.simhash_pairs,
        # text analysis
        "token_counts": ts.token_counts,
        "text_quality": ts.text_quality,
        "langid_heuristic": ts.langid_heuristic,
        "doc_fingerprint": ts.doc_fingerprint,
        "url_canonical_dedup": un.url_canonical_dedup,
        "stratified_sample": sp.stratified_sample_gate,
        "contamination_check": cn.contamination_check,
        "pii_scrub": pii.pii_scrub,
        # similarity search
        "cosine_topk": sim.cosine_topk,
        "ann_lsh_topk": sim.ann_lsh_topk_gate,
        "ann_ivf_topk": sim.ann_ivf_topk_gate,
        "embedding_neardup_pairs": sim.embedding_neardup_pairs,
        "embedding_neardup_lsh": sim.embedding_neardup_lsh_gate,
        # events
        "events_hourly": ev.events_hourly,
    }


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(cq.oracle_sqls())
    out.update(iq.oracle_sqls())
    out.update(ltr.oracle_sqls())
    out.update(ts.oracle_sqls())
    out.update(un.oracle_sqls())
    out.update(sp.oracle_sqls())
    out.update(cn.oracle_sqls())
    out.update(pii.oracle_sqls())
    out.update(dd.oracle_sqls())
    out.update(sim.oracle_sqls())
    out.update(ev.oracle_sqls())
    return out
