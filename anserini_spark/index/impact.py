"""Impact-scored (SLR) index mode — the reference fork's added
functionality (README "Added Indexing Functionality";
`index/generator/SLRGenerator.java:57-187`, `analysis/SLRTokenizer`,
`search/similarity/SLRSimilarity.java:36-103`).

A document is a sparse latent vector ``map<string, float>`` (term =
zero-padded latent index). The activation is smuggled into the
term-frequency slot, quantized as ``tf = round(activation * 10^p)``
(`SLRGenerator` float normalization); the norm is constant
(`SLRSimilarity` norm ≡ 1), and the score is the dot product

    score(q, d) = sum_t q_act(t) * tf_t / 10^p

Spark mapping: the SAME posting pipeline — quantized impacts ride the
tf slot of the docvec/block format, so compression, segmenting, merge
and the per-segment kernels all apply unchanged; only the scoring
formula differs (no idf, no length normalization).
"""

from __future__ import annotations

from typing import Dict, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..analysis.analyzer import analysis_version as _analysis_version
from ..search.tieadjust import adjust_score_ties
from .build import (
    DOCVEC_SCHEMA,
    IndexConfig,
    SEG_SHIFT,
    build_index,
)

DEFAULT_PRECISION = 4  # 10^p quantization (SLRGenerator -slr.p)


def build_impact_index(
    spark: SparkSession,
    docs: DataFrame,
    cfg: IndexConfig,
    precision: int = DEFAULT_PRECISION,
) -> dict:
    """Build the impact index from ``(url, activations
    map<string,float>)``: a custom stage-1 writes the quantized docvec
    (terms = latent indices, tfs = quantized impacts), then the
    standard build resumes from its manifest for the shared
    blocks/dictionary/stats stages."""
    import json
    import os
    import time

    from .build import _Manifest, _dir_bytes

    scale = float(10 ** precision)
    os.makedirs(cfg.out_dir, exist_ok=True)
    man = _Manifest(cfg.out_dir)
    docvec_path = os.path.join(cfg.out_dir, "docvec.parquet")

    if not man.done("docvec"):
        t0 = time.time()

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            base = pid << SEG_SHIFT
            row = 0
            prev = None
            for b in batches:
                out = {"doc_id": [], "url": [], "segment": [],
                       "doclen": [], "terms": [], "tfs": []}
                for url, acts in zip(b["url"], b["activations"]):
                    if url == prev:
                        continue
                    prev = url
                    items = sorted(
                        (t, int(round(float(v) * scale)))
                        for t, v in (acts or {}).items()
                    )
                    items = [(t, q) for t, q in items if q > 0]
                    if not items:
                        continue
                    out["doc_id"].append(base + row)
                    out["url"].append(url)
                    out["segment"].append(pid)
                    out["doclen"].append(sum(q for _, q in items))
                    out["terms"].append([t for t, _ in items])
                    out["tfs"].append([q for _, q in items])
                    row += 1
                if out["url"]:
                    yield pd.DataFrame(out)

        (
            docs.select("url", "activations")
            .repartition(cfg.doc_partitions, "url")
            .sortWithinPartitions("url")
            .mapInPandas(kernel, schema=DOCVEC_SCHEMA)
            .write.mode("overwrite")
            .parquet(docvec_path)
        )
        man.record(
            "docvec",
            wall_s=round(time.time() - t0, 3),
            seg_shift=SEG_SHIFT,
            docs=spark.read.parquet(docvec_path).count(),
            bytes=_dir_bytes(docvec_path),
            lineage={"stage": "docvec", "analyzer": "impact",
                     "analysis_version": _analysis_version("impact"),
                     "lang": None, "partitions": cfg.doc_partitions,
                     "precision": precision},
        )
    # remaining stages (blocks/dictionary/stats) are standard: run the
    # normal build, which skips the done docvec stage
    cfg2 = IndexConfig(**{**cfg.__dict__, "analyzer": "impact"})
    empty_corpus = spark.createDataFrame(
        [], "url string, text string, lang string"
    )
    return build_index(spark, empty_corpus, cfg2)


def search_impact(
    index, queries: Dict[int, Dict[str, float]], k: int = 1000,
    precision: int | None = None, engine: str = "kernel",
) -> DataFrame:
    """Dot-product retrieval over the impact index. ``queries``:
    qid -> {latent term: query activation}. Default engine scores
    through the term-pruned block kernel (the tf slot carries the
    quantized activation; shape = tf/scale, so MaxScore's block
    max_tf bound applies unchanged); ``engine="dataframe"`` keeps the
    declarative full-docvec plan as the oracle."""
    spark = index.spark
    p = precision
    if p is None:
        p = index.manifest["docvec"]["lineage"].get("precision",
                                                    DEFAULT_PRECISION)
    scale = float(10 ** p)
    rows = [
        (qid, t, float(v))
        for qid, m in queries.items()
        for t, v in m.items()
        if v > 0
    ]
    if not rows:
        return spark.createDataFrame(
            [], "qid int, docid string, rank int, score double"
        )
    if engine == "kernel":
        import numpy as np

        from ..search.searcher import (
            ARRAY_RESULT_SCHEMA,
            _finalize_arrays,
            _segment_score_fn,
        )

        def _shape(tf, dl, _scale=scale):
            return tf.astype(np.float64) / _scale

        boosts: Dict[int, Dict[str, float]] = {}
        for qid, t, v in rows:
            boosts.setdefault(qid, {})[t] = v
        all_terms = sorted({t for m in boosts.values() for t in m})
        shape_fns = {t: _shape for t in all_terms}
        seg_counts = {int(sg): int(c)
                      for sg, c in index.stats["segments"].items()}
        blocks = index.blocks.select(
            "term", "segment", "first_doc", "last_doc", "n", "max_tf",
            "min_dl", "sum_tf", "docs_bin", "tfs_bin", "dls_bin",
        ).filter(F.col("term").isin(all_terms))
        fn = _segment_score_fn(boosts, (0.0, 0.0, False), seg_counts, k,
                               prune=True, shape_fns=shape_fns,
                               dead_by_seg=index.dead_by_segment or None)
        from ..search.searcher import BATCH_REPARTITION_MIN_QUERIES

        if len(boosts) >= BATCH_REPARTITION_MIN_QUERIES:
            n_parts = min(512, 4 * max(1, len(seg_counts)))
            blocks = blocks.repartition(n_parts, "segment")
        hits = blocks.groupBy("segment").applyInPandas(
            fn, schema=ARRAY_RESULT_SCHEMA
        )
        return _finalize_arrays(index, hits, k)
    q = spark.createDataFrame(rows, "qid int, term string, qval double")
    postings = index.live_docvec.select(
        "doc_id", F.explode(F.arrays_zip("terms", "tfs")).alias("e")
    ).select(
        F.col("e.terms").alias("term"), "doc_id",
        F.col("e.tfs").alias("tf"),
    )
    hits = (
        postings.join(F.broadcast(q), "term")
        .groupBy("qid", "doc_id")
        .agg(
            (F.sum(F.col("qval") * F.col("tf").cast("double"))
             / F.lit(scale)).alias("score")
        )
        .filter(F.col("score") > 0)
    )
    docmap = index.docmap.select("doc_id", "url")
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("url"))
    ranked = (
        hits.join(docmap, "doc_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("url").alias("docid"), "rank", "score")
    )
    return adjust_score_ties(ranked).orderBy("qid", "rank")
