"""Headline benchmark — one JSON line on stdout.

Phases (at $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1, on
local[$SPARK_GRAFT_CPUS]):

1. index_build — synthesize the web corpus (documents x multiplier to
   ~100K pages), run the full inverted-index build; docs/sec and
   postings/sec from the stage manifest.
2. search_batch — BM25 (k1=0.9, b=0.4) kernel engine, 50 deterministic
   queries, k=1000, one batch; qps.
3. search_single p50/p95 — per-query latency over 8 single-query runs.
4. driver-gate headliners (bm25_topk oracle query, term_dictionary,
   minhash_lsh_pairs, cosine_topk, events_hourly) timed individually.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from anserini_spark.corpus.synth import web_corpus
from anserini_spark.index.build import IndexConfig, build_index
from anserini_spark.ops import corpus_queries as cq
from anserini_spark.ops import dedup as dd
from anserini_spark.ops import events as ev
from anserini_spark.ops import similarity as sim
from anserini_spark.search.bm25 import BM25Params
from anserini_spark.search.searcher import InvertedIndex, search_kernel
from anserini_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TARGET_DOCS = int(os.environ.get("BENCH_TARGET_DOCS", "100000"))


def gen_queries(n: int = 50, seed: int = 42) -> dict[int, str]:
    vocab = [
        "spark", "join", "window", "batch", "stream", "customer", "value",
        "scan", "filter", "merge", "sort", "key", "vector", "data", "row",
        "column", "slow", "query", "table", "group", "fast", "small", "big",
        "hash", "agg", "line", "part", "order", "dup",
    ]
    rng = random.Random(seed)
    return {
        i + 1: " ".join(rng.sample(vocab, rng.randint(1, 4))) for i in range(n)
    }


def main() -> None:
    t_all = time.time()
    spark = get_spark(app="anserini-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    extras: dict = {"sf_dir": SF_DIR, "cpus": CPUS}

    import duckdb

    base_docs = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    mult = max(1, TARGET_DOCS // int(base_docs))

    idx_dir = os.path.join(tempfile.gettempdir(), "anserini_bench_idx")
    slug = SF_DIR.strip("/").replace("/", "_")
    corpus_dir = os.path.join(
        tempfile.gettempdir(), f"anserini_bench_corpus_{slug}_x{mult}"
    )
    shutil.rmtree(idx_dir, ignore_errors=True)

    # 0. materialize the input table (not part of indexing throughput:
    # the engine contract is an existing Iceberg/parquet corpus table)
    t0 = time.time()
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")) or (
        os.environ.get("BENCH_FRESH_CORPUS")
    ):
        shutil.rmtree(corpus_dir, ignore_errors=True)
        web_corpus(spark, SF_DIR, multiplier=mult).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
    extras["corpus_synth_s"] = round(time.time() - t0, 3)

    # 1. index build (reads the materialized corpus table)
    t0 = time.time()
    corpus = spark.read.parquet(corpus_dir)
    cfg = IndexConfig(out_dir=idx_dir, doc_partitions=CPUS,
                      block_partitions=CPUS)
    man = build_index(spark, corpus, cfg)
    timings["index_build"] = round(time.time() - t0, 3)
    extras["docs_indexed"] = man["docvec"]["docs"]
    extras["docs_per_sec"] = man["docvec"]["docs_per_sec"]
    extras["postings"] = man["blocks"]["postings"]
    extras["postings_per_sec"] = man["blocks"]["postings_per_sec"]
    extras["index_bytes"] = sum(
        man[s].get("bytes", 0) for s in ("docvec", "blocks", "dictionary")
    )

    # 2. batch search
    idx = InvertedIndex(spark, idx_dir)
    queries = gen_queries(50)
    t0 = time.time()
    n_hits = search_kernel(idx, queries, BM25Params(k=1000)).count()
    batch_wall = time.time() - t0
    timings["search_batch50_k1000"] = round(batch_wall, 3)
    extras["qps_batch"] = round(50 / batch_wall, 2)
    extras["batch_hits"] = n_hits

    # 3. single-query latency p50/p95
    singles = []
    for qid, qtext in list(queries.items())[:8]:
        t0 = time.time()
        search_kernel(idx, {qid: qtext}, BM25Params(k=1000)).count()
        singles.append(time.time() - t0)
    singles.sort()
    timings["search_single_p50"] = round(singles[len(singles) // 2], 3)
    timings["search_single_p95"] = round(singles[-1], 3)

    # 3b. serving-path latency (LocalSearcher over the same index
    # files, no Spark jobs)
    from anserini_spark.search.local import LocalSearcher

    ls = LocalSearcher(idx_dir)
    ls.search("warm up", k=10)
    lats = []
    for qid, qtext in list(queries.items())[:12]:
        t0 = time.perf_counter()
        ls.search(qtext, k=1000)
        lats.append(time.perf_counter() - t0)
    lats.sort()
    timings["local_search_p50"] = round(lats[len(lats) // 2], 3)
    timings["local_search_p95"] = round(lats[-1], 3)

    # warm serving mode (in-RAM term-sliced blocks + docmap)
    lw = LocalSearcher(idx_dir, preload=True)
    lw.search("warm up", k=10)
    lats = []
    for qid, qtext in list(queries.items())[:12]:
        t0 = time.perf_counter()
        lw.search(qtext, k=1000)
        lats.append(time.perf_counter() - t0)
    lats.sort()
    timings["local_search_warm_p50"] = round(lats[len(lats) // 2], 3)

    # 4. driver-gate headliners
    from anserini_spark.ops import index_queries as iq

    for name, fn in [
        ("bm25_topk", cq.bm25_topk),
        ("bm25_index_topk", iq.bm25_index_topk),
        ("term_dictionary", cq.term_dictionary),
        ("minhash_lsh_pairs", dd.minhash_lsh_pairs),
        ("cosine_topk", sim.cosine_topk),
        ("events_hourly", ev.events_hourly),
    ]:
        t0 = time.time()
        fn(spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)

    spark.stop()
    shutil.rmtree(idx_dir, ignore_errors=True)
    total = round(time.time() - t_all, 3)
    print(
        json.dumps(
            {
                "metric": "index docs/sec + BM25 batch/single latency + pipeline ops",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
