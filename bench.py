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

STEADY-STATE PROTOCOL (round 6). A fresh JVM's FIRST full-size run of
a stage pays a one-time cost (heap growth + C2 tier-up, measured in
BENCH.md round 4: blocks stage 26.2 s run-1 vs 13.3 s run-2) that a
tiny warmup does not absorb, and it made round-5's single-shot
artifact swing ~27% with zero code-path change. So every measured
phase now runs BENCH_REPEATS (default 2) times in the same JVM and
records the MIN; the first index build doubles as the JVM-wide warmup.
``value`` is the sum of the recorded per-op timings (the steady-state
measurement); ``wall_s`` carries the raw script wall including warmup
repeats for transparency. The driver JVM GCs between repeats so tmpfs
shuffle files from the previous run are reclaimed (host-bench
protocol, BENCH.md round 3).
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
REPEATS = max(1, int(os.environ.get("BENCH_REPEATS", "2")))


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


def _jvm_gc(spark) -> None:
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def main() -> None:
    t_all = time.time()
    spark = get_spark(app="anserini-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    extras: dict = {"sf_dir": SF_DIR, "cpus": CPUS, "repeats": REPEATS,
                    "protocol": "min-of-repeats, same JVM"}

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

    # 1. index build: REPEATS full builds in one JVM, min wall recorded.
    # Run 1 is also the JVM-wide warmup (heap growth + C2 tier-up).
    corpus = spark.read.parquet(corpus_dir)
    best_wall, best_man, build_walls = None, None, []
    for rep in range(REPEATS):
        shutil.rmtree(idx_dir, ignore_errors=True)
        _jvm_gc(spark)
        t0 = time.time()
        cfg = IndexConfig(out_dir=idx_dir, doc_partitions=CPUS,
                          block_partitions=CPUS)
        man = build_index(spark, corpus, cfg)
        wall = time.time() - t0
        build_walls.append(round(wall, 3))
        if best_wall is None or wall < best_wall:
            best_wall, best_man = wall, man
    timings["index_build"] = round(best_wall, 3)
    extras["index_build_runs"] = build_walls
    extras["docs_indexed"] = best_man["docvec"]["docs"]
    extras["docs_per_sec"] = best_man["docvec"]["docs_per_sec"]
    extras["postings"] = best_man["blocks"]["postings"]
    extras["postings_per_sec"] = best_man["blocks"]["postings_per_sec"]
    extras["index_bytes"] = sum(
        best_man[s].get("bytes", 0) for s in ("docvec", "blocks", "dictionary")
    )

    # 2. batch search (min of REPEATS in the same JVM)
    idx = InvertedIndex(spark, idx_dir)
    queries = gen_queries(50)
    batch_walls = []
    for rep in range(REPEATS):
        _jvm_gc(spark)
        t0 = time.time()
        n_hits = search_kernel(idx, queries, BM25Params(k=1000)).count()
        batch_walls.append(time.time() - t0)
    batch_wall = min(batch_walls)
    timings["search_batch50_k1000"] = round(batch_wall, 3)
    extras["qps_batch"] = round(50 / batch_wall, 2)
    extras["batch_hits"] = n_hits

    # 3. single-query latency p50/p95 (one warmup single absorbs the
    # first-single block-scan plan compile, then 8 measured runs)
    first_qid, first_qtext = next(iter(queries.items()))
    search_kernel(idx, {first_qid: first_qtext}, BM25Params(k=1000)).count()
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

    # 4. driver-gate headliners (each min of REPEATS)
    from anserini_spark.ops import index_queries as iq

    for name, fn in [
        ("bm25_topk", cq.bm25_topk),
        ("bm25_index_topk", iq.bm25_index_topk),
        ("term_dictionary", cq.term_dictionary),
        ("minhash_lsh_pairs", dd.minhash_lsh_pairs),
        ("cosine_topk", sim.cosine_topk),
        ("events_hourly", ev.events_hourly),
    ]:
        walls = []
        for rep in range(REPEATS):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            walls.append(time.time() - t0)
        timings[name] = round(min(walls), 3)

    spark.stop()
    shutil.rmtree(idx_dir, ignore_errors=True)
    wall_s = round(time.time() - t_all, 3)
    # value = sum of steady-state per-op timings (what the engine costs
    # once warm); wall_s = raw script wall including the warmup repeats.
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "index docs/sec + BM25 batch/single latency + pipeline ops",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "wall_s": wall_s,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
