"""spark-submit entry point: build the inverted index from a corpus
parquet/Iceberg table.

    spark-submit --master local[32] --py-files anserini_spark.zip \\
        scripts/build_index.py --corpus /path/corpus.parquet \\
        --out /path/index [--partitions 32] [--analyzer porter]

Resumable: re-running with the same --out skips completed stages
(per-stage manifest with lineage + metrics).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True,
                    help="input path: parquet table, or raw collection "
                         "files when --collection is set")
    ap.add_argument("--collection", default="parquet",
                    choices=["parquet", "trec", "cleantrec", "trecweb", "warc",
                             "json", "tweet"],
                    help="input format (-collection analogue: "
                         "TrecCollection/TrecwebCollection/ClueWeb/"
                         "JsonCollection/TweetCollection)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--block-partitions", type=int, default=None)
    ap.add_argument("--analyzer", default="porter",
                    choices=["porter", "krovetz", "none", "ws",
                             "cjk", "fr", "tweet"],
                    help="cjk/fr are the -language zh/fr analyzer "
                         "chains; tweet is TweetAnalyzer")
    ap.add_argument("--lang", default="en",
                    help="corpus lang filter; pass 'all' to keep "
                         "every language")
    ap.add_argument("--keep-stopwords", action="store_true")
    ap.add_argument("--from-html", action="store_true",
                    help="index from the html column (runs the HTML->text "
                         "extraction kernel) instead of pre-extracted text")
    ap.add_argument("--slices", type=int, default=0,
                    help="build N disjoint url-hash slices under --out "
                         "instead of one monolithic index: a killed job "
                         "resumes skipping completed slices entirely "
                         "(per-partition checkpointing); search the "
                         "result unmerged via MultiSliceIndex or compact "
                         "with merge_indexes")
    ap.add_argument("--warmup", action="store_true",
                    help="run a tiny throwaway build first so the timed "
                         "stages measure steady state: a fresh local JVM "
                         "pays one-time parquet/codegen JIT + python-worker "
                         "import costs (~10-40 s) that long-lived cluster "
                         "executors never see per-job")
    ap.add_argument("--steady", type=int, default=1,
                    help="run the timed full build N times in this one "
                         "JVM and record every run's per-stage walls in "
                         "<out>/steady.json. Even after --warmup, the "
                         "FIRST full-size build in a fresh JVM pays "
                         "~10-15 s of one-time heap-growth/C2 cost the "
                         "tiny warmup cannot trigger (measured: blocks "
                         "26.2 s run-1 vs 13.3 s run-2 after a 2K-doc "
                         "warmup); a long-lived cluster executor only "
                         "ever runs in the steady state, so min-of-N is "
                         "the faithful per-job figure")
    args = ap.parse_args()

    from anserini_spark.index.build import IndexConfig, build_index

    spark = SparkSession.builder.appName("anserini-build-index").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cfg = IndexConfig(
        out_dir=args.out,
        analyzer=args.analyzer,
        keep_stopwords=args.keep_stopwords,
        lang=None if args.lang == "all" else args.lang,
        doc_partitions=args.partitions,
        block_partitions=args.block_partitions or args.partitions,
        source_col="html" if args.from_html else "text",
    )
    if args.collection == "parquet":
        corpus = spark.read.parquet(args.corpus)
    elif args.collection == "trec":
        from anserini_spark.corpus.trec_ingest import trec_corpus

        corpus = trec_corpus(spark, args.corpus).select("url", "text", "lang")
    elif args.collection == "cleantrec":
        from anserini_spark.corpus.trec_ingest import clean_trec_corpus

        corpus = clean_trec_corpus(spark, args.corpus).select(
            "url", "text", "lang")
    elif args.collection == "trecweb":
        from anserini_spark.corpus.trec_ingest import trecweb_corpus

        corpus = trecweb_corpus(spark, args.corpus).select(
            "url", "text", "lang")
    elif args.collection == "warc":
        from pyspark.sql import functions as F

        from anserini_spark.corpus.warc_ingest import warc_corpus

        corpus = warc_corpus(spark, args.corpus).select(
            F.col("docid").alias("url"), "text", "lang")
    elif args.collection == "tweet":
        from anserini_spark.corpus.tweet_ingest import tweet_corpus

        corpus = tweet_corpus(spark, args.corpus)
    else:  # json
        from anserini_spark.corpus.json_ingest import read_json_collection

        corpus = read_json_collection(spark, args.corpus)
    if args.warmup:
        import shutil
        import tempfile

        from dataclasses import replace

        wdir = tempfile.mkdtemp(prefix="warmup_idx_")
        wcfg = replace(cfg, out_dir=wdir)
        build_index(spark, corpus.limit(2000), wcfg)
        shutil.rmtree(wdir, ignore_errors=True)
    if args.slices:
        from anserini_spark.index.sliced import build_sliced_index

        dirs = build_sliced_index(spark, corpus, cfg, args.slices)
        json.dump({"slices": dirs}, sys.stdout, indent=2)
        print()
        spark.stop()
        return
    if args.steady > 1:
        import os
        import shutil

        from dataclasses import replace

        stages = ("docvec", "blocks", "dictionary", "stats")
        all_runs = []
        for i in range(args.steady - 1):
            rdir = args.out + f".steady{i}"
            shutil.rmtree(rdir, ignore_errors=True)
            m = build_index(spark, corpus, replace(cfg, out_dir=rdir))
            all_runs.append({s: m[s]["wall_s"] for s in stages})
            shutil.rmtree(rdir, ignore_errors=True)
            spark.sparkContext._jvm.System.gc()
        man = build_index(spark, corpus, cfg)
        all_runs.append({s: man[s]["wall_s"] for s in stages})
        with open(os.path.join(args.out, "steady.json"), "w") as f:
            json.dump({"runs": all_runs}, f, indent=2)
    else:
        man = build_index(spark, corpus, cfg)
    json.dump(man, sys.stdout, indent=2, default=str)
    print()
    spark.stop()


if __name__ == "__main__":
    main()
