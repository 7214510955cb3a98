"""Regression harness — the `src/main/python/run_regression.py`
analogue: raw collection -> index -> batch retrieval -> TREC run ->
effectiveness metrics vs qrels, one command.

    spark-submit --py-files anserini_spark.zip scripts/run_regression.py \\
        --collection trec --input /path/to/sgml/files --index /tmp/idx \\
        --topics topics.txt --topicreader trec --qrels qrels.txt \\
        --similarity bm25 --run /tmp/run.txt

Prints a JSON metrics line (MRR@10, MAP, R@1000) and, with
--expected "map=0.2531,r@1000=0.8", exits nonzero on mismatch —
the regression-gate behavior of the reference harness.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--collection", default="trec",
                    choices=["parquet", "trec", "trecweb", "warc", "json"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--topics", required=True)
    ap.add_argument("--topicreader", default="trec", choices=["tsv", "trec"])
    ap.add_argument("--qrels", required=True)
    ap.add_argument("--similarity", default="bm25")
    ap.add_argument("--bm25", default="0.9,0.4")
    ap.add_argument("--analyzer", default="porter")
    ap.add_argument("--hits", type=int, default=1000)
    ap.add_argument("--run", default=None, help="write the TREC run here")
    ap.add_argument("--expected", default=None,
                    help="comma list like map=0.25,mrr@10=0.18 "
                         "(tolerance 5e-5); exit 1 on mismatch")
    ap.add_argument("--partitions", type=int, default=8)
    args = ap.parse_args()

    # stage 1: index (resumable)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run(
        [sys.executable, f"{REPO}/scripts/build_index.py",
         "--corpus", args.input, "--collection", args.collection,
         "--out", args.index, "--partitions", str(args.partitions),
         "--analyzer", args.analyzer],
        check=True, env=env,
    )

    # stage 2 + 3: search + evaluate in-process
    from anserini_spark.eval.metrics import evaluate
    from anserini_spark.io.runs import (
        read_qrels,
        read_topics_tsv,
        read_trec_topics,
        write_trec_run,
    )
    from anserini_spark.search.searcher import SimpleSearcher
    from anserini_spark.session import get_spark

    spark = get_spark(app="anserini-regression")
    spark.sparkContext.setLogLevel("ERROR")
    if args.topicreader == "trec":
        topics = read_trec_topics(args.topics)
    else:
        topics = read_topics_tsv(spark, args.topics)
    k1, b = (float(x) for x in args.bm25.split(","))
    searcher = SimpleSearcher(spark, args.index, k1=k1, b=b,
                              lossy=args.similarity == "bm25")
    hits = searcher.batch_search(topics, k=args.hits)
    if args.run:
        write_trec_run(hits, args.run)
    qrels = read_qrels(spark, args.qrels)
    metrics = evaluate(hits, qrels)
    print(json.dumps({"topics": len(topics), **metrics}))

    if args.expected:
        bad = []
        for pair in args.expected.split(","):
            name, val = pair.split("=")
            got = metrics[name.strip().lower()]
            if abs(got - float(val)) > 5e-5:
                bad.append(f"{name}: got {got}, expected {val}")
        if bad:
            print("REGRESSION MISMATCH: " + "; ".join(bad), file=sys.stderr)
            sys.exit(1)
        print("regression OK")
    spark.stop()


if __name__ == "__main__":
    main()
