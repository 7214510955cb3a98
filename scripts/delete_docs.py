"""spark-submit entry point: tombstone documents in an index
(Lucene ``IndexWriter.deleteDocuments`` analogue — soft, O(deletes);
a later merge/compaction purges physically).

    spark-submit --py-files anserini_spark.zip scripts/delete_docs.py \\
        --index /path/index --docids ids.txt
    # or inline:
    ... --index /path/index --docid doc1 --docid doc2
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def parse_args(argv=None) -> argparse.Namespace:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--docids", help="newline-delimited docid/url file")
    ap.add_argument("--docid", action="append", default=[],
                    help="inline docid (repeatable)")
    args = ap.parse_args(argv)
    if not args.docids and not args.docid:
        ap.error("nothing to delete: pass --docids or --docid")
    return args


def run(spark: SparkSession, args: argparse.Namespace) -> int:
    """Tombstone the requested docids; returns the count written.
    Session lifecycle belongs to the caller (main owns create/stop),
    so tests drive this directly."""
    from anserini_spark.index.tombstones import add_tombstones

    n = 0
    if args.docids:
        from pyspark.sql import functions as F

        urls = (spark.read.text(args.docids)
                .select(F.trim(F.col("value")).alias("url"))
                .filter(F.col("url") != ""))
        n += urls.count()
        add_tombstones(spark, args.index, urls)
    if args.docid:
        add_tombstones(spark, args.index, args.docid)
        n += len(args.docid)
    print(f"tombstoned {n} docid(s) in {args.index} "
          "(soft delete; compact to purge)")
    return n


def main() -> None:
    args = parse_args()
    spark = SparkSession.builder.appName("anserini-delete-docs").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, args)
    spark.stop()


if __name__ == "__main__":
    main()
