"""Benchmark-contamination detection contract (ops/contamination.py)."""

from anserini_spark.ops.contamination import ngram_contamination


def test_ngram_contamination(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "nothing to see here at all in this one honestly"),
            (3, "prefix words then the quick brown fox jumps over the "
                "lazy dog tonight and more trailing text"),
            # the benchmark 8-gram appearing twice in one doc
            (4, "a b c d e f g h filler a b c d e f g h"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy"),
            (200, "a b c d e f g h"),
            (300, "never present gram x y z w v"),
        ],
        "bench_id long, gram string",
    )
    out = {(r["doc_id"], r["bench_id"]): r["n_hits"]
           for r in ngram_contamination(docs, bench, n=8).collect()}
    assert out == {(1, 100): 1, (3, 100): 1, (4, 200): 2}
