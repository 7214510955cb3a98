"""Focused blocks-stage scaling profile (round-4: the 2->8 residual).

Stages a corpus + docvec once, then times ONLY the blocks stage at a
given core count under taskset pinning — isolates the map-side block
encode + layout shuffle + parquet write from the extraction-heavy
docvec stage.

    python scripts/blocks_profile.py stage   # build corpus+docvec once
    taskset -c 0-1 python scripts/blocks_profile.py run 2
    taskset -c 0-7 python scripts/blocks_profile.py run 8
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/dev/shm/blocks_profile"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DOC_PARTS = 64
BLOCK_PARTS = 128


def get_spark(cores: int):
    from anserini_spark.session import get_spark as gs
    os.environ["SPARK_DRIVER_MEM"] = "48g"
    return gs(master=f"local[{cores}]", shuffle_partitions=cores)


def stage():
    import duckdb
    from anserini_spark.corpus.synth import web_corpus
    from anserini_spark.index.build import IndexConfig, build_index

    os.makedirs(WORK, exist_ok=True)
    spark = get_spark(32)
    spark.sparkContext.setLogLevel("ERROR")
    base = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    mult = max(1, 4_800_000 // int(base))
    corpus_dir = os.path.join(WORK, "corpus.parquet")
    web_corpus(spark, SF_DIR, multiplier=mult).write.mode(
        "overwrite").parquet(corpus_dir)
    # docvec only: run the full build then delete the post-docvec stages
    idx = os.path.join(WORK, "idx_template")
    shutil.rmtree(idx, ignore_errors=True)
    corpus = spark.read.parquet(corpus_dir)
    cfg = IndexConfig(out_dir=idx, doc_partitions=DOC_PARTS,
                      block_partitions=BLOCK_PARTS, source_col="html")
    build_index(spark, corpus, cfg)
    print("staged", json.load(open(os.path.join(idx, "manifest.json")))[
        "docvec"])


def run(cores: int, repeats: int = 3):
    from anserini_spark.index.build import IndexConfig, build_index

    spark = get_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    template = os.path.join(WORK, "idx_template")
    walls = []
    for rep in range(repeats):
        idx = os.path.join(WORK, f"idx_run_{cores}_{rep}")
        shutil.rmtree(idx, ignore_errors=True)
        os.makedirs(idx)
        # link docvec, keep only the docvec manifest entry
        os.symlink(os.path.join(template, "docvec.parquet"),
                   os.path.join(idx, "docvec.parquet"))
        man = json.load(open(os.path.join(template, "manifest.json")))
        json.dump({"docvec": man["docvec"]},
                  open(os.path.join(idx, "manifest.json"), "w"))
        cfg = IndexConfig(out_dir=idx, doc_partitions=DOC_PARTS,
                          block_partitions=BLOCK_PARTS, source_col="html")
        t0 = time.time()
        build_index(spark, spark.read.parquet(
            os.path.join(WORK, "corpus.parquet")), cfg)
        wall = time.time() - t0
        got = json.load(open(os.path.join(idx, "manifest.json")))
        walls.append({
            "total_s": round(wall, 1),
            "blocks_s": got["blocks"]["wall_s"],
            "dict_s": got["dictionary"]["wall_s"],
            "postings_per_sec": got["blocks"]["postings_per_sec"],
        })
        shutil.rmtree(idx, ignore_errors=True)
        spark.sparkContext._jvm.System.gc()
    print(json.dumps({"cores": cores, "runs": walls}))


if __name__ == "__main__":
    if sys.argv[1] == "stage":
        stage()
    else:
        run(int(sys.argv[2]))
