"""Run-file sinks and topic/qrels sources.

* TREC 6-column run lines ``qid Q0 docid rank score runtag``
  (`search/SearchCollection.java:181-192`), score %.6f.
* MS MARCO tsv ``qid\\tdocid\\trank`` (`search/SearchMsmarco.java:141-165`).
* Topics tsv reader ``qid\\tquery`` (`TsvIntTopicReader.java:46-60`),
  sorted by qid.
* Qrels 4-column whitespace reader (`util/Qrels.java:26-53`).
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def to_trec_lines(hits: DataFrame, tag: str = "AnseriniSpark") -> DataFrame:
    return hits.select(
        F.format_string(
            "%s Q0 %s %d %.6f %s",
            F.col("qid").cast("string"),
            F.col("docid"),
            F.col("rank"),
            F.col("score").cast("double"),
            F.lit(tag),
        ).alias("value")
    )


def write_trec_run(hits: DataFrame, path: str, tag: str = "AnseriniSpark") -> None:
    to_trec_lines(hits.orderBy("qid", "rank"), tag).coalesce(1).write.mode(
        "overwrite"
    ).text(path)


def write_msmarco_run(hits: DataFrame, path: str) -> None:
    hits.orderBy("qid", "rank").select(
        F.format_string(
            "%s\t%s\t%d", F.col("qid").cast("string"), F.col("docid"),
            F.col("rank")
        ).alias("value")
    ).coalesce(1).write.mode("overwrite").text(path)


def read_topics_tsv(spark: SparkSession, path: str) -> Dict[int, str]:
    df = (
        spark.read.option("sep", "\t")
        .schema("qid int, query string")
        .csv(path)
    )
    return {r["qid"]: r["query"] for r in df.orderBy("qid").collect()}


def read_qrels(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return raw.select(
        parts.getItem(0).cast("int").alias("qid"),
        parts.getItem(2).alias("docid"),
        parts.getItem(3).cast("int").alias("grade"),
    )


def read_trec_topics(path: str) -> Dict[int, str]:
    """Classic TREC <top> topic files -> {qid: title}
    (`search/topicreader/TrecTopicReader.java:64-140`: id is the text
    after ':' on the <num> line — '<num> Number: 301' — and the query
    is the <title> text after ':' or '>', read from the next line when
    the tag line itself is empty)."""
    topics: Dict[int, str] = {}
    num: int | None = None
    lines = open(path, encoding="utf-8").read().splitlines()
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if line.startswith("<num>"):
            k = line.find(":")
            val = line[k + 1:].strip() if k != -1 else line[5:].strip()
            val = val.replace("</num>", "").strip()
            num = int(val) if val else None
        elif line.startswith("<title>") and num is not None:
            k = line.find(":")
            if k == -1:
                k = line.find(">")
            title = line[k + 1:].replace("</title>", "").strip()
            j = i + 1
            while not title and j < len(lines):  # title on following line
                title = lines[j].strip().replace("</title>", "").strip()
                j += 1
            topics[num] = title
            num = None
        i += 1
    return topics
