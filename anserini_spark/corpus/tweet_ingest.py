"""Tweet JSON collection reader — the Spark-native form of the
reference's microblog ingestion (`collection/TweetCollection.java:
90-160` + `index/generator/TweetGenerator.java:108-160`):

* input is JSONL of Twitter status objects (one JSON per line, the
  TREC microblog distribution format);
* status-deletion notices (a ``delete`` field) are skipped
  (`TweetCollection.java:102-104`);
* ``created_at`` ("Fri Mar 29 11:03:41 +0000 2013") parses to the
  tweet timestamp; ``id_str`` is the collection docid and its numeric
  value the ``id_long`` recency/tie-break key;
* generator filters: empty text, retweets (a ``retweeted_status``
  field) unless ``keep_retweets``, ids beyond ``max_id``
  (`TweetGenerator.java:135-146`), URL stripping unless ``keep_urls``
  (simplified to explicit-scheme URLs; twitter-text's Extractor also
  strips bare domains);
* output is the engine's corpus-table shape — (url, warc_ts, text,
  lang) with ``url`` = id_str — ready for ``build_index`` with
  ``analyzer="tweet"`` and ``search/tweets.search_tweets``.

Everything is JVM-side (``get_json_object`` + regexp + to_timestamp);
no Python row ops, so the reader scales like any other corpus scan.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# "Fri Mar 29 11:03:41 +0000 2013" — Spark's parser has no EEE token,
# so the day-of-week prefix is dropped before to_timestamp
_CREATED_AT_FMT = "MMM dd HH:mm:ss xx yyyy"
_URL_RE = r"https?://\S+"


def tweet_corpus(spark: SparkSession, path: str,
                 keep_retweets: bool = False,
                 keep_urls: bool = False,
                 max_id: Optional[int] = None) -> DataFrame:
    """Read a tweet JSONL file/dir into the corpus-table shape."""
    raw = spark.read.text(path).filter(F.trim("value") != "")
    j = raw.select(
        F.get_json_object("value", "$.id_str").alias("id_str"),
        F.get_json_object("value", "$.text").alias("text"),
        F.get_json_object("value", "$.created_at").alias("created_at"),
        F.get_json_object("value", "$.lang").alias("lang"),
        F.get_json_object("value", "$.delete").alias("delete"),
        F.get_json_object("value", "$.retweeted_status.id_str")
         .alias("retweet_of"),
    )
    # deletion notices + malformed records (required fields missing,
    # TweetCollection's @JsonProperty(required = true) contract)
    j = j.filter(F.col("delete").isNull()
                 & F.col("id_str").isNotNull()
                 & F.col("text").isNotNull()
                 & F.col("created_at").isNotNull())
    if not keep_retweets:
        j = j.filter(F.col("retweet_of").isNull())
    if max_id is not None:
        j = j.filter(F.col("id_str").cast("long") <= F.lit(int(max_id)))
    text = F.trim("text")
    if not keep_urls:
        text = F.trim(F.regexp_replace(text, _URL_RE, ""))
    out = j.select(
        F.col("id_str").alias("url"),
        F.to_timestamp(F.expr("substring(created_at, 5)"),
                       _CREATED_AT_FMT).alias("warc_ts"),
        text.alias("text"),
        F.coalesce("lang", F.lit("en")).alias("lang"),
    )
    return out.filter(F.col("text") != "")
