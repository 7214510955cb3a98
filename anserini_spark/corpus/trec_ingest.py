"""Classic TREC ad-hoc SGML collection reader (Robust04/disk45-style).

Reference: `collection/TrecCollection.java:66-230` — records are
``<DOC>...</DOC>`` blocks; the id is the ``<DOCNO>`` content (or the
``<DOC id="...">`` attribute variant); the retained raw content is
ONLY the lines inside the whitelisted content tags (TEXT, HEADLINE,
TITLE, HL, HEAD, TTL, DD, DATE, LP, LEADPARA — a line-oriented state
machine over trimmed lines, reproduced exactly here); ``contents()``
strips the remaining tags with the Jsoup ``text()`` transform
(`JsoupStringTransform`), which our ``extraction.html2text`` already
implements byte-compatibly.

Spark mapping: one row per FILE via ``spark.read.text(...,
wholetext=True)`` (TREC segment files are small-MB, and .gz is
decoded transparently by the Hadoop codec), then a ``mapInPandas``
record splitter — file-level parallelism, no driver-side parsing.
"""

from __future__ import annotations

import re
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..extraction.html2text import extract_series_safe

_START_TAGS = ("<TEXT>", "<HEADLINE>", "<TITLE>", "<HL>", "<HEAD>",
               "<TTL>", "<DD>", "<DATE>", "<LP>", "<LEADPARA>")
_END_TAGS = ("</TEXT>", "</HEADLINE>", "</TITLE>", "</HL>", "</HEAD>",
             "</TTL>", "</DD>", "</DATE>", "</LP>", "</LEADPARA>")
_ID_ATTR = re.compile(r'.*id="([^"]+)".*')


def parse_trec_file(text: str) -> List[Tuple[str, str]]:
    """(docid, raw) per record — the exact line state machine of
    `TrecCollection.Segment.readNextRecord` (lines trimmed; only
    whitelisted content tags retained; DOC-id attribute variant
    handled)."""
    out: List[Tuple[str, str]] = []
    it = iter(text.splitlines())
    builder: List[str] = []
    found = False
    in_tag = -1
    for line in it:
        line = line.strip()
        if line.startswith("<DOC>") or line.startswith("<DOC "):
            found = True
            builder = []
            in_tag = -1
            m = _ID_ATTR.match(line)
            if m:
                builder.append(f"<DOCNO>{m.group(1)}</DOCNO>")
            else:
                for nxt in it:
                    if nxt.strip().startswith("<DOCNO>"):
                        builder.append(nxt.strip())
                        break
                while not any("</DOCNO>" in b for b in builder):
                    nxt = next(it, None)
                    if nxt is None:
                        break
                    builder.append(nxt.strip())
        if found:
            if line.startswith("<"):
                if in_tag >= 0 and line.startswith(_END_TAGS[in_tag]):
                    builder.append(line)
                    in_tag = -1
                elif in_tag < 0:
                    for k, st in enumerate(_START_TAGS):
                        if line.startswith(st):
                            in_tag = k
                            break
            if in_tag >= 0:
                if line.endswith(_END_TAGS[in_tag]):
                    builder.append(line)
                    in_tag = -1
                else:
                    builder.append(line)
        if line.startswith("</DOC>"):
            joined = "\n".join(builder)
            i = joined.find("<DOCNO>")
            j = joined.find("</DOCNO>")
            if i == 0 and j != -1:
                docid = joined[len("<DOCNO>"):j].strip()
                raw = joined[j + len("</DOCNO>"):].strip()
                out.append((docid, raw))
            found = False
            builder = []
            in_tag = -1
    return out


TREC_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),   # docid
    T.StructField("text", T.StringType(), True),   # tag-stripped contents
    T.StructField("lang", T.StringType(), True),
    T.StructField("raw", T.StringType(), True),    # whitelisted SGML
])


def trec_corpus(spark: SparkSession, path: str,
                lang: str = "en") -> DataFrame:
    """Corpus DataFrame (url=docid, text, lang, raw) from TREC SGML
    files at ``path`` (glob ok; .gz transparent). Feed
    ``.select("url", "text", "lang")`` straight into ``build_index``."""
    files = spark.read.text(path, wholetext=True)

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"url": [], "lang": [], "raw": []}
            for blob in b["value"]:
                for docid, raw in parse_trec_file(blob or ""):
                    rows["url"].append(docid)
                    rows["lang"].append(lang)
                    rows["raw"].append(raw)
            if rows["url"]:
                # JsoupStringTransform analogue + trim
                # (`TrecCollection.java:219-226`); vectorized batch
                # extraction (arrow/re2, round 4)
                rows["text"] = extract_series_safe(rows["raw"])
                yield pd.DataFrame(rows)[["url", "text", "lang", "raw"]]

    return files.mapInPandas(split, schema=TREC_SCHEMA)


def parse_trecweb_file(text: str) -> List[Tuple[str, str]]:
    """(docid, raw) per Trecweb (Gov2-style) record —
    `collection/TrecwebCollection.java:54-100`: every trimmed line
    between <DOC>/</DOC> is collected; id = <DOCNO> content (must
    start the record); raw = everything after </DOCHDR>. Malformed
    records (missing/misplaced tags) are skipped, matching the
    reference's ParseException-and-continue behavior."""
    out: List[Tuple[str, str]] = []
    builder: List[str] = []
    found = False
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("<DOC>"):
            found = True
            builder = []
            continue
        if line.startswith("</DOC>") and builder:
            joined = "\n".join(builder)
            i, j = joined.find("<DOCNO>"), joined.find("</DOCNO>")
            h, k = joined.find("<DOCHDR>"), joined.find("</DOCHDR>")
            if i == 0 and j != -1 and h != -1 and k != -1 and k >= h:
                docid = joined[len("<DOCNO>"):j].strip()
                raw = joined[k + len("</DOCHDR>"):].strip()
                out.append((docid, raw))
            found = False
            builder = []
            continue
        if found:
            builder.append(line)
    return out


def trecweb_corpus(spark: SparkSession, path: str,
                   lang: str = "en") -> DataFrame:
    """Corpus DataFrame from Trecweb (Gov2-style) files; raw is the
    archived HTML, text its Jsoup-contract extraction."""
    files = spark.read.text(path, wholetext=True)

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"url": [], "lang": [], "raw": []}
            for blob in b["value"]:
                for docid, raw in parse_trecweb_file(blob or ""):
                    rows["url"].append(docid)
                    rows["lang"].append(lang)
                    rows["raw"].append(raw)
            if rows["url"]:
                # vectorized batch extraction (arrow/re2, round 4)
                rows["text"] = extract_series_safe(rows["raw"])
                yield pd.DataFrame(rows)[["url", "text", "lang", "raw"]]

    return files.mapInPandas(split, schema=TREC_SCHEMA)


def clean_trec_corpus(spark: SparkSession, path: str,
                      lang: str = "en") -> DataFrame:
    """CleanTrecCollection analogue (`collection/CleanTrecCollection.java`):
    identical record parsing to ``trec_corpus``, but contents == raw —
    NO Jsoup tag stripping (tags are indexed as text)."""
    files = spark.read.text(path, wholetext=True)

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"url": [], "text": [], "lang": [], "raw": []}
            for blob in b["value"]:
                for docid, raw in parse_trec_file(blob or ""):
                    rows["url"].append(docid)
                    rows["text"].append(raw)
                    rows["lang"].append(lang)
                    rows["raw"].append(raw)
            if rows["url"]:
                yield pd.DataFrame(rows)

    return files.mapInPandas(split, schema=TREC_SCHEMA)
