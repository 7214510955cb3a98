"""WARC web-archive reader (ClueWeb09/ClueWeb12-style).

Reference: `collection/ClueWeb09Collection.java:94-330,595-622` (WARC
0.18; ClueWeb12 is the same frame with ``WARC/1.0``):

* a record is a ``WARC/<version>`` line, ``Name: value`` header lines
  up to a blank line, then exactly ``Content-Length`` payload bytes;
* only ``WARC-Type: response`` records are documents
  (`ClueWeb09Collection.java:400`); warcinfo/request records skip;
* docid = the ``WARC-TREC-ID`` header (`:609-611`), url =
  ``WARC-Target-URI``;
* the indexed content is the record payload after the HTTP response's
  ``Content-Length:`` header line — the reference strips everything
  through that line, not through the blank line (`:616-622`), and we
  mirror that exactly.

Spark mapping: ``spark.read.format("binaryFile")`` (one row per
.warc / .warc.gz file — ClueWeb ships ~1GB gzip members, a natural
task size), gzip-decoded and record-split inside ``mapInPandas``;
HTML -> text via the Jsoup-contract extractor. File-level parallelism,
nothing driver-side.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..extraction.html2text import extract_series_safe


_MAX_HEADER_BLOCK = 65536


def _split_headers(data: bytes, start: int = 0) -> Tuple[dict, int]:
    """Parse WARC header lines starting at ``start``; returns
    (headers, ABSOLUTE offset-of-payload). Searches only a bounded
    window and never copies the tail of ``data`` — header parsing is
    O(header bytes), so a 1 GB file with 30k records stays O(file),
    not O(records x file)."""
    limit = min(len(data), start + _MAX_HEADER_BLOCK)
    end = data.find(b"\n\n", start, limit)
    rn_end = data.find(b"\r\n\r\n", start, limit)
    if rn_end != -1 and (end == -1 or rn_end < end):
        end, sep = rn_end, 4
    else:
        sep = 2
    if end == -1:           # malformed / truncated header block
        end, sep = limit, 0
    headers = {}
    for line in data[start:end].splitlines():
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("utf-8", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
    return headers, end + sep


def parse_warc(data: bytes) -> List[dict]:
    """All records of one (decompressed) WARC file:
    [{type, docid, url, payload(bytes)}]."""
    out: List[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        marker = data.find(b"WARC/", pos)
        if marker == -1:
            break
        headers, body_off = _split_headers(data, marker)
        try:
            length = int(headers.get("Content-Length", "-1"))
        except ValueError:
            length = -1
        if length < 0:
            pos = marker + 5
            continue
        start = body_off
        payload = data[start:start + length]
        out.append({
            "type": headers.get("WARC-Type", ""),
            "docid": headers.get("WARC-TREC-ID", ""),
            "url": headers.get("WARC-Target-URI", ""),
            "payload": payload,
        })
        pos = start + length
    return out


def response_content(payload: bytes) -> str:
    """The reference's content contract: everything after the HTTP
    ``Content-Length:`` header line (`ClueWeb09Collection.java:616-622`
    — substring after the newline following "Content-Length:")."""
    s = payload.decode("utf-8", "replace")
    i = s.find("Content-Length:")
    if i == -1:
        return s
    j = s.find("\n", i)
    return s[j + 1:] if j != -1 else s


WARC_SCHEMA = T.StructType([
    T.StructField("docid", T.StringType(), True),   # WARC-TREC-ID
    T.StructField("url", T.StringType(), True),     # WARC-Target-URI
    T.StructField("html", T.BinaryType(), True),    # raw response body
    T.StructField("text", T.StringType(), True),    # Jsoup-contract text
    T.StructField("lang", T.StringType(), True),
])


def warc_corpus(spark: SparkSession, path: str,
                lang: str = "en") -> DataFrame:
    """(docid, url, html, text, lang) from .warc / .warc.gz files.
    Feed ``.select(F.col("docid").alias("url"), "text", "lang")`` into
    ``build_index`` for reference-style docid keying."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*")
        .load(path)
        .select("path", "content")
    )

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k: [] for k in ("docid", "url", "html", "lang")}
            bodies: list = []
            for pth, blob in zip(b["path"], b["content"]):
                data = bytes(blob)
                if pth.endswith(".gz") or data[:2] == b"\x1f\x8b":
                    # multi-member gzip (one member per record in
                    # ClueWeb) — GzipFile reads concatenated members
                    data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
                for rec in parse_warc(data):
                    if rec["type"] != "response":
                        continue
                    body = response_content(rec["payload"])
                    bodies.append(body)
                    rows["docid"].append(rec["docid"])
                    rows["url"].append(rec["url"])
                    rows["html"].append(body.encode("utf-8"))
                    rows["lang"].append(lang)
            if rows["docid"]:
                # vectorized batch extraction (arrow/re2, round 4)
                # with row-level exception isolation
                rows["text"] = extract_series_safe(bodies)
                yield pd.DataFrame(rows)[
                    ["docid", "url", "html", "text", "lang"]]

    return files.mapInPandas(split, schema=WARC_SCHEMA)
