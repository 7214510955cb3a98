"""Topic-file readers with a filename registry — the reference reads 14
topic formats through ``TopicReader.getTopicReaderClassByFile``
(`search/topicreader/TopicReader.java:43-74`, `Topics.java:22-56`); this
module covers the formats used by the web/passage collections in scope:

* TREC ``<top>`` (``TrecTopicReader.java``) — via runs.read_trec_topics
* Web-track XML ``<topic number=..><query>`` (``WebxmlTopicReader.java:28-70``)
* Million-query ``qid:query`` (``WebTopicReader.java:44-66``)
* Prioritized MQ ``qid:priority:query`` (``PrioritizedWebTopicReader.java``)
* Microblog ``<num> Number: MBnnn`` + ``<title>``/``<query>``
  (``MicroblogTopicReader.java:34-80``)
* tsv with int qids (``TsvIntTopicReader.java``) and string qids
  (``TsvStringTopicReader.java``)

``read_topics(path)`` dispatches by exact filename first (the
reference's registry contract), then by content sniffing, so any
same-format file works without registration.
"""

from __future__ import annotations

import re
from typing import Dict

from anserini_spark.io.runs import read_trec_topics


def _open(path: str):
    # topic files in the wild mix encodings (the MQ files contain
    # latin-1 bytes); mirror Java's decoder behavior of replacing
    # malformed sequences instead of failing the whole file. utf-8-sig
    # additionally strips a UTF-8 BOM so a BOM'd first line still
    # parses (int(qid) / the sniffer's ^\d+ anchors would reject it)
    return open(path, encoding="utf-8-sig", errors="replace")


def read_webxml_topics(path: str) -> Dict[int, str]:
    """`WebxmlTopicReader.java:44-70`: number= attribute on the <topic>
    line; query is a single-line ``<query>...</query>`` element."""
    topics: Dict[int, str] = {}
    number: int | None = None
    query = ""
    for raw in _open(path):
        line = raw.strip()
        if line.startswith("<topic"):
            m = re.search(r'number\s*=\s*"([^"]+)"', line)
            if not m:
                raise ValueError(f"<topic> line without number=: {line}")
            number = int(m.group(1))
        elif line.startswith("<query>") and line.endswith("</query>"):
            query = line[len("<query>"):-len("</query>")].strip()
        elif line.startswith("</topic>") and number is not None:
            topics[number] = query
            number, query = None, ""
    return topics


def read_web_topics(path: str) -> Dict[int, str]:
    """`WebTopicReader.java:50-66`: one ``qid:query`` per line. The
    reference takes ``line.split(":")[1]`` — a query containing a colon
    is TRUNCATED at its first colon. Mirrored exactly so regression runs
    over MQ topics stay term-identical with the reference."""
    topics: Dict[int, str] = {}
    for raw in _open(path):
        line = raw.strip()
        if not line:
            continue
        topics[int(line.split(":", 1)[0])] = line.split(":")[1]
    return topics


def read_prioritized_web_topics(path: str) -> Dict[int, str]:
    """`PrioritizedWebTopicReader.java`: ``qid:priority:query`` per line
    (priority is metadata; the query is the retrieval field). The
    reference takes ``StringUtils.substringAfterLast(line, ":")`` — a
    query containing a colon keeps only the text after its LAST colon.
    Mirrored exactly (same term stream as the reference)."""
    topics: Dict[int, str] = {}
    for raw in _open(path):
        line = raw.strip()
        if not line:
            continue
        qid = line.split(":", 1)[0]
        topics[int(qid)] = line.rsplit(":", 1)[1]
    return topics


def read_microblog_topics(path: str) -> Dict[int, str]:
    """`MicroblogTopicReader.java:34-80`: ``<num> Number: MBnnn </num>``
    with the query in ``<title>`` (2011) or ``<query>`` (2012+)."""
    text = _open(path).read()
    topics: Dict[int, str] = {}
    for block in re.findall(r"<top>(.*?)</top>", text, re.DOTALL):
        m = re.search(r"<num>\s*Number:\s*MB(\d+)\s*</num>", block)
        if not m:
            raise ValueError("microblog <top> without MB number")
        qid = int(m.group(1))
        t = re.search(r"<title>\s*(.*?)\s*</title>", block, re.DOTALL)
        if t is None:
            t = re.search(r"<query>\s*(.*?)\s*</query>", block, re.DOTALL)
        if t is None:
            raise ValueError(f"microblog topic MB{qid} without title/query")
        topics[qid] = t.group(1).strip()
    return topics


def read_microblog_times(path: str) -> Dict[int, int]:
    """qid -> ``<querytweettime>`` (the chronologically-nearest tweet
    id) from a microblog topic file — the per-query upper bound
    ``search/tweets.search_tweets`` filters on
    (`SearchCollection.java:577-580`)."""
    text = _open(path).read()
    times: Dict[int, int] = {}
    for block in re.findall(r"<top>(.*?)</top>", text, re.DOTALL):
        m = re.search(r"<num>\s*Number:\s*MB(\d+)\s*</num>", block)
        t = re.search(r"<querytweettime>\s*(\d+)\s*</querytweettime>",
                      block)
        if m and t:
            times[int(m.group(1))] = int(t.group(1))
    return times


def read_tsv_int_topics(path: str) -> Dict[int, str]:
    """`TsvIntTopicReader.java:46-60`: ``qid\\tquery``, int qids."""
    topics: Dict[int, str] = {}
    for raw in _open(path):
        line = raw.strip()
        if not line:
            continue
        qid, query = line.split("\t", 1)
        topics[int(qid)] = query.strip()
    return topics


def read_tsv_string_topics(path: str) -> Dict[str, str]:
    """`TsvStringTopicReader.java`: ``qid\\tquery``, qids kept as
    strings (NTCIR/CLEF ids like ``ACLIA2-CS-0002``)."""
    topics: Dict[str, str] = {}
    for raw in _open(path):
        line = raw.strip()
        if not line:
            continue
        qid, query = line.split("\t", 1)
        topics[qid] = query.strip()
    return topics


# filename -> reader, mirroring TopicReader.TOPIC_FILE_TO_TYPE /
# Topics.java for the in-scope formats (CAR/CACM/NTCIR-en and the
# out-of-scope collections' files are omitted per SURVEY §7.3)
TOPIC_FILE_REGISTRY = {
    **{name: read_trec_topics for name in (
        "topics.adhoc.51-100.txt", "topics.adhoc.101-150.txt",
        "topics.adhoc.151-200.txt", "topics.adhoc.401-450.txt",
        "topics.adhoc.451-550.txt",
        "topics.robust04.txt", "topics.robust05.txt",
        "topics.core17.txt", "topics.core18.txt",
        "topics.terabyte04.701-750.txt", "topics.terabyte05.751-800.txt",
        "topics.terabyte06.801-850.txt",
        "topics.trec02ar-ar.txt",
        "topics.fire12bn.176-225.txt", "topics.fire12hi.176-225.txt",
        "topics.fire12en.176-225.txt",
    )},
    **{name: read_webxml_topics for name in (
        "topics.web.1-50.txt", "topics.web.51-100.txt",
        "topics.web.101-150.txt", "topics.web.151-200.txt",
        "topics.web.201-250.txt", "topics.web.251-300.txt",
    )},
    "topics.mq.1-10000.txt": read_web_topics,
    "topics.mq.10001-20000.txt": read_web_topics,
    "topics.terabyte05.efficiency.txt": read_web_topics,
    "topics.mq.20001-60000.txt": read_prioritized_web_topics,
    **{name: read_microblog_topics for name in (
        "topics.microblog2011.txt", "topics.microblog2012.txt",
        "topics.microblog2013.txt", "topics.microblog2014.txt",
    )},
    "topics.msmarco-doc.dev.txt": read_tsv_int_topics,
    "topics.msmarco-passage.dev-subset.txt": read_tsv_int_topics,
    "topics.dl19-passage.txt": read_tsv_int_topics,
    "topics.dl19-doc.txt": read_tsv_int_topics,
    "topics.ntcir8zh.eval.txt": read_tsv_string_topics,
    "topics.clef06fr.mono.fr.txt": read_tsv_string_topics,
}


_SNIFF_LINES = 20


def _sniff(path: str):
    """Content-based fallback for unregistered files of a known shape."""
    head = _open(path).read(65536)
    payload = []
    for line in head.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("<?xml") or line.startswith("<!DOCTYPE"):
            continue  # XML prolog: keep scanning for the payload shape
        if line.startswith("<top>") or line.startswith("<top "):
            if re.search(r"Number:\s*MB\d+", head):
                return read_microblog_topics
            return read_trec_topics
        if line.startswith("<topic") or re.search(r"<topic\s", head):
            return read_webxml_topics
        if "\t" in line:
            qid = line.split("\t", 1)[0]
            return read_tsv_int_topics if qid.isdigit() \
                else read_tsv_string_topics
        if re.match(r"^\d+:", line):
            payload.append(line)
            if len(payload) >= _SNIFF_LINES:
                break
            continue
        break
    if payload:
        # prioritized MQ only when the qid:priority:query shape holds on
        # EVERY sampled line; a plain qid:query file whose first query
        # merely begins with digits-colon must not lose text to the
        # discarded priority field — prefer the plain reader on ambiguity
        # only if some line lacks the 3-field shape
        if all(re.match(r"^\d+:\d+:", ln) for ln in payload):
            return read_prioritized_web_topics
        return read_web_topics
    raise ValueError(f"cannot determine topic format of {path}")


def read_topics(path: str) -> Dict:
    """Registry-driven dispatch (`TopicReader.java:80-90`): exact
    filename first, then content sniffing."""
    import os

    reader = TOPIC_FILE_REGISTRY.get(os.path.basename(path))
    if reader is None:
        reader = _sniff(path)
    return reader(path)
