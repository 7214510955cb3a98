"""Deterministic Common-Crawl-style corpus (FIXTURES.md §1).

Input table shape per BASELINE.json input_hint:
``(url string, warc_ts timestamp, html binary, text string, lang string)``

Derived deterministically (pure function of doc_id, no RNG state) from
the driver's ``documents.parquet`` (doc_id, text, lang, source, ...) so
the bench input scales with sf without shipping data. Generation runs
distributed via ``mapInPandas``; the html renderer and
``extraction.html2text.extract_text`` are written against the same
Jsoup-``text()`` contract, so ``extract_text(html) == text``
byte-identical per url (tested).

Deterministic quirks to exercise engine paths (cf.
`ClueWeb09Collection.java:398-401` non-indexable records,
`DefaultLuceneDocumentGenerator.java:64-66` empty docs,
`IndexCollection.java:213-215` docid dedup):

* ``doc_id % 97 == 3``  -> empty text ("" html body) — empty-doc filter
* ``doc_id % 101 == 7`` -> the row is emitted twice (duplicate url)
* non-"en" ``lang`` rows pass through (language filter path)
"""

from __future__ import annotations

import datetime as _dt
import html as _html
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_EPOCH = _dt.datetime(2019, 6, 1, 0, 0, 0)


def _render_html(doc_id: int, text: str, lang: str) -> str:
    """Deterministic HTML page whose extracted text == ``text``.

    Exercises: title text, entity-encoded words, <script>/<style> noise,
    nested inline tags, block-element joining, attributes.
    """
    words = text.split()
    if not words:
        return (
            "<html><head><title></title>"
            "<script>var x = 1;</script></head>"
            "<body><div class=\"empty\">   </div></body></html>"
        )
    # title = first up-to-5 words; remaining words split into paragraphs
    n_title = min(5, len(words))
    title = " ".join(words[:n_title])
    body_words = words[n_title:]
    paras = []
    i = 0
    pi = 0
    while i < len(body_words):
        step = 12 + ((doc_id + pi) % 9)
        chunk = body_words[i : i + step]
        i += step
        rendered = []
        for j, w in enumerate(chunk):
            esc = _html.escape(w)
            k = (doc_id + i + j) % 7
            if k == 0:
                # entity-encode first char
                esc = f"&#{ord(w[0])};" + _html.escape(w[1:])
                rendered.append(esc)
            elif k == 3:
                rendered.append(f"<b>{esc}</b>")
            elif k == 5:
                rendered.append(f"<a href='/l/{j}'><i>{esc}</i></a>")
            else:
                rendered.append(esc)
        tag = "p" if pi % 3 else "div"
        paras.append(f"<{tag}>" + " ".join(rendered) + f"</{tag}>")
        pi += 1
    return (
        f"<html lang=\"{lang}\"><head><title>{_html.escape(title)}</title>"
        f"<style>body {{ margin: 0; }}</style>"
        f"<script>function f() {{ return {doc_id}; }}</script></head>"
        "<body>" + "\n".join(paras) + "<script>console.log('x')</script>"
        "</body></html>"
    )


def _rows(batch: pd.DataFrame, multiplier: int = 1) -> pd.DataFrame:
    out = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for doc_id, text, lang, source in zip(
        batch["doc_id"], batch["text"], batch["lang"], batch["source"]
    ):
        base_id = int(doc_id)
        base_text = text if isinstance(text, str) else ""
        for rep in range(multiplier):
            doc_id = base_id * multiplier + rep
            text = base_text
            if rep:
                # deterministic variant: rotate tokens (keeps vocab/Zipf)
                w = text.split()
                r = rep % len(w) if w else 0
                text = " ".join(w[r:] + w[:r])
            if doc_id % 97 == 3:
                text = ""
            url = f"https://{source}.example.org/page/{doc_id:010d}"
            ts = _EPOCH + _dt.timedelta(seconds=(doc_id * 37) % 31_536_000)
            page = _render_html(doc_id, text, lang).encode("utf-8")
            reps = 2 if doc_id % 101 == 7 else 1
            for _ in range(reps):
                out["url"].append(url)
                out["warc_ts"].append(ts)
                out["html"].append(page)
                out["text"].append(text)
                out["lang"].append(lang)
    return pd.DataFrame(out)


def web_corpus(spark: SparkSession, sf_dir: str, limit: int | None = None,
               multiplier: int = 1) -> DataFrame:
    """Corpus DataFrame derived from ``{sf_dir}/documents.parquet``.

    ``multiplier`` deterministically inflates the corpus (rotated-token
    variants) for throughput benchmarking at larger-than-sf scale."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    if limit is not None:
        docs = docs.filter(docs.doc_id < limit)
    if multiplier > 1:
        docs = docs.repartition(32)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _rows(b, multiplier)

    return docs.mapInPandas(gen, schema=CORPUS_SCHEMA)


NATURAL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def natural_corpus(spark: SparkSession, n_docs: int,
                   vocab: int = 100_000, zipf_s: float = 1.0,
                   avg_len: int = 60, seed: int = 1505) -> DataFrame:
    """Natural-vocabulary synthetic passages (FIXTURES.md latency
    fixture): ``vocab`` distinct terms with a Zipf(s) frequency law —
    the long-tail shape of a real web/passage corpus, unlike the
    31-term driver testdata whose every term is a head term. Doc
    lengths are ~lognormal around ``avg_len`` (MS MARCO-passage-like).
    Deterministic: each partition seeds PCG64 with (seed, first
    doc_id); no RNG state crosses the driver.
    """
    import numpy as np

    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    weights = ranks ** (-zipf_s)
    cdf = np.cumsum(weights / weights.sum())

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            if len(ids) == 0:
                continue
            rng = np.random.default_rng((seed, int(ids[0])))
            lens = np.clip(
                rng.lognormal(np.log(avg_len), 0.4, len(ids)), 8, 400
            ).astype(np.int64)
            total = int(lens.sum())
            toks = np.searchsorted(cdf, rng.random(total))
            bounds = np.concatenate([[0], np.cumsum(lens)])
            texts = [
                " ".join(f"t{t}" for t in toks[bounds[i]:bounds[i + 1]])
                for i in range(len(ids))
            ]
            yield pd.DataFrame({
                "url": [f"https://nat.example.org/{i:012d}" for i in ids],
                "text": texts,
                "lang": "en",
            })

    return (
        spark.range(0, n_docs, 1, 32)
        .mapInPandas(gen, schema=NATURAL_SCHEMA)
    )
