"""Distributed inverted-index builder (the Spark-native analogue of
`index/IndexCollection.java:729-893`).

Pipeline (all declarative DataFrame ops + two Arrow-batched kernels):

1. **ingest/docvec** — corpus ``(url, warc_ts, html, text, lang)`` ->
   filter non-indexable (lang, whitelist, empty text) -> Arrow kernel
   running HTML->text extraction + the analyzer chain + per-doc tf
   BEFORE any shuffle (the multi-KB page payload never crosses the
   wire) -> hash-``repartition(P, url)`` (no range sampling: a
   range-partitioner sample pass would re-run the extraction kernel)
   + sort-within-partition by url -> id-assignment kernel ->
   ``docvec(doc_id, url, segment, doclen, terms, tfs)``.

   Doc ids are ``(partition << 40) | row`` — order-isomorphic to the
   url sort inside a segment, dense within a segment (so per-segment
   scoring uses a dense array). Cross-segment ordering is by url
   string at the top-k merge, exactly like the reference's
   BREAK_SCORE_TIES_BY_DOCID on the collection docid string
   (`SearchCollection.java:115-116`). Duplicate urls are dropped
   in-kernel (hash-colocated + sorted => adjacent;
   cf. `IndexCollection.java:213-215`).

2. **postings blocks** — explode docvec -> hash-``repartition(B,
   term, doc_id >> RANGE_SHIFT)`` + sort-within by (term, doc_id).
   This is the head-term skew strategy: a Zipf head term splits
   deterministically across partitions by 2^RANGE_SHIFT-doc buckets
   (never materialized in one task, no sampling pass); per-(term,doc)
   tf was already computed doc-locally in stage 1, so no skewed
   groupBy ever runs. The block kernel breaks at bucket boundaries so
   cross-partition block runs of one (term, segment) cover disjoint
   ascending doc ranges. Files are (term, doc_id)-sorted within
   partitions, so a query's ``term IN (...)`` filter prunes at parquet
   row-group granularity via min/max stats.

3. **dictionary** — per-term (df, cf) aggregated from block metadata
   (`IndexReaderUtils.java:205-221` semantics), plus collection stats
   (numDocs, docCount, sumTotalTermFreq, avgdl —
   `IndexUtils.java:157-176`, avgdl consumed by BM25 per
   `AccurateBM25Similarity.java:48-54`).

Each stage writes under ``out_dir`` and appends a manifest entry with
lineage + metrics (docs/sec, postings/sec, bytes — north_rule);
re-running ``build()`` skips stages whose output+manifest already
exist (resumable from checkpoint).
"""

from __future__ import annotations

import json
import os
import time
from collections import Counter
from dataclasses import dataclass, field
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..analysis.analyzer import analyze, stem_mode
from ..analysis.analyzer import analysis_version as _analysis_version
from .blocks import RANGE_SHIFT, encode_blocks

# doc_id = (segment << SEG_SHIFT) | row_in_segment. 33 matches the
# partition/record split of monotonically_increasing_id, so the docvec
# stage assigns ids entirely JVM-side (round 4); 2^33 docs/segment and
# 2^31 segments bound nothing real at 10^12 docs.
SEG_SHIFT = 33
SEG_MASK = (1 << SEG_SHIFT) - 1

_POSITIONS_FIELD = T.StructField(
    "positions", T.ArrayType(T.ArrayType(T.IntegerType())), True
)

# -storeContents analogue: the extracted text rides the docvec so
# SimpleSearcher.doc(docid) can return stored contents
_CONTENTS_FIELD = T.StructField("contents", T.StringType(), True)

# publication-timestamp passthrough (the reference's stored
# PUBLISHED_DATE / tweet epoch fields): rides the docvec when
# ``store_timestamps=True`` so date-aware search paths (background
# linking's date filter) can consult it at query time
_TS_FIELD = T.StructField("warc_ts", T.TimestampType(), True)

DOCVEC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("segment", T.IntegerType(), False),
        T.StructField("doclen", T.LongType(), False),
        T.StructField("terms", T.ArrayType(T.StringType()), False),
        T.StructField("tfs", T.ArrayType(T.IntegerType()), False),
    ]
)


def docvec_schema(store_positions: bool,
                  store_contents: bool = False,
                  store_timestamps: bool = False) -> T.StructType:
    fields = list(DOCVEC_SCHEMA.fields)
    if store_positions:
        fields.append(_POSITIONS_FIELD)
    if store_contents:
        fields.append(_CONTENTS_FIELD)
    if store_timestamps:
        fields.append(_TS_FIELD)
    return T.StructType(fields)

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("segment", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("max_tf", T.IntegerType(), False),
        T.StructField("min_dl", T.LongType(), False),
        T.StructField("sum_tf", T.LongType(), False),
        T.StructField("docs_bin", T.BinaryType(), False),
        T.StructField("tfs_bin", T.BinaryType(), False),
        T.StructField("dls_bin", T.BinaryType(), False),
    ]
)

_POS_BIN_FIELD = T.StructField("pos_bin", T.BinaryType(), False)


def blocks_schema(store_positions: bool) -> T.StructType:
    if not store_positions:
        return BLOCKS_SCHEMA
    return T.StructType(BLOCKS_SCHEMA.fields + [_POS_BIN_FIELD])


@dataclass
class IndexConfig:
    out_dir: str
    analyzer: str = "porter"          # "porter" | "krovetz" | "none" |
                                      # "ws" | "cjk" | "fr"
                                      # (analysis/multilingual.py maps
                                      # corpus lang -> analyzer name)
    keep_stopwords: bool = False
    lang: Optional[str] = "en"        # None = keep all languages
    doc_partitions: int = 16          # P: segments (Lucene-segment analogue)
    block_partitions: int = 32        # B: posting-sort parallelism
    block_size: int = 128
    source_col: str = "text"          # "text" (pre-extracted) | "html"
    whitelist: Optional[str] = None   # path: newline-delimited urls to
                                      # keep (`IndexCollection.java:707-712`)
    store_positions: bool = False     # -storePositions analogue: docvec
                                      # carries per-term position lists
                                      # (gap-preserving, SDM needs them)
    store_contents: bool = False      # -storeContents analogue: docvec
                                      # carries the extracted text for
                                      # SimpleSearcher.doc()
    store_timestamps: bool = False    # docvec carries warc_ts (the
                                      # PUBLISHED_DATE / tweet-epoch
                                      # stored-field analogue) for
                                      # date-aware search paths
    extra: dict = field(default_factory=dict)


def _analyze_for(cfg: IndexConfig):
    from ..analysis.analyzer import analyze_for

    if cfg.store_positions and cfg.analyzer in ("cjk", "fr", "tweet"):
        raise ValueError(
            "store_positions (SDM positional postings) is only wired "
            "for the English chains; index the cjk/fr/tweet corpus "
            "without positions")
    return analyze_for(cfg.analyzer, keep_stopwords=cfg.keep_stopwords)


ANALYZED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("doclen", T.LongType(), False),
        T.StructField("terms", T.ArrayType(T.StringType()), False),
        T.StructField("tfs", T.ArrayType(T.IntegerType()), False),
    ]
)


def analyzed_schema(store_positions: bool,
                    store_contents: bool = False,
                    store_timestamps: bool = False) -> T.StructType:
    fields = list(ANALYZED_SCHEMA.fields)
    if store_positions:
        fields.append(_POSITIONS_FIELD)
    if store_contents:
        fields.append(_CONTENTS_FIELD)
    if store_timestamps:
        fields.append(_TS_FIELD)
    return T.StructType(fields)


def _analyze_kernel(cfg: IndexConfig):
    """Pre-shuffle kernel: HTML->text extraction (when source_col is
    html) + analyzer chain + per-doc tf (optionally per-term position
    lists), emitted as compact rows — the multi-KB html/text payload
    never crosses the shuffle; only (url, doclen, terms, tfs[,
    positions]) is partitioned and sorted."""
    an = _analyze_for(cfg)
    from_html = cfg.source_col == "html"
    store_pos = cfg.store_positions
    if from_html:
        from ..extraction.html2text import extract_series
    if store_pos:
        from ..analysis.analyzer import analyze_with_positions

        stem = stem_mode(cfg.analyzer)

    store_contents = cfg.store_contents
    store_ts = cfg.store_timestamps

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"url": [], "doclen": [], "terms": [], "tfs": []}
            if store_pos:
                out["positions"] = []
            if store_contents:
                out["contents"] = []
            if store_ts:
                out["warc_ts"] = []
            # vectorized batch extraction (arrow/re2 passes with
            # row-wise fallback; see extraction/html2text.py round 4)
            texts = extract_series(b["html"]) if from_html else b["text"]
            tss = b["warc_ts"] if store_ts else None
            for i, (url, text) in enumerate(zip(b["url"], texts)):
                if from_html and (not text or not text.strip()):
                    # empty-doc filter post-extraction
                    # (DefaultLuceneDocumentGenerator.java:64-66)
                    continue
                if store_pos:
                    if cfg.analyzer == "ws":
                        tp = [(w, i) for i, w in enumerate(
                            (text or "").split()) if w]
                    else:
                        tp = analyze_with_positions(
                            text or "", stem=stem,
                            keep_stopwords=cfg.keep_stopwords)
                    posmap: dict = {}
                    for t, p in tp:
                        posmap.setdefault(t, []).append(p)
                    terms = sorted(posmap)
                    tfs = [len(posmap[t]) for t in terms]
                    out["positions"].append([posmap[t] for t in terms])
                else:
                    counts = Counter(an(text))
                    terms = sorted(counts)
                    tfs = [counts[t] for t in terms]
                out["url"].append(url)
                out["doclen"].append(sum(tfs))
                out["terms"].append(terms)
                out["tfs"].append(tfs)
                if store_contents:
                    out["contents"].append(text or "")
                if store_ts:
                    out["warc_ts"].append(tss.iloc[i])
            if out["url"]:
                yield pd.DataFrame(out)

    return fn


def _mapside_blocks_kernel(cfg: IndexConfig):
    """Map-side posting-block encoder (blocks-stage map-side combine).

    Each docvec partition holds one segment (or whole/partial segments
    under parquet split/coalesce) with doc_ids ascending, so every
    (term, segment) posting run this task sees is already complete and
    doc-sorted: blocks are encoded HERE, before any shuffle, and only
    the compressed block rows (≈ final index bytes) cross the wire for
    file layout. The round-3 design shuffled one row per posting (term
    string + ~20 bytes each); at 10^12-doc scale that posting shuffle
    is the build's dominant network/memory-bandwidth cost, while the
    encoded blocks are ~2 orders of magnitude smaller. Within-task
    ordering is by Arrow dictionary code (cheap), not term string —
    the layout shuffle's sortWithinPartitions restores term order.

    Runs under ``mapInArrow``: term flatten / dictionary-encode and
    the posting explode are C++-side; only one stable argsort +
    encode_blocks_arrow (vectorized numpy emitting zero-copy Arrow
    binary columns) run in Python. Memory is bounded by
    ``blocks_flush_postings`` (default 8M postings ≈ 200 MB): a flush
    emits blocks for everything buffered, at worst splitting one
    (term, segment, bucket) run into an extra partial block.
    """
    import pyarrow as pa

    block_size = cfg.block_size
    store_pos = cfg.store_positions
    flush_at = int(cfg.extra.get("blocks_flush_postings", 8_000_000))
    pa_fields = [
        pa.field("term", pa.string()),
        pa.field("segment", pa.int32()),
        pa.field("first_doc", pa.int64()),
        pa.field("last_doc", pa.int64()),
        pa.field("n", pa.int32()),
        pa.field("max_tf", pa.int32()),
        pa.field("min_dl", pa.int64()),
        pa.field("sum_tf", pa.int64()),
        pa.field("docs_bin", pa.binary()),
        pa.field("tfs_bin", pa.binary()),
        pa.field("dls_bin", pa.binary()),
    ]
    if store_pos:
        pa_fields.append(pa.field("pos_bin", pa.binary()))
    pa_schema = pa.schema(pa_fields)

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import numpy as np
        import pyarrow.compute as pc

        from .blocks import encode_blocks_arrow

        terms_acc: list = []   # flattened StringArray chunks
        doc_acc: list = []
        seg_acc: list = []
        tf_acc: list = []
        dl_acc: list = []
        pos_acc: list = []     # per-posting position ListArrays
        count = 0

        def flush() -> Iterator["pa.RecordBatch"]:
            nonlocal count
            if count == 0:
                return
            flat = pa.concat_arrays([a.combine_chunks() if isinstance(
                a, pa.ChunkedArray) else a for a in terms_acc])
            denc = pc.dictionary_encode(flat)
            codes = denc.indices.to_numpy(zero_copy_only=False).astype(
                np.int64)
            doc = np.concatenate(doc_acc)
            seg = np.concatenate(seg_acc)
            tf = np.concatenate(tf_acc)
            dl = np.concatenate(dl_acc)
            if np.all(doc[1:] >= doc[:-1]):
                # docvec partitions arrive doc-ascending (ids were
                # assigned after the url sort), so ONE stable argsort
                # on the term code yields (code, seg, doc) order —
                # seg rides the doc id's high bits — at half the
                # lexsort's sort passes
                order = np.argsort(codes, kind="stable")
            else:  # multi-file task with out-of-order splits
                order = np.lexsort((doc, seg, codes))
            pos = None
            if store_pos:
                plist = pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                     else a for a in pos_acc])
                pos = plist.take(pa.array(order))  # C-side list gather
            batch = encode_blocks_arrow(
                codes[order], denc.dictionary, seg[order], doc[order],
                tf[order], dl[order], pa_schema, block_size, positions=pos,
            )
            terms_acc.clear(); doc_acc.clear(); seg_acc.clear()
            tf_acc.clear(); dl_acc.clear(); pos_acc.clear()
            count = 0
            if batch.num_rows:
                yield batch

        for b in batches:
            tcol = b.column("terms")
            lens = pc.list_value_length(tcol).to_numpy(
                zero_copy_only=False).astype(np.int64)
            if lens.sum() == 0:
                continue
            terms_acc.append(tcol.flatten())
            tf_acc.append(b.column("tfs").flatten().to_numpy(
                zero_copy_only=False).astype(np.int64))
            doc_acc.append(np.repeat(
                b.column("doc_id").to_numpy(zero_copy_only=False), lens))
            seg_acc.append(np.repeat(
                b.column("segment").to_numpy(zero_copy_only=False), lens))
            dl_acc.append(np.repeat(
                b.column("doclen").to_numpy(zero_copy_only=False), lens))
            if store_pos:
                pos_acc.append(b.column("positions").flatten())
            count += int(lens.sum())
            if count >= flush_at:
                yield from flush()
        yield from flush()

    return fn


def _blocks_kernel(cfg: IndexConfig):
    block_size = cfg.block_size
    store_pos = cfg.store_positions

    def encode_df(df: pd.DataFrame) -> pd.DataFrame:
        return encode_blocks(
            df["term"].to_numpy(dtype=object),
            df["segment"].to_numpy(),
            df["doc_id"].to_numpy(),
            df["tf"].to_numpy(),
            df["doclen"].to_numpy(),
            block_size,
            positions=(df["pos"].to_numpy(dtype=object)
                       if store_pos else None),
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: Optional[pd.DataFrame] = None
        for b in batches:
            df = b if buf is None else pd.concat([buf, b], ignore_index=True)
            n = len(df)
            if n == 0:
                continue
            term = df["term"].to_numpy(dtype=object)
            seg = df["segment"].to_numpy()
            # start index of the final (term, segment) group
            changed = (term[1:] != term[:-1]) | (seg[1:] != seg[:-1])
            import numpy as np

            idx = np.nonzero(changed)[0]
            g = int(idx[-1] + 1) if idx.size else 0
            # emit complete groups plus full blocks of the final group
            cut = g + ((n - g) // block_size) * block_size
            if cut > 0:
                yield encode_df(df.iloc[:cut])
            buf = df.iloc[cut:].reset_index(drop=True) if cut < n else None
        if buf is not None and len(buf):
            yield encode_df(buf)

    return fn


class _Manifest:
    def __init__(self, out_dir: str):
        self.path = os.path.join(out_dir, "manifest.json")
        self.entries: dict = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.entries = json.load(f)

    def done(self, stage: str) -> bool:
        return stage in self.entries

    def record(self, stage: str, **metrics) -> None:
        self.entries[stage] = {"ts": time.time(), **metrics}
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.entries, f, indent=2)
        os.replace(tmp, self.path)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


def _partition_bytes(path: str, inline_limit: int = 4096) -> dict:
    """Per-partition output accounting for the manifest (north_rule:
    "bytes written per partition"): one entry per part-file, keyed by
    the partition filename. Above ``inline_limit`` partitions the full
    map would bloat the manifest, so it degrades to the summary
    (count/min/max/sum still exact) — skew is still visible."""
    sizes = {
        fn: os.path.getsize(os.path.join(root, fn))
        for root, _, files in os.walk(path)
        for fn in files
        if fn.startswith("part-")
    }
    vals = sorted(sizes.values())
    out = {
        "partitions": len(vals),
        "min_bytes": vals[0] if vals else 0,
        "max_bytes": vals[-1] if vals else 0,
        "sum_bytes": sum(vals),
    }
    if len(sizes) <= inline_limit:
        out["per_partition"] = dict(sorted(sizes.items()))
    return out


def build_index(spark: SparkSession, corpus: DataFrame, cfg: IndexConfig,
                pre_analyzed: bool = False) -> dict:
    """Run the full build; returns the manifest dict. Resumable: stages
    with an existing manifest entry + output dir are skipped.

    With ``pre_analyzed`` the corpus is already tokenized docvec-shaped
    rows (url, doclen, terms, tfs[, positions, contents]) — e.g. the
    output of `streaming/ingest.stream_tokenize` — and stage 1 skips
    the extraction/analysis kernel but keeps the dedup, partitioning,
    and JVM-side id assignment. The caller owns analyzer consistency:
    pass the same ``cfg.analyzer`` the rows were tokenized with, since
    the manifest lineage (gated at `InvertedIndex` load) records it."""
    os.makedirs(cfg.out_dir, exist_ok=True)
    man = _Manifest(cfg.out_dir)
    docvec_path = os.path.join(cfg.out_dir, "docvec.parquet")
    blocks_path = os.path.join(cfg.out_dir, "blocks.parquet")
    dict_path = os.path.join(cfg.out_dir, "dictionary.parquet")
    stats_path = os.path.join(cfg.out_dir, "stats.json")

    # fully-built index: skip the docvec re-open (a driver file-listing
    # + schema read paid by every resumed call — the gate queries call
    # build_index once per query invocation)
    if all(man.done(s) for s in ("docvec", "blocks", "dictionary",
                                 "stats")):
        return man.entries

    # ---- stage 1: docvec ------------------------------------------------
    if not man.done("docvec"):
        t0 = time.time()
        src = cfg.source_col
        other_cols = ["doclen", "terms", "tfs"]
        if cfg.store_positions:
            other_cols.append("positions")
        if cfg.store_contents:
            other_cols.append("contents")
        if cfg.store_timestamps:
            if "warc_ts" not in corpus.columns:
                raise ValueError(
                    "store_timestamps=True needs a warc_ts column in "
                    "the corpus table")
            other_cols.append("warc_ts")
        if pre_analyzed:
            # already-tokenized rows: lang/empty-text filtering happened
            # at tokenize time; keep the empty-doc invariant on doclen
            df = corpus.select("url", *other_cols).filter(
                F.col("doclen") > 0)
        else:
            cols = ["url", src, "lang"]
            if cfg.store_timestamps:
                cols.append("warc_ts")
            df = corpus.select(*cols)
            if cfg.lang is not None:
                df = df.filter(F.col("lang") == cfg.lang)
            if src == "text":
                df = df.filter(F.length(F.trim(F.col("text"))) > 0)
        if cfg.whitelist is not None:
            # docid whitelist (`IndexCollection.java:208-211,707-712`):
            # broadcast semi-join against the allowed-url set
            wl = spark.read.text(cfg.whitelist).select(
                F.trim(F.col("value")).alias("url")
            ).filter(F.col("url") != "")
            df = df.join(F.broadcast(wl), "url", "left_semi")
        # hash-partition by url (NOT range: range sampling would re-run
        # the extraction kernel for its sample pass — a full second
        # corpus scan). Segments therefore hold hash-disjoint url sets,
        # sorted by url within each; ids are order-isomorphic to urls
        # within a segment (all the scoring kernel needs), and
        # cross-segment ordering is by url string at the top-k merge,
        # exactly the reference's docid-string tie-break.
        from pyspark.sql import Observation

        obs = Observation("docvec_metrics")
        # url dedup (`IndexCollection.java:213-215`) + id assignment are
        # fully JVM-side (round 4): the explicit repartition's
        # hash(url, P) already satisfies the groupBy's clustering, so
        # the dedup agg adds NO second exchange, and
        # monotonically_increasing_id IS (partition << 33 | row) — the
        # docvec's (segment, row) id layout — computed after the
        # within-partition url sort. The analyzed arrays never take a
        # second JVM->python round trip (was ~20% of the stage wall).
        if not pre_analyzed:
            kcols = ["url", src] + (
                ["warc_ts"] if cfg.store_timestamps else [])
            df = df.select(*kcols).mapInPandas(
                _analyze_kernel(cfg),
                schema=analyzed_schema(cfg.store_positions,
                                       cfg.store_contents,
                                       cfg.store_timestamps))
        df = (
            df.repartition(cfg.doc_partitions, "url")
            .groupBy("url")
            .agg(*[F.first(c).alias(c) for c in other_cols])
            .sortWithinPartitions("url")
            .withColumn("doc_id", F.monotonically_increasing_id())
            .withColumn(
                "segment",
                F.shiftrightunsigned("doc_id", SEG_SHIFT).cast("int"))
            .select("doc_id", "url", "segment", *other_cols)
            .observe(obs, F.count(F.lit(1)).alias("docs"))
        )
        df.write.mode("overwrite").parquet(docvec_path)
        wall = time.time() - t0
        n_docs = int(obs.get["docs"])  # no extra job: observed on write
        man.record(
            "docvec",
            wall_s=round(wall, 3),
            docs=n_docs,
            docs_per_sec=round(n_docs / max(wall, 1e-9), 1),
            bytes=_dir_bytes(docvec_path),
            partition_bytes=_partition_bytes(docvec_path),
            seg_shift=SEG_SHIFT,
            lineage={"stage": "docvec", "analyzer": cfg.analyzer,
                     # content-derived token-stream version (lexicon
                     # hash for krovetz): gated at InvertedIndex load
                     # so a grown lexicon can't silently query an index
                     # built with drifted stems
                     "analysis_version": _analysis_version(cfg.analyzer),
                     "lang": cfg.lang, "partitions": cfg.doc_partitions},
        )

    docvec = spark.read.parquet(docvec_path)
    # no separate docmap table: (doc_id, url, segment, doclen) is a
    # column-pruned projection of docvec (parquet skips the arrays)

    # ---- stage 3: posting blocks ---------------------------------------
    if not man.done("blocks"):
        t0 = time.time()
        # map-side combine (_mapside_blocks_kernel): blocks are encoded
        # inside each docvec partition BEFORE the shuffle — only the
        # compressed block rows move, keyed by (term, doc-range bucket)
        # for term-pruned scan layout. The posting explode never
        # leaves the Arrow kernel.
        src_cols = ["doc_id", "segment", "doclen", "terms", "tfs"]
        if cfg.store_positions:
            src_cols.append("positions")
        postings = (
            docvec.select(*src_cols)
            .mapInArrow(_mapside_blocks_kernel(cfg),
                        schema=blocks_schema(cfg.store_positions))
            .repartition(
                cfg.block_partitions,
                F.col("term"),
                F.shiftright(F.col("first_doc"), RANGE_SHIFT),
            )
            .sortWithinPartitions("term", "segment", "first_doc")
        )
        from pyspark.sql import Observation

        obs = Observation("blocks_metrics")
        postings = postings.observe(
            obs,
            F.count(F.lit(1)).alias("blocks"),
            F.sum("n").alias("postings"),
        )
        postings.write.mode("overwrite").parquet(blocks_path)
        wall = time.time() - t0
        m = obs.get
        man.record(
            "blocks",
            wall_s=round(wall, 3),
            blocks=int(m["blocks"]),
            postings=int(m["postings"] or 0),
            postings_per_sec=round(int(m["postings"] or 0) / max(wall, 1e-9), 1),
            bytes=_dir_bytes(blocks_path),
            partition_bytes=_partition_bytes(blocks_path),
            lineage={"stage": "blocks", "from": "docvec",
                     "partitions": cfg.block_partitions,
                     "block_size": cfg.block_size},
        )

    # ---- stage 4: dictionary + collection stats ------------------------
    # dictionary (from blocks) and the stats segment-aggregation (from
    # docvec) are independent jobs; run them concurrently so the
    # second's tasks back-fill the first's tail (guide §2.6). Manifest
    # records stay sequential below.
    dict_fut = stats_fut = None
    pool = None
    if not man.done("dictionary") or not man.done("stats"):
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=2)

    if not man.done("dictionary"):
        from pyspark.sql import Observation

        t0_dict = time.time()
        bl = spark.read.parquet(blocks_path)
        obs = Observation("dict_metrics")
        agg = bl.groupBy("term").agg(
            F.sum("n").alias("df"), F.sum("sum_tf").alias("cf"))
        # layout: term-sorted files so query-time term_stats lookups
        # prune at row-group granularity. Small dictionaries (bounded
        # by the block count, known from the manifest) go to ONE
        # globally-sorted file via coalesce — the ideal lookup layout,
        # and it skips repartitionByRange's sampling job; large
        # vocabularies keep the parallel range layout.
        n_blocks = int(man.entries["blocks"].get("blocks", 1 << 30))
        if n_blocks <= (1 << 20):
            laid = agg.coalesce(1).sortWithinPartitions("term")
        else:
            laid = (agg.repartitionByRange(
                        max(1, cfg.block_partitions // 4), "term")
                    .sortWithinPartitions("term"))
        dict_df = laid.observe(obs, F.count(F.lit(1)).alias("terms"))
        dict_fut = pool.submit(
            lambda: dict_df.write.mode("overwrite").parquet(dict_path))

    if not man.done("stats"):
        # one per-segment aggregation yields num_docs/doc_count/sum_tf
        # AND the per-segment doc counts the scoring kernel needs
        t0_stats = time.time()
        stats_fut = pool.submit(
            lambda: docvec.groupBy("segment")
            .agg(
                F.count("*").alias("cnt"),
                F.sum("doclen").alias("sum_tf"),
                F.sum((F.col("doclen") > 0).cast("long")).alias("nonempty"),
            )
            .collect()
        )

    if dict_fut is not None:
        dict_fut.result()
        man.record("dictionary", wall_s=round(time.time() - t0_dict, 3),
                   terms=int(obs.get["terms"]), bytes=_dir_bytes(dict_path),
                   partition_bytes=_partition_bytes(dict_path))

    if stats_fut is not None:
        seg_rows = stats_fut.result()
        t0 = t0_stats
        uniq = man.entries["dictionary"].get("terms")
        if uniq is None:  # older manifests: fall back to a count job
            uniq = spark.read.parquet(dict_path).count()
        num_docs = sum(int(r["cnt"]) for r in seg_rows)
        doc_count = sum(int(r["nonempty"] or 0) for r in seg_rows)
        sum_tf = sum(int(r["sum_tf"] or 0) for r in seg_rows)
        stats = {
            "num_docs": num_docs,
            "doc_count": doc_count,
            "sum_tf": sum_tf,
            "avgdl": (float(sum_tf) / float(doc_count)) if doc_count else 0.0,
            "unique_terms": int(uniq),
            "segments": {int(r["segment"]): int(r["cnt"]) for r in seg_rows},
        }
        with open(stats_path, "w") as f:
            json.dump(stats, f, indent=2)
        man.record("stats", wall_s=round(time.time() - t0, 3), **{
            k: v for k, v in stats.items() if k != "segments"})

    if pool is not None:
        pool.shutdown(wait=False)
    return man.entries
