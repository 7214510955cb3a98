"""LocalSearcher — low-latency serving over the SAME index files,
no Spark session required.

The reference's `SimpleSearcher` answers single queries in ~60 ms
(`docs/experiments-msmarco-passage.md:65`); a Spark job can't (fixed
scheduling floor). Because the index is open parquet, a driver-side
searcher reads the term-pruned slices directly via pyarrow
(row-group min/max pruning on the (term, doc_id)-sorted block files)
and scores with the same numpy kernels — bit-identical results to the
distributed engine (pinned by tests), latency in the tens of
milliseconds.

Use the distributed engine for batch retrieval over a huge index;
use LocalSearcher as the serving path / latency benchmark.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import numpy as np
import pyarrow.dataset as ds
import pyarrow.parquet as pq

from ..analysis.analyzer import analyze, stem_mode
from ..index.blocks import decode_block_run
from ..index.build import SEG_SHIFT
from .bm25 import BM25Params, idf


class LocalSearcher:
    def __init__(self, index_dir: str, k1: float = 0.9, b: float = 0.4,
                 lossy: bool = False):
        self.dir = index_dir
        self._lossy = lossy
        with open(os.path.join(index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        with open(os.path.join(index_dir, "manifest.json")) as f:
            man = json.load(f)
        self.analyzer = man["docvec"]["lineage"]["analyzer"]
        self.params = BM25Params(k1=k1, b=b, lossy=lossy)
        self.seg_counts = {int(s): int(c)
                           for s, c in self.stats["segments"].items()}
        self._blocks = ds.dataset(os.path.join(index_dir, "blocks.parquet"),
                                  format="parquet")
        self._dict = ds.dataset(os.path.join(index_dir, "dictionary.parquet"),
                                format="parquet")
        self._docvec = ds.dataset(os.path.join(index_dir, "docvec.parquet"),
                                  format="parquet")

    def set_bm25(self, k1: float, b: float) -> None:
        self.params = BM25Params(k1=k1, b=b, k=self.params.k,
                                 lossy=self._lossy)

    def _analyze(self, text: str) -> List[str]:
        if self.analyzer == "ws":
            return [w for w in (text or "").split() if w]
        return analyze(text or "", stem=stem_mode(self.analyzer))

    def _dfs(self, terms: List[str]) -> Dict[str, int]:
        if not terms:
            return {}
        t = self._dict.to_table(filter=ds.field("term").isin(terms),
                                columns=["term", "df"])
        return dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))

    def _urls_for(self, doc_ids: np.ndarray) -> Dict[int, str]:
        if doc_ids.size == 0:
            return {}
        t = self._docvec.to_table(
            filter=ds.field("doc_id").isin(doc_ids.tolist()),
            columns=["doc_id", "url"],
        )
        return dict(zip(t["doc_id"].to_pylist(), t["url"].to_pylist()))

    def search(self, query: str, k: int = 10) -> List[Tuple[str, int, float]]:
        """Returns [(url, rank, tie-adjusted score)] — same semantics
        as the distributed engines (float32 BM25, url tie-break,
        ScoreTiesAdjuster rounding)."""
        p = self.params
        toks = self._analyze(query)
        dfs = self._dfs(sorted(set(toks)))
        doc_count = self.stats["doc_count"]
        avgdl = self.stats["avgdl"]
        cache1 = np.float32(p.k1) * (np.float32(1.0) - np.float32(p.b))
        cache2 = np.float32(p.k1) * np.float32(p.b) / np.float32(avgdl)
        wmap: Dict[str, np.float32] = {}
        for t in toks:
            if t not in dfs:
                continue
            w = np.float32(idf(dfs[t], doc_count))
            wmap[t] = np.float32(wmap.get(t, np.float32(0.0)) + w)
        if not wmap:
            return []
        tbl = self._blocks.to_table(
            filter=ds.field("term").isin(list(wmap)),
        ).to_pandas()
        # score per segment with dense float64 accumulation
        cand_scores: List[Tuple[np.ndarray, np.ndarray]] = []
        for seg, pdf in tbl.groupby("segment"):
            base = int(seg) << SEG_SHIFT
            count = self.seg_counts.get(int(seg), 0)
            if count == 0:
                continue
            acc = np.zeros(count, dtype=np.float64)
            touched = []
            pdf = pdf.sort_values(["term", "first_doc"], kind="mergesort")
            for t, g in pdf.groupby("term", sort=False):
                docs, tfs, dls = decode_block_run(
                    list(g["docs_bin"]), list(g["tfs_bin"]),
                    list(g["dls_bin"]), g["n"].to_numpy(),
                    g["first_doc"].to_numpy(), g["last_doc"].to_numpy(),
                )
                idx = (docs - base).astype(np.int64)
                tf32 = tfs.astype(np.float32)
                if p.lossy:
                    from .smallfloat import quantize_length

                    dl32 = quantize_length(dls).astype(np.float32)
                else:
                    dl32 = dls.astype(np.float32)
                contrib = (wmap[t] * (tf32 / (tf32 + cache1 + cache2 * dl32))
                           ).astype(np.float32)
                acc[idx] += contrib.astype(np.float64)
                touched.append(idx)
            cand = np.unique(np.concatenate(touched))
            scores = acc[cand].astype(np.float32)
            if len(cand) > k:
                # stable tie-break (doc_id asc == url order within a
                # segment) so the per-segment cut matches the global
                # (score desc, url asc) merge order
                top = np.lexsort((cand, -scores))[:k]
                cand, scores = cand[top], scores[top]
            cand_scores.append((cand + base, scores))
        if not cand_scores:
            return []
        all_ids = np.concatenate([c for c, _ in cand_scores])
        all_scores = np.concatenate([s for _, s in cand_scores])
        urls = self._urls_for(all_ids)
        order = sorted(
            range(len(all_ids)),
            key=lambda i: (-all_scores[i], urls[int(all_ids[i])]),
        )[:k]
        # tie adjustment (ScoreTiesAdjusterReranker.java:36-73)
        out: List[Tuple[str, int, float]] = []
        prev_round = None
        dup = 0
        for rank, i in enumerate(order, start=1):
            r = round(float(all_scores[i]), 4)
            if prev_round is not None and r == prev_round:
                dup += 1
            else:
                dup = 0
            prev_round = r
            out.append((urls[int(all_ids[i])], rank, r - dup * 1e-6))
        return out

    def batch_search(self, queries: Dict[int, str], k: int = 10):
        return {qid: self.search(q, k) for qid, q in queries.items()}
